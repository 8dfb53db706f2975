package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming time-range join: matches emit as they arrive (inner join);
  * input older than the watermark is discarded, which is what bounds the
  * join state on an infinite stream.
  */
class IntervalJoinStreamSpec extends SparkSpec {

  private def ev(id: Long, sec: Long, user: Long, typ: String): Ev =
    Ev(id, new Timestamp(sec * 1000L), user, typ, 1.0)

  test("clicks join purchases within the range; outside/other-user do not") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = StreamingPipelines
      .intervalJoin(purchases.toDF(), clicks.toDF(),
        range = "30 seconds", delay = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      purchases.addData(ev(1, 10, 1, "purchase"))
      clicks.addData(
        ev(20, 15, 1, "click"),  // +5 s: in range
        ev(21, 40, 1, "click"),  // exactly +30 s: in range (<=)
        ev(22, 41, 1, "click"),  // +31 s: out of range
        ev(23, 12, 2, "click"),  // other user
        ev(24, 10, 1, "click"))  // equal ts: excluded (strict >)
      q.processAllAvailable()
      val got = s.table("ij_out")
        .selectExpr("p_id", "user_id", "cast(c_ts AS long)")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 1L, 15L), (1L, 1L, 40L)))

      // Push both watermarks far ahead; a then-late click cannot match.
      purchases.addData(ev(2, 500, 9, "purchase"))
      clicks.addData(ev(25, 500, 9, "click")) // equal ts: no match, just advances wm
      q.processAllAvailable()
      clicks.addData(ev(26, 16, 1, "click")) // in range of p1, but beyond watermark
      q.processAllAvailable()
      assert(s.table("ij_out").count() === 2)
    } finally q.stop()
  }
}
