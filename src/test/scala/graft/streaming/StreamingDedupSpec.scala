package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming exact-dedup with bounded state, plus the sliding-window
  * streaming path (W2) that the batch analog w2_sliding_count mirrors.
  */
class StreamingDedupSpec extends SparkSpec {

  private def ev(id: Long, sec: Long): Ev =
    Ev(id, new Timestamp(sec * 1000L), 1L, "click", 1.0)

  test("dropDuplicatesWithinWatermark suppresses replays inside the delay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StreamingPipelines.dedupWithinWatermark(in.toDF(), delay = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    try {
      in.addData(ev(1, 5), ev(1, 5), ev(2, 6)) // duplicate in one batch
      q.processAllAvailable()
      in.addData(ev(1, 7)) // replay of id 1 inside the watermark window
      q.processAllAvailable()
      val ids = s.table("deduped").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted === Seq(1L, 2L)) // each id exactly once
    } finally q.stop()
  }

  test("sliding window count assigns each row to size/slide windows (W2)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val in = MemoryStream[Ev]
    val q = StreamingPipelines
      .slidingCount(in.toDF(), size = "10 seconds", slide = "5 seconds", delay = "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sliding").start()
    try {
      in.addData(ev(1, 7), ev(2, 8)) // rows land in windows [0,10) and [5,15)
      q.processAllAvailable()
      in.addData(ev(3, 60)) // advance watermark, close both
      q.processAllAvailable()
      val rows = s.table("sliding")
        .selectExpr("cast(win_start AS long)", "cnt").as[(Long, Long)].collect().toSet
      assert(rows.contains((0L, 2L)))
      assert(rows.contains((5L, 2L)))
    } finally q.stop()
  }
}
