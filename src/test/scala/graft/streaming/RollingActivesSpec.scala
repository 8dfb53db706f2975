package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming rolling distinct actives ([[StreamingPipelines.rollingActives]]):
  * exact rolling distinct via explode-into-trailing-labels + dedup within
  * the watermark — the streaming dual of the batch a14_rolling_dau.
  */
class RollingActivesSpec extends SparkSpec {

  private var nextId = 0L
  private def ev(sec: Long, user: Long): Ev = {
    nextId += 1
    Ev(nextId, new Timestamp(sec * 1000L), user, "click", 1.0)
  }

  test("per-label counts equal distinct users across the trailing window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Ev]
    // slide 10 s, 3 slides: an event in bucket B counts toward labels
    // B, B+10, B+20 (trailing 3-bucket windows labeled by end bucket)
    val q = StreamingPipelines.rollingActives(in.toDF(), slideSec = 10L, nSlides = 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("actives").start()
    try {
      in.addData(ev(1005, 1), ev(1006, 2), ev(1015, 1))
      q.processAllAvailable()
      // second batch: duplicate activity of user 1 in bucket 0 must not
      // inflate any label; user 3 appears in bucket 20
      in.addData(ev(1007, 1), ev(1025, 3))
      q.processAllAvailable()
      val m = s.table("actives")
        .selectExpr("cast(win_label AS long)", "active_users")
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max } // latest update per label
      // (times offset to 1000 s so no label equals the initial epoch-0
      // watermark) label 1000: users {1,2}; 1010: {1,2}; 1020: {1,2,3};
      // 1030: {1,3}; 1040: {3}
      assert(m(1000L) === 2L)
      assert(m(1010L) === 2L)
      assert(m(1020L) === 3L)
      assert(m(1030L) === 2L)
      assert(m(1040L) === 1L)
    } finally q.stop()
  }

  test("a late event inside the delay budget still counts toward every label") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamingPipelines.rollingActives(in.toDF(), slideSec = 10L,
      nSlides = 3, delaySec = 10L)
      .writeStream.outputMode("update")
      .format("memory").queryName("actives_late").start()
    try {
      in.addData(ev(1015, 1))
      q.processAllAvailable()
      // watermark on labels after batch 1: max label 1030 minus
      // (10 + 2*10) = 1000. A new user arriving out of order at 1008 —
      // 7 s late, inside the 10 s event budget — must still count for
      // labels 1000/1010/1020.
      in.addData(ev(1008, 2))
      q.processAllAvailable()
      val m = s.table("actives_late")
        .selectExpr("cast(win_label AS long)", "active_users")
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(m(1000L) === 1L) // user 2 only
      assert(m(1010L) === 2L)
      assert(m(1020L) === 2L)
      assert(m(1030L) === 1L) // user 1 only
    } finally q.stop()
  }
}
