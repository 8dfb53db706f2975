package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** T4: the late-data router must capture beyond-watermark rows instead of
  * silently dropping them (reference sideOutputLateData,
  * EventTimeOperations.java:148-176).
  */
class LateDataSpec extends SparkSpec {

  private def ev(id: Long, sec: Long): Ev =
    Ev(id, new Timestamp(sec * 1000L), 1L, "click", 1.0)

  test("rows older than (max seen - delay) route to the late output") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val onTime = ListBuffer[Long]()
    val late = ListBuffer[Long]()
    val router = new LateDataRouter(
      delayUs = 10000000L, // 10 s
      onTime = (df, _) => onTime ++= df.select("event_id").as[Long].collect(),
      late = (df, _) => late ++= df.select("event_id").as[Long].collect())

    val in = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("late-ckpt").toString
    val q = router.start(in.toDF(), ckpt)
    try {
      in.addData(ev(1, 100))
      q.processAllAvailable() // max seen = 100 s; cutoff for NEXT batch = 90 s
      in.addData(ev(2, 85), ev(3, 95))
      q.processAllAvailable()
      assert(onTime.toSet === Set(1L, 3L))
      assert(late.toSet === Set(2L))
    } finally q.stop()
  }

  test("the watermark survives a router restart (persisted beside the checkpoint)") {
    val s = spark
    import s.implicits._

    val ckpt = java.nio.file.Files.createTempDirectory("late-ckpt2").toString
    val seen1 = ListBuffer[Long]()
    val r1 = new LateDataRouter(10000000L,
      (df, _) => seen1 ++= df.select("event_id").as[Long].collect(),
      (_, _) => ())
    r1.initState(ckpt)
    r1.process(s.createDataset(Seq(ev(1, 100))).toDF(), 0L) // persists max=100s

    // a NEW router instance on the same checkpoint must remember max=100s:
    // an 85s event in its first recovered batch is late, not on-time
    val onTime2 = ListBuffer[Long]()
    val late2 = ListBuffer[Long]()
    val r2 = new LateDataRouter(10000000L,
      (df, _) => onTime2 ++= df.select("event_id").as[Long].collect(),
      (df, _) => late2 ++= df.select("event_id").as[Long].collect())
    r2.initState(ckpt)
    r2.process(s.createDataset(Seq(ev(2, 85), ev(3, 95))).toDF(), 1L)
    assert(late2.toSet === Set(2L))
    assert(onTime2.toSet === Set(3L))
  }
}
