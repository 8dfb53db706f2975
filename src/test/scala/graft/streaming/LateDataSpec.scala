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
      onTime = df => onTime ++= df.select("event_id").as[Long].collect(),
      late = df => late ++= df.select("event_id").as[Long].collect())

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
}
