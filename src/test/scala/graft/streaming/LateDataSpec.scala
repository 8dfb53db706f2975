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

  test("tagged side output: both tags are first-class streams fed by one classify query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val root = java.nio.file.Files.createTempDirectory("tagged-side").toString
    val tagged = new TaggedSideOutput(delayUs = 10000000L, root = root)
    val in = MemoryStream[Ev]
    val ckpt = java.nio.file.Files.createTempDirectory("tagged-ckpt").toString
    val classify = tagged.start(in.toDF(), ckpt)

    // downstream queries attach to each tag like any other stream —
    // the getSideOutput(tag) shape, not a callback
    val schema = in.toDF().schema
    val qOn = tagged.onTimeStream(s, schema)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tg-on-ck").toString)
      .format("memory").queryName("tg_on").start()
    val qLate = tagged.lateStream(s, schema)
      .selectExpr("event_id", "ts") // late consumers can project/aggregate freely
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tg-late-ck").toString)
      .format("memory").queryName("tg_late").start()
    try {
      in.addData(ev(1, 100))
      classify.processAllAvailable()
      in.addData(ev(2, 85), ev(3, 95)) // cutoff now 90 s: 2 late, 3 on-time
      classify.processAllAvailable()
      qOn.processAllAvailable(); qLate.processAllAvailable()
      val on = s.table("tg_on").select("event_id").as[Long].collect().toSet
      val late = s.table("tg_late").select("event_id").as[Long].collect().toSet
      assert(on === Set(1L, 3L), s"on-time tag got $on")
      assert(late === Set(2L), s"late tag got $late")
    } finally { classify.stop(); qOn.stop(); qLate.stop() }
  }

  test("tagged side output: restart keeps the cutoff and replay converges to the same files") {
    val s = spark
    import s.implicits._

    val root = java.nio.file.Files.createTempDirectory("tagged-side2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tagged-ckpt2").toString
    val t1 = new TaggedSideOutput(10000000L, root)
    t1.initState(ckpt)
    t1.process(s.createDataset(Seq(ev(1, 100))).toDF(), 0L)

    // a NEW instance on the same root+checkpoint (the restart): the
    // persisted watermark must classify 85 s as late, and replaying
    // batch 1 must overwrite -- not duplicate -- its files
    val t2 = new TaggedSideOutput(10000000L, root)
    t2.initState(ckpt)
    t2.process(s.createDataset(Seq(ev(2, 85), ev(3, 95))).toDF(), 1L)
    t2.process(s.createDataset(Seq(ev(2, 85), ev(3, 95))).toDF(), 1L) // replay

    val late = s.read.parquet(t2.lateDir).select("event_id").as[Long].collect().toSeq
    val on = s.read.parquet(t2.onTimeDir).select("event_id").as[Long].collect().toSeq
    assert(late === Seq(2L), s"late after replay: $late")
    assert(on.sorted === Seq(1L, 3L), s"on-time after replay: $on")
  }

  test("tagged side output takes a file: URI — relay and state go through the Hadoop FS") {
    val s = spark
    import s.implicits._

    // explicit scheme: on a cluster this is hdfs://… or s3a://…; java.nio
    // would throw on the authority-form path, the Hadoop FS resolves it
    val root = "file://" + java.nio.file.Files.createTempDirectory("tagged-uri").toString
    val ckpt = "file://" + java.nio.file.Files.createTempDirectory("tagged-uri-ck").toString
    val t = new TaggedSideOutput(10000000L, root)
    t.initState(ckpt)
    t.process(s.createDataset(Seq(ev(1, 100))).toDF(), 0L)
    t.process(s.createDataset(Seq(ev(2, 85), ev(3, 95))).toDF(), 1L)
    t.process(s.createDataset(Seq(ev(2, 85), ev(3, 95))).toDF(), 1L) // replay: still idempotent

    val late = s.read.parquet(t.lateDir).select("event_id").as[Long].collect().toSeq
    val on = s.read.parquet(t.onTimeDir).select("event_id").as[Long].collect().toSeq.sorted
    assert(late === Seq(2L), s"late via URI root: $late")
    assert(on === Seq(1L, 3L), s"on-time via URI root: $on")

    // the persisted watermark landed where the URI said, via the Hadoop FS
    val wm = new org.apache.hadoop.fs.Path(s"$ckpt/graft_watermark/max_seen_us")
    val fs = wm.getFileSystem(s.sessionState.newHadoopConf())
    assert(fs.exists(wm), "watermark state file missing under the URI checkpoint")

    // a restarted instance restores the cutoff through the same FS handle
    val t2 = new TaggedSideOutput(10000000L, root)
    t2.initState(ckpt)
    t2.process(s.createDataset(Seq(ev(4, 80))).toDF(), 2L) // cutoff 90 s -> late
    val late2 = s.read.parquet(t.lateDir).select("event_id").as[Long].collect().toSet
    assert(late2 === Set(2L, 4L), s"late after URI restart: $late2")
  }
}
