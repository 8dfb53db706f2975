package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Source-KL calibrate/apply split (round-16 verdict task 5): the
  * streaming mixture-drift monitor — per-(event-time window, source)
  * KL(window ‖ calibrated corpus) through ONE stateful aggregation (the
  * 1024-long histogram aggregate; the batch query's count-then-sum is an
  * illegal second stateful stage in a stream) — must reproduce the
  * oracle-checked batch t_source_kl exactly when one window holds the
  * whole calibration corpus, and must keep per-window independence when
  * the same source's documents split across windows. */
class SourceKlStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("one window over the calibration corpus reproduces the batch t_source_kl, row for row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val model = StreamingPipelines.sourceKlCalibrate(s, sfDir)
    assert(model.nb.length === 1024 && model.nn > 0)

    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val fixture = graft.Tables.t(s, sfDir, "documents")
      .select("source", "text").as[(String, String)].collect().toSeq
      .map { case (src, text) => (t0, src, text) }
    val in = MemoryStream[(Timestamp, String, String)]
    val q = StreamingPipelines.sourceKl(
        in.toDF().toDF("ts", "source", "text").withWatermark("ts", "1 minute"),
        model, windowDur = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("srckl_stream").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      // flush: a far-future doc advances the watermark past the window
      // (closing it); its own window never closes, so it never emits.
      // It must carry REAL text: the size(toks) > 0 filter pushes below
      // the watermark collector, so an empty doc would never register
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), "flush", "flush"))
      q.processAllAvailable()
      val stream = s.table("srckl_stream")
        .selectExpr("source", "n_grams", "kl_micro", "kl")
        .as[(String, Long, Long, Double)].collect().toSet
      val batch = SparkEntry.queries("t_source_kl")(s, sfDir)
        .selectExpr("source", "n_grams", "kl_micro", "kl")
        .as[(String, Long, Long, Double)].collect().toSet
      assert(batch.nonEmpty, "vacuous — batch scored nothing")
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
    } finally q.stop()
  }

  test("windows are independent: a source split across windows scores each window against the frozen model") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val model = StreamingPipelines.sourceKlCalibrate(s, sfDir)

    // two sources, two windows; w2's 'web' docs deliberately repeat one
    // token heavily — its KL must exceed w1's in-distribution window
    val w1 = Timestamp.valueOf("2026-01-01 00:05:00")
    val w2 = Timestamp.valueOf("2026-01-01 01:05:00")
    val docsSeq = Seq(
      (w1, "web", "the quick brown fox jumps over the lazy dog"),
      (w1, "web", "pack my box with five dozen liquor jugs"),
      (w1, "lab", "synthesis of novel compounds under inert atmosphere"),
      (w2, "web", "spam spam spam spam spam spam spam spam"),
      (w2, "lab", "spectra were recorded on a calibrated instrument"))
    val in = MemoryStream[(Timestamp, String, String)]
    val q = StreamingPipelines.sourceKl(
        in.toDF().toDF("ts", "source", "text").withWatermark("ts", "1 minute"),
        model, windowDur = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("srckl_windows").start()
    try {
      in.addData(docsSeq)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), "flush", "flush"))
      q.processAllAvailable()
      val stream = s.table("srckl_windows")
        .selectExpr("window.start AS ws", "source", "n_grams", "kl_micro", "kl")
        .as[(Timestamp, String, Long, Long, Double)].collect().toSet
      // the shared-apply batch replay over the identical static frame:
      // same bucket stream, same histogram aggregate, same projection —
      // the dual and this reference CANNOT drift (one code path), so the
      // assertion pins the streaming-only machinery: state round-trip,
      // partial merge, watermark finalization
      val static = docsSeq.toDF("ts", "source", "text")
      val batch = graft.operators.TextOps.sourceKlApply(
          graft.operators.TextOps.sourceKlBuckets(static), model,
          Seq(window(col("ts"), "1 hour"), col("source")))
        .selectExpr("window.start AS ws", "source", "n_grams", "kl_micro", "kl")
        .as[(Timestamp, String, Long, Long, Double)].collect().toSet
      assert(batch.size === 4, s"expected 4 (window, source) groups, got $batch")
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
      // semantics: the repetition-degenerate window diverges further
      val klOf = stream.map(r => ((r._1, r._2), r._5)).toMap
      assert(klOf((w2Start(w2), "web")) > klOf((w2Start(w1), "web")),
        s"degenerate window did not raise KL: $klOf")
    } finally q.stop()
  }

  private def w2Start(t: Timestamp): Timestamp = {
    val ms = t.getTime
    new Timestamp(ms - (ms % (3600 * 1000L)))
  }
}
