package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Duplicated-span calibrate/apply split (round 16): the ingest-side
  * duplication monitor — per (event-time window, arriving doc), token
  * coverage under 8-token windows already present in the calibrated
  * corpus — must reproduce the oracle-checked batch d_dup_span_coverage
  * exactly when the stream replays the calibration corpus (minDup = 2:
  * each replayed gram already counts its own corpus occurrence), and
  * must classify novel arrivals correctly at the production threshold
  * (minDup = 1: a verbatim copy of a corpus document is fully covered;
  * a document of never-seen tokens is untouched). */
class DupSpanStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private type Rep = (Long, Long, Long, Long, Long, Double)
  private def reps(df: org.apache.spark.sql.DataFrame): Set[Rep] =
    df.selectExpr("doc_id", "n_tokens", "n_grams", "n_dup_grams",
        "covered_tokens", "dup_frac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet

  test("one window over the calibration corpus reproduces the batch d_dup_span_coverage, row for row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gramTable = StreamingPipelines.dupSpanCalibrate(s, sfDir)

    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val fixture = graft.Tables.t(s, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, text) => (t0, id, text) }
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.dupSpanStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        gramTable, windowDur = "1 hour", minDup = 2L)
      .writeStream.outputMode("append")
      .format("memory").queryName("dupspan_stream").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      // flush: a far-future doc closes the corpus window; it carries 8
      // real tokens so the size(toks) >= 8 filter below the watermark
      // collector still registers it (the SourceKlStreamSpec lesson)
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L,
        "f1 f2 f3 f4 f5 f6 f7 f8"))
      q.processAllAvailable()
      val stream = reps(s.table("dupspan_stream").filter(col("doc_id") >= 0L))
      val batch = reps(SparkEntry.queries("d_dup_span_coverage")(s, sfDir))
      assert(batch.nonEmpty, "vacuous — batch scored nothing")
      assert(stream === batch,
        s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
    } finally q.stop()
  }

  test("novel arrivals at minDup=1: a verbatim corpus copy is fully covered, unseen text is untouched") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gramTable = StreamingPipelines.dupSpanCalibrate(s, sfDir)
    // a corpus document's text verbatim (>= 8 tokens), arriving as a NEW doc
    val copied = graft.Tables.t(s, sfDir, "documents")
      .withColumn("n", size(split(col("text"), " ")))
      .filter(col("n") >= 8)
      .select("text").head().getString(0)
    val unseen = (1 to 12).map(i => s"zq${i}xv${i}").mkString(" ")

    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.dupSpanStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        gramTable, windowDur = "1 hour", minDup = 1L)
      .writeStream.outputMode("append")
      .format("memory").queryName("dupspan_novel").start()
    try {
      in.addData(Seq((t0, 9001L, copied), (t0, 9002L, unseen)))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L,
        "f1 f2 f3 f4 f5 f6 f7 f8"))
      q.processAllAvailable()
      val out = reps(s.table("dupspan_novel")).map(r => r._1 -> r).toMap
      val copy = out(9001L)
      assert(copy._5 === copy._2 && copy._6 === 1.0,
        s"verbatim corpus copy not fully covered: $copy")
      val fresh = out(9002L)
      assert(fresh._4 === 0L && fresh._5 === 0L && fresh._6 === 0.0,
        s"unseen text scored as duplicated: $fresh")
    } finally q.stop()
  }
}
