package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Duplicated-span REWRITE calibrate/apply split (round-17 verdict
  * task 3): the ingest-side editing counterpart of the coverage
  * monitor. The stream emits a quarantine report (removal spans +
  * kept_tokens); applied back to the text through the SHARED
  * TextOps.dupSpanApplyRemovals it must reproduce the oracle-checked
  * batch d_dup_span_rewrite row-for-row when the stream replays the
  * calibration corpus (minDup = 2, first occurrences recorded in the
  * calibrated gram table survive), and at the production threshold
  * (minDup = 1) a verbatim corpus copy must be fully cut while
  * never-seen text passes untouched. */
class DupSpanRewriteStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private type Row4 = (Long, Long, Long, String)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row4] =
    df.selectExpr("doc_id", "n_tokens", "kept_tokens", "new_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet

  test("report->apply over the calibration corpus reproduces the batch d_dup_span_rewrite, row for row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gramTable = StreamingPipelines.dupSpanRewriteCalibrate(s, sfDir)

    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val fixture = graft.Tables.t(s, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, text) => (t0, id, text) }
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.dupSpanRewriteStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        gramTable, windowDur = "1 hour", minDup = 2L)
      .writeStream.outputMode("append")
      .format("memory").queryName("dupspan_rw_stream").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      // flush: a far-future >= 8-token doc closes the corpus window
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L,
        "f1 f2 f3 f4 f5 f6 f7 f8"))
      q.processAllAvailable()
      val report = s.table("dupspan_rw_stream").filter(col("doc_id") >= 0L)
      // the apply step is the batch's own rebuild — shared code, narrow
      // doc_id join, exactly what a consumer runs on the quarantined docs
      val applied = rows(graft.operators.TextOps.dupSpanApplyRemovals(
        graft.Tables.t(s, sfDir, "documents"),
        report.select(col("doc_id"), col("rs"))))
      val batch = rows(SparkEntry.queries("d_dup_span_rewrite")(s, sfDir))
      assert(batch.nonEmpty, "vacuous — batch rewrote nothing")
      assert(applied === batch,
        s"only-stream=${(applied -- batch).take(3)} only-batch=${(batch -- applied).take(3)}")
      // the report's own kept_tokens must agree with the applied rebuild
      val kept = report.select("doc_id", "kept_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val appliedKept = applied.map(r => r._1 -> r._3).toMap
      kept.foreach { case (id, k) =>
        assert(appliedKept(id) === k,
          s"doc $id: report kept_tokens $k != applied ${appliedKept(id)}")
      }
    } finally q.stop()
  }

  test("novel arrivals at minDup=1: a verbatim corpus copy is fully cut, unseen text keeps every token") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val gramTable = StreamingPipelines.dupSpanRewriteCalibrate(s, sfDir)
    val copied = graft.Tables.t(s, sfDir, "documents")
      .withColumn("n", size(split(col("text"), " ")))
      .filter(col("n") >= 8)
      .select("text").head().getString(0)
    val unseen = (1 to 12).map(i => s"zq${i}xv${i}").mkString(" ")

    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.dupSpanRewriteStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        gramTable, windowDur = "1 hour", minDup = 1L)
      .writeStream.outputMode("append")
      .format("memory").queryName("dupspan_rw_novel").start()
    try {
      in.addData(Seq((t0, 9001L, copied), (t0, 9002L, unseen)))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L,
        "f1 f2 f3 f4 f5 f6 f7 f8"))
      q.processAllAvailable()
      val out = s.table("dupspan_rw_novel")
        .selectExpr("doc_id", "n_tokens", "kept_tokens").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val (copyN, copyKept) = out(9001L)
      assert(copyKept === 0L,
        s"verbatim corpus copy must lose all $copyN tokens, kept $copyKept")
      val (freshN, freshKept) = out(9002L)
      assert(freshKept === freshN,
        s"unseen text must keep all $freshN tokens, kept $freshKept")
    } finally q.stop()
  }
}
