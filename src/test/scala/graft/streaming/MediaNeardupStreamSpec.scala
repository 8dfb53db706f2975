package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Perceptual media near-dup, calibrate/stream split (round 18): the
  * ingest-side "this upload is a re-encode of something we already
  * have" monitor must agree with the oracle-checked batch
  * m_media_neardup when the stream replays the calibration corpus
  * (every doc that appears in a batch pair is flagged with the batch's
  * own minimum hamming for that doc; every pairless doc stays silent),
  * and must flag a NOVEL byte-different re-encode of a corpus payload
  * at hamming 0 against its original while unrelated uploads pass. */
class MediaNeardupStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("replaying the calibration corpus reproduces the batch pair report, per doc") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val banded = graft.Checkpoints.pin(
      StreamingPipelines.mediaNeardupCalibrate(s, sfDir))

    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val fixture = graft.Tables.t(s, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, text) => (t0, id, text) }
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.mediaNeardupStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        banded, windowDur = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("media_neardup_stream").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L, "flush"))
      q.processAllAvailable()
      val stream = s.table("media_neardup_stream")
        .filter(col("doc_id") >= 0L)
        .select("doc_id", "hamming").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the batch pairs, symmetrized to a per-doc best-hamming report
      val batch = SparkEntry.queries("m_media_neardup")(s, sfDir)
        .collect().flatMap(r => Seq(
          r.getLong(0) -> r.getLong(2), r.getLong(1) -> r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      assert(batch.nonEmpty, "vacuous — the batch query found no pairs at sf0.001")
      assert(stream === batch,
        s"only-stream=${(stream.toSet -- batch.toSet).take(3)} " +
          s"only-batch=${(batch.toSet -- stream.toSet).take(3)}")
    } finally q.stop()
  }

  test("a novel byte-different re-encode flags against its corpus original; unrelated uploads pass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val banded = graft.Checkpoints.pin(
      StreamingPipelines.mediaNeardupCalibrate(s, sfDir))
    // pick a corpus payload and re-encode it: uppercase + doubled
    // whitespace — every byte-level digest changes, the decoded signal
    // does not
    val (srcId, srcText) = graft.Tables.t(s, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].head()
    val reencode = srcText.toUpperCase.replace(" ", "  ")
    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.mediaNeardupStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        banded, windowDur = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("media_neardup_novel").start()
    try {
      in.addData(Seq(
        (t0, 900001L, reencode),
        (t0, 900002L, "totally unrelated upload about catalyst plans and shuffle files nothing alike")))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L, "flush"))
      q.processAllAvailable()
      val rows = s.table("media_neardup_novel")
        .filter(col("doc_id") === 900001L)
        .select("match_id", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((srcId, 0L)),
        s"re-encode must flag its original at hamming 0: ${rows.toSeq}")
      assert(s.table("media_neardup_novel")
        .filter(col("doc_id") === 900002L).isEmpty,
        "an unrelated upload must not flag")
    } finally q.stop()
  }
}
