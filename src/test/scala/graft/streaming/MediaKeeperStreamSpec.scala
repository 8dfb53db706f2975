package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Streaming media KEEPER ELECTION (round-19 verdict task 5) — the
  * incremental m_media_dedup_groups: arrivals elect a canonical keeper
  * against the EXISTING corpus' converged components (the
  * d_ingest_neardup cross-corpus posture), never against each other.
  *
  * Pins:
  *  1. BATCH PARITY on a corpus replay: every doc that the batch groups
  *     query assigns a keeper gets THE SAME keeper from the stream, and
  *     every pairless doc elects itself;
  *  2. the RE-ENCODE CHAIN collapses: a novel byte-different re-encode
  *     of a grouped corpus member must elect that member's CANONICAL
  *     keeper (not merely the member it happened to match) — the
  *     closure rides the calibrated map, not streaming state;
  *  3. a genuinely novel upload elects itself with is_dup = false — it
  *     IS the new canonical copy.
  */
class MediaKeeperStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def runStream(name: String,
      data: Seq[(Timestamp, Long, String)]): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val calib = graft.Checkpoints.pin(
      StreamingPipelines.mediaKeeperCalibrate(s, sfDir))
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingPipelines.mediaKeeperStream(
        in.toDF().toDF("ts", "doc_id", "text").withWatermark("ts", "1 minute"),
        calib, windowDur = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      in.addData(data)
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2026-01-02 00:00:00"), -1L, "flush"))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).filter(col("media_id") >= 0L)
  }

  test("replaying the calibration corpus reproduces the batch keeper sets; pairless docs elect themselves") {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val fixture = graft.Tables.t(s, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val stream = runStream("media_keeper_replay",
        fixture.map { case (id, text) => (t0, id, text) })
      .select("media_id", "keeper_id", "is_dup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val batch = SparkEntry.queries("m_media_dedup_groups")(s, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty, "vacuous — the batch groups query found nothing at sf0.001")
    assert(batch.keySet.subsetOf(stream.keySet),
      s"stream lost grouped docs: ${(batch.keySet -- stream.keySet).take(3)}")
    for ((id, keeper) <- batch) {
      assert(stream(id)._1 === keeper,
        s"doc $id: stream keeper ${stream(id)._1} != batch keeper $keeper")
      assert(stream(id)._2, s"doc $id is grouped in batch but is_dup=false in stream")
    }
    // every other streamed doc (pairless in batch) elects itself —
    // blank-text docs are dropped by the fingerprint stage on both sides
    for ((id, kd) <- stream if !batch.contains(id))
      assert(kd === ((id, false)), s"pairless doc $id must elect itself: $kd")
  }

  test("a re-encode chain collapses to the canonical keeper; a novel upload elects itself") {
    val s = spark
    import s.implicits._
    // pick a grouped member whose keeper is NOT itself — matching it
    // must still land on the component minimum (the chain collapse)
    val grouped = SparkEntry.queries("m_media_dedup_groups")(s, sfDir)
      .filter(col("media_id") =!= col("keeper_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(grouped.nonEmpty, "vacuous — no non-trivial component at sf0.001")
    val (memberId, canonicalKeeper) = grouped.head
    val memberText = graft.Tables.t(s, sfDir, "documents")
      .filter(col("doc_id") === memberId)
      .select("text").as[String].head()
    val reencode = memberText.toUpperCase.replace(" ", "  ")
    val t0 = Timestamp.valueOf("2026-01-01 00:10:00")
    val out = runStream("media_keeper_novel", Seq(
        (t0, 900001L, reencode),
        (t0, 900002L, "totally unrelated upload about catalyst plans and shuffle files nothing alike")))
      .select("media_id", "keeper_id", "is_dup").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(900001L) === ((canonicalKeeper, true)),
      s"re-encode of $memberId must elect canonical $canonicalKeeper: ${out(900001L)}")
    assert(out(900002L) === ((900002L, false)),
      s"novel upload must elect itself: ${out(900002L)}")
  }
}
