package graft.operators

import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}
import graft.multimodal.{MediaMeta, MediaPipeline, MediaRecord}

/** Multimodal-column queries registered with the driver. The `documents`
  * text payloads stand in for opaque media bytes (no codec libs in this
  * container — see [[graft.multimodal.MediaDecoder]]); the Spark-side
  * plumbing (binary columns, typed Dataset, batched mapPartitions decode)
  * is the real thing.
  */
object MultimodalOps {

  // Binary-column metadata extraction — oracle-checkable (md5 of the UTF-8
  // payload is identical in both engines).
  private val mMediaMeta = GQuery(
    "m_media_meta",
    (s, dir) =>
      Tables.t(s, dir, "documents").select(
        col("doc_id").as("media_id"),
        lit("text").as("kind"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("digest")),
    Some("""SELECT doc_id AS media_id, 'text' AS kind,
       octet_length(encode(text))::BIGINT AS n_bytes, md5(text) AS digest
FROM documents"""),
    "Opaque-payload metadata: byte length + content digest.")

  // Full decode pipeline: typed Dataset -> batched mapPartitions decode ->
  // feature vectors, rendered as a canonical per-row string. "%.7f" is
  // LOSSLESS here (every feature is k/128, at most 7 fractional digits),
  // so no rounding mode is ever exercised — which is what lets the oracle
  // recompute the fake decoder's md5-byte arithmetic in SQL and hash-match
  // the real mapPartitions pipeline exactly. MediaPipelineSpec covers the
  // typed Dataset path with the raw float arrays.
  private val mMediaFeatures = GQuery(
    "m_media_features",
    (s, dir) => {
      import s.implicits._
      import MediaPipeline._
      val recs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]
        .map { case (id, text, n) =>
          MediaRecord(id, "text", text.getBytes("UTF-8"), MediaMeta(0, 0, n, "utf8"))
        }
      MediaPipeline.decodeAndExtract(recs)
        .map(f => (f.media_id, f.kind, f.n_bytes, f.digest,
          f.features.map(v => "%.7f".formatLocal(java.util.Locale.ROOT, v)).mkString(",")))
        .toDF("media_id", "kind", "n_bytes", "digest", "features_csv")
    },
    Some {
      val dims = (0 until 8).map(i =>
        s"printf('%.7f', (('0x' || substr(md5(text), ${2 * i + 1}, 2))::INT - 128) / 128.0)")
      s"""SELECT doc_id AS media_id, 'text' AS kind,
       octet_length(encode(text))::BIGINT AS n_bytes, md5(text) AS digest,
       concat_ws(',', ${dims.mkString(", ")}) AS features_csv
FROM documents"""
    },
    "Batched decode + feature extraction over binary payloads (stub codec).")

  // Frame sampling registered end-to-end: documents pose as "video" payloads
  // (duration = n_chars ms), one frame per 100 ms. The per-media frame count
  // is closed-form over the metadata, so the flatMap row multiplication is
  // fully oracle-checked even though the frame bytes themselves are not.
  private val mFrameSample = GQuery(
    "m_frame_sample",
    (s, dir) => {
      import s.implicits._
      import MediaPipeline._
      val recs = Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]
        .map { case (id, text, n) =>
          MediaRecord(id, "video", text.getBytes("UTF-8"), MediaMeta(0, 0, n, "fake"))
        }
      MediaPipeline.sampleFrames(recs, 100L)
        .groupByKey(_.media_id)
        .count()
        .toDF("media_id", "n_frames")
    },
    Some("""SELECT doc_id AS media_id, greatest(1, n_chars // 100) AS n_frames
FROM documents"""),
    "Frame sampling over video payloads; per-media frame counts verified.")

  // Binary-payload dedup by LEADING-CHUNK digest: hash the first 64
  // bytes of each payload, group, keep the lowest media_id as the
  // canonical copy, report the duplicate sets. Hashing a fixed-size
  // prefix instead of the whole blob is the standard first pass for
  // large media (a 4 GB video digests from one read of its head, not a
  // full scan); payloads that collide on the head go to full-content
  // verification (d_exact_dedup's digest shape). At 100 TB the chunk
  // digest computes IN the scan (64 bytes per payload, no decode), the
  // shuffle key is the 32-hex digest (uniform by construction, no
  // skew), and only groups with a second copy survive the HAVING, so
  // the output is bounded by the duplicate mass, not the corpus.
  private val mMediaDedup = GQuery(
    "m_media_dedup",
    (s, dir) =>
      Tables.t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          md5(substring(col("text"), 1, 64).cast("binary")).as("chunk_digest"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .groupBy(col("chunk_digest"))
        .agg(count(lit(1)).as("n_copies"),
          min(col("media_id")).as("keeper_id"),
          max(col("n_bytes")).as("n_bytes"))
        .filter(col("n_copies") > 1L),
    Some("""SELECT md5(substr(text, 1, 64)) AS chunk_digest, count(*) AS n_copies,
       min(doc_id) AS keeper_id, max(octet_length(encode(text))::BIGINT) AS n_bytes
FROM documents
GROUP BY 1 HAVING count(*) > 1"""),
    "Media dedup by leading-chunk digest; canonical keeper = min id per duplicate set.")

  val all: Seq[GQuery] = Seq(mMediaMeta, mMediaFeatures, mFrameSample, mMediaDedup)
}
