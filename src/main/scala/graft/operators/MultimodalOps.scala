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
  // feature vectors. Deterministic fake decoder; rows-only driver check.
  // The raw array<float> column is kept out of the registered result — the
  // driver's pandas compare cannot hash numpy arrays — and replaced with a
  // canonical per-row rendering (exact: every feature is a multiple of
  // 1/128, so "%.6f" is lossless). MediaPipelineSpec covers the typed path.
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
          f.features.map(v => "%.6f".formatLocal(java.util.Locale.ROOT, v)).mkString(",")))
        .toDF("media_id", "kind", "n_bytes", "digest", "features_csv")
    },
    None,
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

  val all: Seq[GQuery] = Seq(mMediaMeta, mMediaFeatures, mFrameSample)
}
