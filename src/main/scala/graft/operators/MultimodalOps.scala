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
  // feature vectors. Deterministic fake decoder; rows-only driver check
  // (feature floats are not SQL-expressible).
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
      MediaPipeline.decodeAndExtract(recs).toDF()
    },
    None,
    "Batched decode + feature extraction over binary payloads (stub codec).")

  val all: Seq[GQuery] = Seq(mMediaMeta, mMediaFeatures)
}
