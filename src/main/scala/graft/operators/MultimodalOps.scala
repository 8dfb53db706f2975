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

  /** 64-bit perceptual fingerprint (aHash) over the DECODED content of a
    * media payload, as two 32-bit halves in BIGINTs (the e_knn_hamming
    * packing — one 64-bit word would overflow DuckDB's checked BIGINT on
    * the sign bit). The decode stub for text-posing-as-media is content
    * normalization (lowercase + whitespace collapse): two byte-different
    * ENCODINGS of the same content — a re-encode — normalize to the same
    * signal, exactly what a real image decode does for PNG-vs-JPEG of
    * one picture. The aHash itself is the classic recipe on the decoded
    * signal: sample a fixed 8x8 grid (64 evenly-spaced positions), bit b
    * = sample_b above the grid mean. All-integer comparisons (v*64 >
    * total avoids the division), so the fingerprint is bit-identical
    * across engines. Input needs (doc_id, text); emits
    * (media_id, lo, hi) plus any `carry` columns (the streaming dual
    * carries its event time through). */
  private[graft] def mediaFingerprint(docs: org.apache.spark.sql.DataFrame,
      carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    docs
      .select(Seq(col("doc_id").as("media_id"),
        // Explicit whitespace class, NOT \s: Java's \s includes \x0B
        // (vertical tab) while DuckDB's RE2 \s does not, so a payload
        // carrying one would fingerprint differently per engine. The
        // oracle twin (duckMediaFp) uses the identical class.
        lower(regexp_replace(col("text"), "[ \\t\\n\\r\\f]+", " ")).as("s")) ++
        carry.map(col): _*)
      .filter(length(col("s")) >= 1)
      // ONE native codegen'd pass per payload (graft_media_ahash):
      // sample + mean + bits in a single codepoint walk. The first
      // formulation was a transform/aggregate HOF chain — interpreted
      // CodegenFallback, re-evaluated at every downstream reference —
      // and measured ~1 ms/doc, 5x the whole simhash sibling
      // (BASELINE.md round-18 note).
      .withColumn("ah", graft.functions.GraftFunctions.mediaAHash(col("s")))
      .select(Seq(expr("element_at(ah, 1)").as("lo"),
        expr("element_at(ah, 2)").as("hi"), col("media_id")) ++ carry.map(col): _*)
      .select(Seq(col("media_id"), col("lo"), col("hi")) ++ carry.map(col): _*)

  /** Band-explode a fingerprint frame: one row per (bi, bb) byte band
    * of the 64-bit fingerprint, every input column carried — the ONE
    * banding arithmetic shared by the batch pair query and the
    * streaming ingest monitor. */
  private[graft] def mediaBanded(fp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    fp.withColumn("bi", explode(expr("sequence(0, 7)")))
      .withColumn("bb", expr(
        "CASE WHEN bi < 4 THEN (lo div shiftleft(1L, bi * 8)) % 256 " +
          "ELSE (hi div shiftleft(1L, (bi - 4) * 8)) % 256 END"))

  /** The shared fingerprint CTE chain, DuckDB side — the oracle twin of
    * [[mediaFingerprint]], ending in `fp(media_id, lo, hi)`. */
  private val duckMediaFp: String =
    raw"""nrm AS (SELECT doc_id AS media_id, lower(regexp_replace(text, '[ \t\n\r\f]+', ' ', 'g')) AS s FROM documents),
v AS (SELECT media_id, length(s) AS len,
        list_transform(range(64), b -> ascii(substr(s, CAST(1 + (b * length(s)) // 64 AS INT), 1))) AS vals
      FROM nrm WHERE length(s) >= 1),
f AS (SELECT media_id, vals, list_aggregate(vals, 'sum') AS total FROM v),
fp AS (SELECT media_id,
        list_aggregate(list_transform(range(32), j -> CASE WHEN vals[j+1] * 64 > total THEN (1::BIGINT << j) ELSE 0::BIGINT END), 'sum') AS lo,
        list_aggregate(list_transform(range(32), j -> CASE WHEN vals[j+33] * 64 > total THEN (1::BIGINT << j) ELSE 0::BIGINT END), 'sum') AS hi
      FROM f)"""

  /** Oversized perceptual bands are dropped, the d_simhash_neardup /
    * d_minhash_lsh_pairs cap (mirrored in the oracle): a byte band has
    * only 256 values, so a mega-corpus WILL have hot buckets, and the
    * exact-check stage must stay bounded by cap^2 per bucket, never
    * corpus^2. */
  private[graft] val mediaBandCap = 1000

  // Perceptual media near-dup (round-18 verdict task 2) — the near-dup
  // ladder rung the multimodal family lacked: m_media_dedup is
  // digest-EXACT on the leading chunk, so a re-encoded duplicate
  // (byte-different, same content) sails through — the media analog of
  // the text-corpus problem MinHash/SimHash solve. This is the media
  // aHash pipeline: decode-normalize -> 64-bit perceptual fingerprint ->
  // pigeonhole byte bands (8 bands x 8 bits: any pair at hamming <= 7
  // shares at least one exact band, so the banded equi join finds EVERY
  // qualifying pair — never all-pairs) -> exact XOR+POPCNT check at the
  // aHash similarity threshold (<= 7 of 64). At 100 TB: the fingerprint
  // computes in the scan (one pass, codegen'd sign-pack), the shuffle
  // key is (band, byte), hot buckets are capped like every LSH query in
  // the repo, and the exact check is two integer ops per candidate.
  /** The perceptual pair pipeline behind m_media_neardup — one
    * implementation shared with the groups query so the edge set
    * cannot drift from the pair report. Emits
    * (media_id_a < media_id_b, hd) at the hamming-<= 7 threshold. */
  private def mediaNeardupPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // computed ONCE per (session, dir, corpus-fingerprint) and pinned:
    // m_media_neardup, m_media_dedup_groups and the streaming keeper
    // calibration each re-ran the fingerprint scan + banded self-join
    // (the CorpusCache discipline — graft.CorpusCache scaladoc)
    graft.CorpusCache.memo(s, dir, "media_pairs")(
      graft.operators.TextOps.docsTextFp(s, dir))(
      graft.Checkpoints.pin(mediaNeardupPairsUncached(s, dir)))

  private def mediaNeardupPairsUncached(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // pinned: the banded frame feeds the hot-bucket agg AND both join
    // sides — unpinned, Catalyst re-evaluates the fingerprint scan
    // three times (the d_curate_corpus survivor-set lesson)
    val banded = graft.Checkpoints.pin(
      mediaBanded(mediaFingerprint(Tables.t(s, dir, "documents"))),
      eager = true)
    val small = banded.groupBy(col("bi"), col("bb"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, mediaBandCap))
      .select(col("bi"), col("bb"))
    val in = banded.join(small, Seq("bi", "bb"))
    val a = in.select(col("bi"), col("bb"), col("media_id").as("media_id_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = in.select(col("bi"), col("bb"), col("media_id").as("media_id_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    a.join(b, Seq("bi", "bb"))
      .filter(col("media_id_a") < col("media_id_b"))
      .withColumn("hd", expr(
        "cast(bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b) AS bigint)"))
      .filter(col("hd") <= 7)
      .groupBy(col("media_id_a"), col("media_id_b"))
      .agg(min(col("hd")).as("hd"))
  }

  /** The pair pipeline's oracle twin, ending in
    * `mp(media_id_a, media_id_b, hd)` — shared verbatim by the pair
    * and groups oracles. */
  private val duckMediaPairs: String = s"""$duckMediaFp,
banded AS (SELECT media_id, lo, hi, bi,
             CASE WHEN bi < 4 THEN (lo // (1::BIGINT << (bi * 8))) % 256
                  ELSE (hi // (1::BIGINT << ((bi - 4) * 8))) % 256 END AS bb
           FROM fp, (SELECT unnest(range(8)) AS bi)),
small AS (SELECT bi, bb FROM banded GROUP BY bi, bb HAVING count(*) BETWEEN 2 AND $mediaBandCap),
inb AS (SELECT banded.* FROM banded JOIN small USING (bi, bb)),
p AS (SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
        CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hd
      FROM inb a JOIN inb b ON a.bi = b.bi AND a.bb = b.bb AND a.media_id < b.media_id),
mp AS (SELECT media_id_a, media_id_b, min(hd) AS hd FROM p WHERE hd <= 7 GROUP BY 1, 2)"""

  private val mMediaNeardup = GQuery(
    "m_media_neardup",
    (s, dir) => mediaNeardupPairs(s, dir),
    Some(s"""WITH $duckMediaPairs
SELECT media_id_a, media_id_b, hd FROM mp"""),
    "Perceptual media near-dup (aHash, hamming <= 7) via pigeonhole byte bands over the decoded-content fingerprint; catches re-encoded duplicates the exact digest misses.")

  // Keeper election over the perceptual pairs — the rung that makes the
  // media ladder actionable (the d_dedup_groups shape on media): min-id
  // connected components over the hamming-<= 7 edge set, so a re-encode
  // CHAIN (A~B~C where A and C never met in a band) still collapses to
  // one canonical copy. Same pointer-doubling label propagation as the
  // text family (loud non-convergence, log-diameter rounds); the
  // recursive-CTE oracle replays the closure over the shared pair CTEs.
  // Only media that HAVE a near-dup appear (pairless payloads need no
  // election) — exactly d_dedup_groups' contract.
  /** The batch groups result under calibrate-friendly names —
    * (corpus_id, keeper) — ONE implementation shared by the registered
    * query and the streaming keeper election's calibrate half
    * ([[graft.streaming.StreamingPipelines.mediaKeeperCalibrate]]), so
    * the canonical set an ingest stream elects against cannot drift
    * from the oracle-checked batch report. */
  private[graft] def mediaKeeperMap(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // the component labels are cached beside the pairs (same guard):
    // the registered groups query and the streaming keeper calibration
    // each ran the full propagation loop on the identical edge set
    graft.CorpusCache.memo(s, dir, "media_keeper")(
      graft.operators.TextOps.docsTextFp(s, dir))(
      graft.operators.TextOps.minLabelComponents(
        mediaNeardupPairs(s, dir)
          .select(col("media_id_a").as("src"), col("media_id_b").as("dst")))
        .select(col("doc_id").as("corpus_id"), col("comp").as("keeper")))

  private val mMediaDedupGroups = GQuery(
    "m_media_dedup_groups",
    (s, dir) => mediaKeeperMap(s, dir)
      .select(col("corpus_id").as("media_id"), col("keeper").as("keeper_id")),
    Some(s"""WITH RECURSIVE $duckMediaPairs,
e AS (SELECT media_id_a AS src, media_id_b AS dst FROM mp
      UNION SELECT media_id_b, media_id_a FROM mp),
r(src, dst) AS (SELECT src, dst FROM e
                UNION SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src)
SELECT src AS media_id, least(src, min(dst)) AS keeper_id FROM r GROUP BY src"""),
    "Perceptual media dedup groups: min-id connected components over the hamming pairs — canonical keeper election that collapses re-encode chains.")

  val all: Seq[GQuery] = Seq(mMediaMeta, mMediaFeatures, mFrameSample,
    mMediaDedup, mMediaNeardup, mMediaDedupGroups)
}
