package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}
import graft.functions.GraftFunctions

/** LLM-training-data text operators over the `documents` table
  * (`doc_id, text, lang, source, n_chars`): token/quality statistics,
  * language-ID heuristics, fingerprinting, exact + near-duplicate
  * detection (n-gram Jaccard, MinHash+LSH, SimHash).
  *
  * Cross-engine determinism: every hash is derived from md5 (identical in
  * Spark and DuckDB) — `H(x) = first 8 hex digits of md5(x) as uint32`.
  * The Spark expression text and the DuckDB oracle SQL are generated from
  * the same Scala constants so the two sides cannot drift.
  *
  * Scale notes (100 TB): every per-document computation here is a pure
  * map — shingling, MinHash signatures, SimHash, fingerprints run inside
  * the scan with NO shuffle. Only the candidate-pair stages shuffle, and
  * only on band/bucket keys (never all-pairs): LSH bands for MinHash,
  * (lang, length-bucket) blocks for the exact-Jaccard verifier.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")

  /** 2^31-1 — modulus for the rolling fingerprint. */
  private val P31 = 2147483647L
  /** MinHash modulus + permutations — the SHARED constants in
    * [[graft.functions.TextHashUtil]], also used by the SQL-function
    * registration so both paths compute identical signatures. */
  private val MP = graft.functions.TextHashUtil.MP
  private val perms = graft.functions.TextHashUtil.perms

  /** Base hash, Spark side: uint32 from the md5 hex prefix. */
  private def hS(x: String) = s"cast(conv(substring(md5($x),1,8),16,10) as bigint)"
  /** Base hash, DuckDB side — same value bit-for-bit. */
  private def hD(x: String) = s"(('0x'||substr(md5($x),1,8))::BIGINT)"
  /** 48-bit variant (== GraftFunctions.md5Hash48), Spark side. */
  private def hS48(x: String) = s"cast(conv(substring(md5($x),1,12),16,10) as bigint)"
  /** 48-bit variant, DuckDB side — same value bit-for-bit. */
  private def hD48(x: String) = s"(('0x'||substr(md5($x),1,12))::BIGINT)"

  /** Sorted distinct 60-bit md5 hashes of the 13-token n-grams — the
    * decontamination gram domain, SHARED by the batch query and the
    * streaming router ([[graft.streaming.StreamingPipelines.decontaminate]])
    * so the two sides cannot drift. The native [[graft.functions]] kernel
    * hashes the chr(1)-joined gram bytes directly (no per-gram string
    * building / hex parsing), in the exact domain the DuckDB oracle
    * recomputes as `('0x'||substr(md5(gram),1,15))::BIGINT`. */
  private[graft] def gram13(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.ngramHashes(toks, 13)

  // ---------------------------------------------------------------------
  // Token counting + length statistics (pure map; columnar scan → codegen).
  private val tTextStats = GQuery(
    "t_text_stats",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .selectExpr(
          "doc_id",
          "size(toks) AS n_tokens",
          "n_chars",
          "size(array_distinct(toks)) AS n_distinct",
          "round(aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x) / cast(size(toks) AS double), 4) AS avg_tok_len"),
    Some("""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, len(toks) AS n_tokens, n_chars, len(list_distinct(toks)) AS n_distinct,
       round(list_aggregate(list_transform(toks, t -> length(t)), 'sum') / len(toks)::DOUBLE, 4) AS avg_tok_len
FROM t"""),
    "Whitespace tokenizer + per-doc length stats.")

  // Quality scoring: stopword ratio, short-token ratio, lexical diversity,
  // combined into one deterministic score. Same arithmetic both engines.
  private val tQuality = GQuery(
    "t_quality_score",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("cast(size(toks) AS double)"))
        .selectExpr(
          "doc_id",
          "round(size(filter(toks, t -> t IN ('the', 'a'))) / n, 4) AS stop_ratio",
          "round(size(filter(toks, t -> length(t) <= 3)) / n, 4) AS short_ratio",
          "round(size(array_distinct(toks)) / n, 4) AS distinct_ratio",
          "round(0.4 * (1.0 - size(filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (size(array_distinct(toks)) / n) + 1e-9, 4) AS quality_score"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' '))::DOUBLE AS n FROM documents)
SELECT doc_id,
       round(len(list_filter(toks, t -> t IN ('the', 'a'))) / n, 4) AS stop_ratio,
       round(len(list_filter(toks, t -> length(t) <= 3)) / n, 4) AS short_ratio,
       round(len(list_distinct(toks)) / n, 4) AS distinct_ratio,
       round(0.4 * (1.0 - len(list_filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (len(list_distinct(toks)) / n) + 1e-9, 4) AS quality_score
FROM t"""),
    "Length/stopword/diversity quality heuristics for corpus filtering.")

  // Language-ID: marker-token n-gram heuristic with a deterministic argmax.
  private val langCase =
    """CASE WHEN en_c >= greatest(es_c, de_c) AND en_c > 0 THEN 'en'
            WHEN es_c >= de_c AND es_c > 0 THEN 'es'
            WHEN de_c > 0 THEN 'de'
            ELSE 'und' END"""
  private val tLangid = GQuery(
    "t_langid",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("en_c", expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and')))"))
        .withColumn("es_c", expr("size(filter(toks, t -> t IN ('el', 'la', 'los', 'de')))"))
        .withColumn("de_c", expr("size(filter(toks, t -> t IN ('der', 'die', 'das', 'und')))"))
        .selectExpr("doc_id", "lang AS declared_lang", "en_c", "es_c", "de_c",
          s"$langCase AS pred_lang"),
    Some(s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, lang,
        len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and'))) AS en_c,
        len(list_filter(toks, t -> t IN ('el', 'la', 'los', 'de'))) AS es_c,
        len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und'))) AS de_c
      FROM t)
SELECT doc_id, lang AS declared_lang, en_c, es_c, de_c, $langCase AS pred_lang
FROM c"""),
    "Marker-token language ID with deterministic tie-break.")

  // Language-ID confusion matrix (round 13) — the EVAL for t_langid: the
  // detector's prediction against the fixture's declared label, as the
  // (declared, predicted, n) matrix plus per-cell share of the declared
  // language's row. The quality loop every pretraining lang-filter needs
  // (which languages leak into which buckets, and how much) — all
  // integer counts; the share is the single division, rounded once with
  // the nudge. Scale shape: the same single corpus scan as t_langid,
  // then a #langs² partial agg; the window computing row totals runs
  // over the tiny matrix, never the corpus.
  private val tLangidConfusion = GQuery(
    "t_langid_confusion",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("en_c", expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and')))"))
        .withColumn("es_c", expr("size(filter(toks, t -> t IN ('el', 'la', 'los', 'de')))"))
        .withColumn("de_c", expr("size(filter(toks, t -> t IN ('der', 'die', 'das', 'und')))"))
        .selectExpr("lang AS declared_lang", s"$langCase AS pred_lang")
        .groupBy(col("declared_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy("declared_lang")))
        .select(col("declared_lang"), col("pred_lang"), col("n"),
          round(col("n") / col("row_total").cast("double") + lit(1e-9), 4)
            .as("share")),
    Some(s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, lang,
        len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and'))) AS en_c,
        len(list_filter(toks, t -> t IN ('el', 'la', 'los', 'de'))) AS es_c,
        len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und'))) AS de_c
      FROM t),
p AS (SELECT lang AS declared_lang, $langCase AS pred_lang FROM c),
m AS (SELECT declared_lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
SELECT declared_lang, pred_lang, n,
       round(n / (CAST(sum(n) OVER (PARTITION BY declared_lang) AS BIGINT))::DOUBLE + 1e-9, 4) AS share
FROM m"""),
    "Language-ID confusion matrix: detector vs declared label, with per-declared-language shares.")

  // Document fingerprinting: md5 content fingerprint + order-sensitive
  // rolling polynomial hash over token hashes (mod 2^31-1).
  private val tFingerprint = GQuery(
    "t_fingerprint",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) > 0"))
        .selectExpr(
          "doc_id",
          "md5(text) AS md5_fp",
          s"aggregate(transform(toks, t -> ${hS("t")} % $P31), 0L, (acc, h) -> (acc * 31 + h) % $P31) AS roll_fp"),
    Some(s"""SELECT doc_id, md5(text) AS md5_fp,
       list_reduce(list_transform(string_split(text, ' '), t -> ${hD("t")} % $P31),
                   (acc, h) -> (acc * 31 + h) % $P31) AS roll_fp
FROM documents WHERE len(string_split(text, ' ')) > 0"""),
    "Content digest + order-sensitive rolling hash (seeded fold matches DuckDB's list_reduce).")

  // Exact dedup: group by normalized-content digest, keep lowest doc_id.
  // At 100 TB: one shuffle on the 128-bit digest (never on the text).
  private val dExactDedup = GQuery(
    "d_exact_dedup",
    (s, dir) =>
      docs(s, dir)
        .withColumn("fp", expr("md5(lower(trim(text)))"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies")),
    Some("""SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1"""),
    "Exact dedup via content digest; keeps min doc_id per group.")

  // n-gram Jaccard near-dup: exact token-trigram Jaccard, but only inside
  // (lang, length-bucket) blocks — the all-pairs verifier you run on
  // candidates, never on the full corpus. Trigram sets are represented as
  // SORTED DISTINCT 60-bit md5 hashes computed once per document by a
  // native expression ([[graft.functions.TextHashUtil.trigramHashes]]);
  // per pair a compiled linear merge counts the intersection — 8 bytes
  // per shingle through the shuffle and no interpreted set ops. The
  // oracle works in the same hash domain (collision odds ~1e-12).
  /** The per-doc sorted trigram-hash sets with their (lang, length
    * bucket) block keys, computed ONCE per (session, dir,
    * corpus-fingerprint) and pinned: d_ngram_jaccard and
    * d_containment_pairs each self-join this exact frame, which
    * unpinned meant the native trigram pass ran TWICE per query (both
    * join sides) and four times across the pair — the md5-per-shingle
    * map is the family's dominant cost. */
  private def trigramBlocksDF(s: SparkSession, dir: String): DataFrame =
    graft.CorpusCache.memo(s, dir, "trigram_blocks")(docsTextFp(s, dir))(
      graft.Checkpoints.pin(docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) >= 3"))
        .withColumn("tri", graft.functions.GraftFunctions.trigramHashes(col("toks")))
        .select(col("doc_id"), col("lang"), expr("n_chars div 100").as("lb"),
          col("tri"))))

  private val dNgramJaccard = GQuery(
    "d_ngram_jaccard",
    (s, dir) => {
      val base = trigramBlocksDF(s, dir)
      val a = base.select(col("doc_id").as("doc_a"), col("lang"), col("lb"), col("tri").as("tri_a"))
      val b = base.select(col("doc_id").as("doc_b"), col("lang"), col("lb"), col("tri").as("tri_b"))
      a.join(b, Seq("lang", "lb"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("inter",
          graft.functions.GraftFunctions.sortedIntersectCount(col("tri_a"), col("tri_b")))
        .withColumn("jac", expr(
          "round(inter / cast(size(tri_a) + size(tri_b) - inter AS double), 4)"))
        .filter(col("jac") >= 0.1)
        .select(col("doc_a"), col("doc_b"), col("jac"))
    },
    Some("""WITH t AS (
  SELECT doc_id, lang, n_chars // 100 AS lb,
         list_sort(list_distinct(list_transform(
           list_transform(range(len(string_split(text, ' ')) - 2),
             i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], chr(1))),
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS tri
  FROM documents WHERE len(string_split(text, ' ')) >= 3
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.tri, b.tri)) AS inter,
         len(a.tri) AS na, len(b.tri) AS nb
  FROM t a JOIN t b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, round(inter / (na + nb - inter)::DOUBLE, 4) AS jac
FROM p WHERE round(inter / (na + nb - inter)::DOUBLE, 4) >= 0.1"""),
    "Blocked exact trigram-Jaccard near-dup pairs (threshold 0.1), hashed shingle sets.")

  // Containment similarity over the same blocked pair structure:
  // C = |A∩B| / min(|A|,|B|) — the asymmetric measure that catches
  // SUBSET duplication (a quote, a boilerplate inclusion, a doc embedded
  // in a larger one), which Jaccard dilutes toward 0 as the size gap
  // grows. Same shingle-hash domain and plan shape as d_ngram_jaccard:
  // sorted 60-bit trigram sets built once per doc, compiled linear-merge
  // intersection, candidates only within (lang, length-bucket) blocks.
  private val dContainmentPairs = GQuery(
    "d_containment_pairs",
    (s, dir) => {
      val base = trigramBlocksDF(s, dir)
      val a = base.select(col("doc_id").as("doc_a"), col("lang"), col("lb"), col("tri").as("tri_a"))
      val b = base.select(col("doc_id").as("doc_b"), col("lang"), col("lb"), col("tri").as("tri_b"))
      a.join(b, Seq("lang", "lb"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("inter",
          graft.functions.GraftFunctions.sortedIntersectCount(col("tri_a"), col("tri_b")))
        .withColumn("containment", expr(
          "round(inter / cast(least(size(tri_a), size(tri_b)) AS double), 4)"))
        .filter(col("containment") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("containment"))
    },
    Some("""WITH t AS (
  SELECT doc_id, lang, n_chars // 100 AS lb,
         list_sort(list_distinct(list_transform(
           list_transform(range(len(string_split(text, ' ')) - 2),
             i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], chr(1))),
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS tri
  FROM documents WHERE len(string_split(text, ' ')) >= 3
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.tri, b.tri)) AS inter,
         len(a.tri) AS na, len(b.tri) AS nb
  FROM t a JOIN t b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, round(inter / least(na, nb)::DOUBLE, 4) AS containment
FROM p WHERE round(inter / least(na, nb)::DOUBLE, 4) >= 0.5"""),
    "Blocked trigram containment pairs (>= 0.5) — catches subset duplication Jaccard dilutes.")

  // MinHash signature digest: 16 permutation minima per doc. Spark side is
  // the native MinHashSig expression (one compiled pass, zero shuffles);
  // the oracle recomputes the same minima declaratively.
  private def mhDuckExprs: Seq[String] = perms.zipWithIndex.map { case ((a, b), i) =>
    s"list_aggregate(list_transform(hs, h -> ($a * h + $b) % $MP), 'min') AS mh$i"
  }
  private val shingleDuck =
    s"list_transform(list_distinct(list_transform(range(len(toks) - 2), i -> array_to_string(toks[i + 1:i + 3], chr(1)))), s -> ${hD("s")})"

  private val dMinhashSig = GQuery(
    "d_minhash_sig",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) >= 3"))
        .withColumn("mharr", graft.functions.GraftFunctions.minhashSig(
          col("toks"), perms.map(_._1), perms.map(_._2), MP))
        .selectExpr("doc_id",
          "array_join(transform(mharr, x -> cast(x AS string)), '_') AS sig"),
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) >= 3),
h AS (SELECT doc_id, $shingleDuck AS hs FROM t),
m AS (SELECT doc_id, ${mhDuckExprs.mkString(", ")} FROM h)
SELECT doc_id, concat_ws('_', ${(0 until 16).map("mh" + _).mkString(", ")}) AS sig FROM m"""),
    "16-permutation MinHash signature per document (map-only).")

  // MinHash + LSH banded candidate pairs: 4 bands x 4 rows; docs sharing any
  // band key become candidates; est similarity = fraction of equal minhashes.
  //
  // Plan shape (the 100 TB one): the 16-permutation signature is evaluated
  // EXACTLY ONCE per document into a single array column — bands are then
  // derived from that attribute, so projection collapse can't re-inline the
  // expensive md5/minhash expressions (a naive self-join re-evaluated the
  // whole pipeline per side and per band: 12x slower at sf0.1). Candidates
  // come from one groupBy on the band key (collect the bucket, expand pairs
  // in-bucket) instead of a self-join — one scan, shuffles only on band
  // keys and pair dedup. Buckets larger than `lshBucketCap` are dropped:
  // a degenerate band (thousands of identical docs) belongs to exact-dedup,
  // and the cap bounds the quadratic expansion at any scale.
  private val lshBucketCap = 1000

  /** LSH candidate pairs (doc_a, doc_b, est_sim) over any (doc_id, text)
    * frame — shared by the pairs query, the dedup-groups connected
    * components, the edit-distance verifier, and (over exact-dedup
    * survivors) the curation capstone. */
  /** Banded MinHash signature rows (doc_id, mharr, band_idx, band_key)
    * over any (doc_id, text) frame — the signature is evaluated exactly
    * once per document (see the plan note on [[lshPairsFrom]]); SHARED by
    * the in-corpus pair listing and the cross-corpus ingest check. */
  private def bandedSig(base0: DataFrame): DataFrame =
    base0
      .withColumn("toks", expr("split(text, ' ')"))
      .filter(expr("size(toks) >= 3"))
      .withColumn("mharr", graft.functions.GraftFunctions.minhashSig(
        col("toks"), perms.map(_._1), perms.map(_._2), MP))
      .select(col("doc_id"), col("mharr"), explode(expr("sequence(0, 3)")).as("band_idx"))
      .withColumn("band_key", expr("concat_ws('_', slice(mharr, band_idx * 4 + 1, 4))"))

  private def lshPairsFrom(base0: DataFrame): DataFrame = {
    val sig = bandedSig(base0)
    sig
      .groupBy(col("band_idx"), col("band_key"))
      .agg(collect_list(struct(col("doc_id"), col("mharr"))).as("ds"))
      .filter(size(col("ds")).between(2, lshBucketCap))
      .withColumn("pair", explode(expr(
        """flatten(transform(sequence(0, size(ds) - 2), i ->
           transform(sequence(i + 1, size(ds) - 1), j ->
             struct(element_at(ds, i + 1) AS x, element_at(ds, j + 1) AS y))))""")))
      .select(
        least(col("pair.x.doc_id"), col("pair.y.doc_id")).as("doc_a"),
        greatest(col("pair.x.doc_id"), col("pair.y.doc_id")).as("doc_b"),
        expr("round(size(filter(zip_with(pair.x.mharr, pair.y.mharr, (x, y) -> x = y), v -> v)) / cast(16 as double), 4)").as("est_sim"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("est_sim")).as("est_sim"))
  }

  /** ONE narrow fingerprint aggregation over (doc_id, text) — the
    * [[graft.CorpusCache]] guard for every documents-derived cached
    * artifact below (order-independent, multiplicity-sensitive
    * DECIMAL(38,0) hash-sum; the IvfPqIndex / OPQ-cache discipline
    * verbatim). */
  private[operators] def docsTextFp(s: SparkSession, dir: String): String = {
    val r = docs(s, dir).agg(count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("doc_id"), col("text")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h")).head()
    s"n=${r.getLong(0)}:h=${r.getDecimal(1)}"
  }

  /** The docs-corpus LSH candidate pairs, computed ONCE per (session,
    * dir, corpus-fingerprint) and Checkpoints-pinned: SIX registered
    * queries (pair report, dedup groups, cluster profile, edit-distance
    * verifier, split leakage, cross-source overlap) consume this exact
    * frame and each previously re-ran the full minhash + banding +
    * bucket self-join pipeline from the parquet scan (round-19
    * optimization; the OPQ `calibCache` pattern, verdict-18 task 3).
    * d_curate_corpus keeps its own `lshPairsFrom(survivors)` — a
    * different source frame, deliberately uncached. */
  private def lshPairsDF(s: SparkSession, dir: String): DataFrame =
    graft.CorpusCache.memo(s, dir, "lsh_pairs")(docsTextFp(s, dir))(
      graft.Checkpoints.pin(lshPairsFrom(docs(s, dir))))

  /** The est >= 0.5 near-dup component labels over [[lshPairsDF]] —
    * shared by d_dedup_groups and d_cluster_size_profile, which
    * previously each ran the full label-propagation loop (every
    * iteration a join + checkpoint + convergence job) on the same edge
    * set. Same cache discipline; the loop's own per-iteration pins are
    * unchanged. */
  private def dedupComponentsDF(s: SparkSession, dir: String): DataFrame =
    graft.CorpusCache.memo(s, dir, "lsh_components_05")(docsTextFp(s, dir))(
      minLabelComponents(
        lshPairsDF(s, dir)
          .filter(col("est_sim") >= 0.5)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))))

  /** Matching DuckDB CTE body producing (doc_a, doc_b, est_sim), over any
    * source relation exposing (doc_id, text). */
  private def lshPairsOracleFrom(src: String): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src WHERE len(string_split(text, ' ')) >= 3),
h AS (SELECT doc_id, $shingleDuck AS hs FROM t),
m AS (SELECT doc_id, ${mhDuckExprs.mkString(", ")} FROM h),
bands AS (${(0 until 4).map(z =>
      s"SELECT doc_id, $z AS band_idx, concat_ws('_', ${(4 * z until 4 * z + 4).map("mh" + _).mkString(", ")}) AS band_key FROM m").mkString("\nUNION ALL\n")}),
bsz AS (SELECT band_idx, band_key FROM bands GROUP BY band_idx, band_key
        HAVING count(*) BETWEEN 2 AND $lshBucketCap),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         JOIN bsz s ON s.band_idx = a.band_idx AND s.band_key = a.band_key),
pairs AS (SELECT c.doc_a, c.doc_b,
       round((${(0 until 16).map(i => s"CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) / 16.0::DOUBLE, 4) AS est_sim
FROM cand c JOIN m x ON c.doc_a = x.doc_id JOIN m y ON c.doc_b = y.doc_id)"""

  private val lshPairsOracle: String = lshPairsOracleFrom("documents")

  private val dMinhashLsh = GQuery(
    "d_minhash_lsh_pairs",
    (s, dir) => lshPairsDF(s, dir),
    Some(s"""WITH $lshPairsOracle
SELECT doc_a, doc_b, est_sim FROM pairs"""),
    "LSH-banded MinHash candidate pairs with estimated Jaccard.")

  // Dedup GROUPS: connected components over the LSH candidate graph
  // (est >= 0.5), labeling every clustered document with the smallest
  // doc_id in its component — the "pick one representative per near-dup
  // cluster" step of a dedup pipeline. Spark side runs min-label
  // propagation to a fixpoint (log-diameter iterations; near-dup clusters
  // are shallow, and each iteration is one small self-join over the edge
  // set — at 100 TB this loop runs on the pair list, typically orders of
  // magnitude smaller than the corpus, with localCheckpoint() to cut
  // lineage if diameters grow). Oracle: recursive-CTE transitive closure.
  /** Min-label connected components over an (src, dst) edge frame —
    * pointer-doubling label propagation to a fixpoint; throws if the
    * component labels have not converged within maxIter rounds.
    * Shared across operator families (LSH text clusters here,
    * embedding-cosine clusters in [[EmbeddingOps]]). */
  private[operators] def minLabelComponents(edges0: DataFrame): DataFrame = {
      // Materialize the edge list ONCE — the propagation loop joins
      // against it every iteration and must not re-run the LSH pipeline.
      val edges = edges0.transform(graft.Checkpoints.pin(_))
      val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      // Seed each label with the ONE-HOP neighborhood minimum (not self):
      // near-dup components are mostly size 2-3, which makes the seed
      // already the fixpoint — the loop then runs exactly one confirming
      // iteration instead of two, and each saved iteration is two joins,
      // an eager checkpoint and a convergence-check job.
      var comp = sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("comp"))
        .select(col("src").as("doc_id"), col("comp"))
      var converged = false
      var iter = 0
      val maxIter = 20
      while (!converged && iter < maxIter) {
        val neighborMin = sym.join(comp, sym("dst") === comp("doc_id"))
          .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
        val prop = comp.join(neighborMin, comp("doc_id") === neighborMin("src"), "left")
          .select(comp("doc_id"), col("comp").as("old"),
            least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        // pointer-doubling shortcut: comp := comp(comp). Each iteration now
        // halves remaining path length on top of the one-hop propagation,
        // so maxIter=20 bounds component diameters far beyond 2^20 — a
        // chain-shaped cluster can no longer exit the loop unconverged.
        val labels = prop.select(col("doc_id").as("l_id"), col("comp").as("l_comp"))
        // carry the previous label so convergence is read off the same
        // (eagerly checkpointed) frame — no extra join per iteration
        val next = prop.join(labels, prop("comp") === labels("l_id"), "left")
          .select(prop("doc_id"), col("old"),
            least(prop("comp"), coalesce(col("l_comp"), prop("comp"))).as("comp"))
          .transform(graft.Checkpoints.pin(_))
        converged = next.filter(col("comp") =!= col("old")).isEmpty
        comp = next.select(col("doc_id"), col("comp"))
        iter += 1
      }
      // The oracle computes the FULL transitive closure — silently returning
      // unconverged labels would diverge without signal. Fail loudly instead.
      if (!converged) throw new IllegalStateException(
        s"minLabelComponents: unconverged after $maxIter iterations")
      // Convergence receipt (one line per call): with one-hop propagation
      // + pointer doubling the round count grows ~log2(diameter), so this
      // number is the empirical check behind the maxIter=20 bound.
      System.err.println(
        s"[graft] minLabelComponents: converged in $iter rounds (maxIter=$maxIter)")
      comp
  }

  private val dDedupGroups = GQuery(
    "d_dedup_groups",
    (s, dir) => dedupComponentsDF(s, dir),
    Some(s"""WITH RECURSIVE $lshPairsOracle,
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_sim >= 0.5
      UNION SELECT doc_b, doc_a FROM pairs WHERE est_sim >= 0.5),
r(src, dst) AS (SELECT src, dst FROM e
                UNION SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src)
SELECT src AS doc_id, least(src, min(dst)) AS comp FROM r GROUP BY src"""),
    "Near-dup clusters: connected components over LSH pairs, min-id label.")

  // Duplicate-cluster size profile: the histogram of near-dup component
  // sizes — curation telemetry that tells you whether duplication is a
  // long tail of pairs (size-2 clusters) or a few mega-clusters worth
  // routing to exact-dedup first. Reuses the component labels; both
  // trailing aggregations run on the (small) clustered subset.
  private val dClusterSizeProfile = GQuery(
    "d_cluster_size_profile",
    (s, dir) => dedupComponentsDF(s, dir)
      .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters")),
    Some(s"""WITH RECURSIVE $lshPairsOracle,
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_sim >= 0.5
      UNION SELECT doc_b, doc_a FROM pairs WHERE est_sim >= 0.5),
r(src, dst) AS (SELECT src, dst FROM e
                UNION SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
comps AS (SELECT src AS doc_id, least(src, min(dst)) AS comp FROM r GROUP BY src),
szs AS (SELECT comp, count(*) AS sz FROM comps GROUP BY comp)
SELECT sz AS cluster_size, count(*) AS n_clusters FROM szs GROUP BY sz"""),
    "Near-dup cluster size histogram — pair-tail vs mega-cluster duplication profile.")

  // SimHash: 32-bit signature; bit j set when the token-frequency-weighted
  // sum of (+/-1 for bit j of each token hash) is positive. Pure map.
  private def simhashTerms(sumExpr: Int => String): String =
    (0 until 32).map { j =>
      s"(CASE WHEN ${sumExpr(j)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
  private val tSimhash = GQuery(
    "t_simhash",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) > 0"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.simhash32(col("toks")).as("simhash")),
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) > 0),
h AS (SELECT doc_id, list_transform(toks, t -> ${hD("t")}) AS th FROM t)
SELECT doc_id, ${simhashTerms(j =>
        s"list_sum(list_transform(th, h -> CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END))")} AS simhash
FROM h"""),
    "32-bit SimHash signature per document (map-only).")

  // Edit-distance verifier — the generator -> verifier pipeline: exact
  // Levenshtein runs ONLY over MinHash-LSH candidate pairs (est >= 0.3),
  // never over blocks (an in-block all-pairs x O(L^2) verifier measured
  // 26 s at sf0.1 and grows quadratically — the wrong plan at any scale).
  // Distance runs on an ASCII-projected 120-char prefix: Spark's
  // levenshtein counts CODEPOINTS while DuckDB's counts BYTES, so the
  // projection pins both engines to the domain where they coincide.
  private val dEditDistance = GQuery(
    "d_edit_distance_pairs",
    (s, dir) => {
      val pre = docs(s, dir).select(col("doc_id"),
        expr("regexp_replace(substring(text, 1, 120), '[^a-zA-Z0-9 ]', '')").as("pre"))
      lshPairsDF(s, dir)
        .filter(col("est_sim") >= 0.3)
        .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pre_a")), Seq("doc_a"))
        .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pre_b")), Seq("doc_b"))
        .withColumn("edit_dist", expr("levenshtein(pre_a, pre_b)"))
        .filter(col("edit_dist") <= 30)
        .select(col("doc_a"), col("doc_b"), col("edit_dist"))
    },
    Some(s"""WITH $lshPairsOracle,
pv AS (SELECT doc_id, regexp_replace(substr(text, 1, 120), '[^a-zA-Z0-9 ]', '', 'g') AS pre FROM documents),
v AS (SELECT p.doc_a, p.doc_b, levenshtein(a.pre, b.pre) AS edit_dist
      FROM pairs p JOIN pv a ON p.doc_a = a.doc_id JOIN pv b ON p.doc_b = b.doc_id
      WHERE p.est_sim >= 0.3)
SELECT doc_a, doc_b, edit_dist FROM v WHERE edit_dist <= 30"""),
    "Edit-distance verification of LSH candidate pairs (<=30 on 120-char prefix).")

  // SimHash near-dup pairs: pigeonhole byte-banding. For a hamming
  // threshold of 3 over a 32-bit signature, any qualifying pair must share
  // at least one of its 4 bytes (4 bands > 3 differing bits), so
  // candidates come from equi-joins on (band_idx, band_byte) — never
  // all-pairs — and the exact hamming check is one xor + bit_count.
  // All-integer arithmetic: bit-identical across engines by construction.
  // Oversized bands are capped like the MinHash LSH buckets (mirrored in
  // the oracle) to bound the quadratic in-bucket expansion at any scale.
  private val dSimhashNeardup = GQuery(
    "d_simhash_neardup",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) > 0"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.simhash32(col("toks")).as("sh"))
      // pinned: the banded frame feeds the hot-bucket agg AND both join
      // sides — unpinned, the simhash kernel scan ran three times (the
      // mediaNeardupPairs lesson, applied to the text twin in round 19)
      val banded = graft.Checkpoints.pin(base
        .select(col("doc_id"), col("sh"), explode(expr("sequence(0, 3)")).as("bi"))
        .withColumn("bb", expr("(sh div shiftleft(1L, bi * 8)) % 256")))
      val small = banded.groupBy(col("bi"), col("bb"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n").between(2, lshBucketCap))
        .select(col("bi"), col("bb"))
      val in = banded.join(small, Seq("bi", "bb"))
      val a = in.select(col("bi"), col("bb"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = in.select(col("bi"), col("bb"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      a.join(b, Seq("bi", "bb"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
        .filter(col("hamming") <= 3)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(min(col("hamming")).as("hamming"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) > 0),
h AS (SELECT doc_id, list_transform(toks, t -> ${hD("t")}) AS th FROM t),
sh AS (SELECT doc_id, ${simhashTerms(j =>
      s"list_sum(list_transform(th, h -> CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END))")} AS sh FROM h),
banded AS (SELECT doc_id, sh, bi, (sh // (1::BIGINT << (bi * 8))) % 256 AS bb
           FROM sh, (SELECT unnest(range(4)) AS bi)),
small AS (SELECT bi, bb FROM banded GROUP BY bi, bb HAVING count(*) BETWEEN 2 AND $lshBucketCap),
inb AS (SELECT banded.* FROM banded JOIN small USING (bi, bb)),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, bit_count(xor(a.sh, b.sh)) AS hamming
      FROM inb a JOIN inb b ON a.bi = b.bi AND a.bb = b.bb AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, min(hamming) AS hamming FROM p WHERE hamming <= 3 GROUP BY 1, 2"""),
    "SimHash near-dup pairs (hamming <= 3) via pigeonhole byte bands.")

  // Capstone: full corpus curation — the end-to-end filter a training-data
  // pipeline runs, composed from the operators above in ONE query:
  //   1. quality gate  (stopword/length/diversity score >= 0.62)
  //   2. exact dedup   (keep min doc_id per content digest)
  //   3. near-dup dedup over the SURVIVORS of 1-2 (keep only each LSH
  //      cluster's min-id representative)
  // Stage order is the scale-critical design point: near-dup clustering
  // runs AFTER exact dedup, so a duplicate-heavy corpus (the common case)
  // never feeds its copies into the quadratic in-bucket pair expansion —
  // on a 16x-replicated corpus the survivors-first composition removed a
  // 256x pair blow-up measured in the full-corpus variant. At 100 TB each
  // stage keeps its standalone plan shape: map-side scoring, one digest
  // shuffle, LSH band shuffles + the small label-propagation loop, final
  // broadcast anti-join against the (tiny) loser set.
  private val dCurate = GQuery(
    "d_curate_corpus",
    (s, dir) => {
      val quality = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("cast(size(toks) AS double)"))
        .withColumn("score", expr(
          "round(0.4 * (1.0 - size(filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (size(array_distinct(toks)) / n) + 1e-9, 4)"))
        .filter(col("score") >= 0.62)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      val exactKeepers = quality
        .withColumn("fp", expr("md5(lower(trim(text)))"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
        .select(col("keeper").as("doc_id"))
      // The survivor set feeds BOTH the LSH pair stage and the final
      // anti-join, and Catalyst does not share subtrees across joins —
      // uncheckpointed, the corpus scan + quality score + exact-dedup
      // join run twice. Eager localCheckpoint materializes it once; at
      // 100 TB that stores the (deduped, quality-gated) survivor text
      // once in exchange for dropping a second full-corpus scan.
      val survivors = quality.join(exactKeepers, Seq("doc_id"), "left_semi")
        .transform(graft.Checkpoints.pin(_, eager = true))
      // near-dup representatives among the survivors: drop any doc whose
      // component label is a smaller doc_id
      val nearDupLosers = minLabelComponents(
        lshPairsFrom(survivors.select(col("doc_id"), col("text")))
          .filter(col("est_sim") >= 0.5)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
        .filter(col("comp") =!= col("doc_id"))
        .select(col("doc_id"))
      survivors
        .join(broadcast(nearDupLosers), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
    },
    Some(s"""WITH RECURSIVE
q AS (SELECT doc_id, lang, n_chars, text FROM (
        SELECT doc_id, lang, n_chars, text,
               round(0.4 * (1.0 - len(list_filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (len(list_distinct(toks)) / n) + 1e-9, 4) AS score
        FROM (SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS toks,
                     len(string_split(text, ' '))::DOUBLE AS n FROM documents))
      WHERE score >= 0.62),
keepers AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
surv AS (SELECT q.doc_id, q.lang, q.n_chars, q.text FROM q JOIN keepers k ON q.doc_id = k.doc_id),
${lshPairsOracleFrom("surv")},
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE est_sim >= 0.5
      UNION SELECT doc_b, doc_a FROM pairs WHERE est_sim >= 0.5),
r(src, dst) AS (SELECT src, dst FROM e
                UNION SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src),
losers AS (SELECT src AS doc_id FROM r GROUP BY src HAVING least(src, min(dst)) <> src)
SELECT surv.doc_id, surv.lang, surv.n_chars
FROM surv
WHERE surv.doc_id NOT IN (SELECT doc_id FROM losers)"""),
    "End-to-end corpus curation: quality gate + exact dedup + near-dup representative selection over survivors.")

  // Corpus token frequency: explode + count — the vocabulary-statistics
  // pass of a training pipeline. Top-20 with deterministic tiebreak. At
  // 100 TB: partial aggregation absorbs the explosion map-side; the
  // shuffle carries only (token, partial_count) pairs.
  private val tTokenFreq = GQuery(
    "t_token_freq",
    (s, dir) =>
      docs(s, dir)
        .select(explode(expr("split(text, ' ')")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20),
    Some("""SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token LIMIT 20"""),
    "Top-20 corpus vocabulary with counts.")

  // Zipf-slope fit over the token frequency head: OLS of ln(freq) on
  // ln(rank) for the top-100 tokens — the corpus-health statistic whose
  // departure from ~-1 flags templated/bot text or tokenizer mismatch.
  // Cross-engine float discipline: each ln is scaled to an exact 1e-6
  // integer (sub-ulp engine differences vanish in the round), the OLS
  // moments accumulate as exact integer sums (order-independent), and
  // only the final slope/intercept divisions return to doubles, pinned
  // at 6 dp. Scale: the heavy stage is the token count (explode +
  // map-side partial agg, same shuffle as t_token_freq); the fit itself
  // runs on 100 rows, and the global rank window sits AFTER the top-100
  // limit — a 100-row frame, not a corpus sort.
  private val tZipfFit = GQuery(
    "t_zipf_fit",
    (s, dir) => {
      val top = docs(s, dir)
        .select(explode(expr("split(text, ' ')")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(100)
      top
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cnt").desc, col("token"))))
        .selectExpr(
          "CAST(round(ln(rnk) * 1000000e0, 0) AS BIGINT) AS lx",
          "CAST(round(ln(cnt) * 1000000e0, 0) AS BIGINT) AS ly")
        .agg(
          count(lit(1)).as("n"), sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
          sum(col("lx") * col("lx")).as("sxx"), sum(col("lx") * col("ly")).as("sxy"))
        .selectExpr(
          "n AS n_tokens",
          "round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) + 1e-9, 6) AS slope",
          "round((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / (n * 1000000e0) + 1e-9, 6) AS intercept")
    },
    Some("""WITH top AS (
  SELECT token, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token ORDER BY cnt DESC, token LIMIT 100),
l AS (SELECT CAST(round(ln(row_number() OVER (ORDER BY cnt DESC, token)) * 1000000e0, 0) AS BIGINT) AS lx,
             CAST(round(ln(cnt) * 1000000e0, 0) AS BIGINT) AS ly
      FROM top),
m AS (SELECT count(*)::BIGINT AS n, CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
             CAST(sum(lx * lx) AS BIGINT) AS sxx, CAST(sum(lx * ly) AS BIGINT) AS sxy
      FROM l)
SELECT n AS n_tokens,
       round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) + 1e-9, 6) AS slope,
       round((CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / (n * 1000000e0) + 1e-9, 6) AS intercept
FROM m"""),
    "Zipf slope/intercept OLS over the top-100 token frequencies (integer-exact moments).")

  // Deterministic 10% hash sample — reproducible train/eval splits. Pure
  // map (no shuffle, no sort, no RNG): the same doc lands in the same split
  // on every run at any scale, and the filter runs inside the scan.
  private val dHashSample = GQuery(
    "d_hash_sample",
    (s, dir) =>
      docs(s, dir)
        .filter(expr(s"${hS("cast(doc_id AS string)")} % 10 = 0"))
        .select(col("doc_id"), col("lang"), col("n_chars")),
    Some(s"""SELECT doc_id, lang, n_chars FROM documents
WHERE ${hD("CAST(doc_id AS VARCHAR)")} % 10 = 0"""),
    "Deterministic 10% hash split of the corpus (map-only).")

  // Stratified sample: ceil(20%) per language, chosen by hash rank so the
  // pick is deterministic and uniform within each stratum. Integer-only
  // quota arithmetic ((n+4) div 5) — no FP ceil boundary to straddle.
  // At 100 TB: one shuffle on lang (low cardinality → AQE coalesces);
  // rank + count ride the same window sort.
  private val dStratified = GQuery(
    "d_stratified_sample",
    (s, dir) => {
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      docs(s, dir)
        .withColumn("hk", expr(hS("cast(doc_id AS string)")))
        .withColumn("rn", row_number().over(byLang.orderBy(col("hk"), col("doc_id"))))
        .withColumn("n_lang", count(lit(1)).over(byLang))
        .filter(expr("rn <= (n_lang + 4) div 5"))
        .select(col("doc_id"), col("lang"))
    },
    Some(s"""WITH h AS (SELECT doc_id, lang, ${hD("CAST(doc_id AS VARCHAR)")} AS hk FROM documents),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM h)
SELECT doc_id, lang FROM r WHERE rn <= (n_lang + 4) // 5"""),
    "Stratified 20% sample per language via deterministic hash rank.")

  // BPE-ish regex tokenization: letter runs / digit runs / punctuation
  // clusters — the pre-tokenizer split a BPE pipeline applies before
  // merges. Pattern uses only literal character classes so the Java and
  // RE2 dialects agree. Pure map.
  private val tRegexTokens = GQuery(
    "t_regex_tokens",
    (s, dir) =>
      docs(s, dir).selectExpr(
        "doc_id",
        "size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+', 0)) AS n_bpe_tokens",
        "size(array_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+', 0))) AS n_distinct"),
    Some("""SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+'))) AS n_distinct
FROM documents"""),
    "BPE-style pre-tokenizer counts (letter/digit/punct runs).")

  // Within-document repetition ratios — the Gopher-style quality rule
  // "fraction of duplicated n-grams" that catches boilerplate and
  // degenerate generations. Pure map: both ratios come from one pass over
  // the token array inside the scan projection, no shuffle at any scale.
  private val tRepetition = GQuery(
    "t_repetition",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) >= 3"))
        .withColumn("bg", expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .withColumn("tg", expr(
          "transform(sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"))
        .selectExpr(
          "doc_id",
          "round(1.0 - size(array_distinct(bg)) / cast(size(bg) AS double) + 1e-9, 4) AS bigram_dup_ratio",
          "round(1.0 - size(array_distinct(tg)) / cast(size(tg) AS double) + 1e-9, 4) AS trigram_dup_ratio"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
g AS (SELECT doc_id,
        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS bg,
        list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tg
      FROM t)
SELECT doc_id,
       round(1.0 - len(list_distinct(bg)) / len(bg)::DOUBLE + 1e-9, 4) AS bigram_dup_ratio,
       round(1.0 - len(list_distinct(tg)) / len(tg)::DOUBLE + 1e-9, 4) AS trigram_dup_ratio
FROM g"""),
    "Duplicate bigram/trigram ratios per document (repetition quality rule).")

  // Corpus-LM quality score: train a bigram model ON the corpus (counts),
  // score each document by its average conditional bigram probability
  // P(w2|w1) = C(w1,w2)/C(w1) — the cheap statistical stand-in for
  // perplexity-based quality filtering. Two aggregations over the exploded
  // bigram stream build the "model"; the score join is keyed on (w1, w2)
  // then w1. At 100 TB: partial aggregation absorbs the explosion
  // map-side; the model tables are Zipf-distributed, so the hot-key join
  // side is the model (small, broadcastable after aggregation), never the
  // corpus; AQE's skew split covers the head words on the pair join.
  /** Per-doc bigram-LM score (doc_id, lm_score, n_bigrams) over any
    * (doc_id, text) frame — shared by t_lm_score (emits it),
    * d_perplexity_band (filters on it), and the streaming band
    * calibration (StreamingPipelines.perplexityBandCalibrate). */
  private[graft] def lmScoresFrom(docs0: DataFrame): DataFrame = {
    val bg = docs0
      .withColumn("toks", expr("split(text, ' ')"))
      .filter(expr("size(toks) >= 2"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // c1 derives from c2 (C(w1) = Σ_w2 C(w1,w2), exact integer sums) —
    // the third full evaluation of the exploded bigram stream and its
    // w1 shuffle collapse to a tiny rollup of the already-aggregated
    // pair table (round-19, guide §2.4)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(
        round(avg(col("c2") / col("c1")) + lit(1e-9), 4).as("lm_score"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Matching DuckDB CTE chain ending in `lm(doc_id, lm_score, n_bigrams)`. */
  private val lmScoreDuck =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
p AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             i -> {'w1': toks[i], 'w2': toks[i + 1]}), recursive := true) FROM t),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1),
lm AS (SELECT doc_id, round(avg(c2.c2 / c1.c1::DOUBLE) + 1e-9, 4) AS lm_score,
              count(*) AS n_bigrams
       FROM p JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
       GROUP BY doc_id)"""

  /** The per-doc bigram-LM scores, computed ONCE per (session, dir,
    * corpus-fingerprint) and pinned — t_lm_score emits the frame and
    * d_perplexity_band filters on it; each previously rebuilt the full
    * bigram model (explode + two model shuffles) from the scan. The
    * one-row-per-document pin is the same size d_perplexity_band
    * already pinned privately. */
  private def lmScoresCached(s: SparkSession, dir: String): DataFrame =
    graft.CorpusCache.memo(s, dir, "lm_scores")(docsTextFp(s, dir))(
      graft.Checkpoints.pin(lmScoresFrom(docs(s, dir))))

  private val tLmScore = GQuery(
    "t_lm_score",
    (s, dir) => lmScoresCached(s, dir),
    Some(s"""WITH $lmScoreDuck
SELECT doc_id, lm_score, n_bigrams FROM lm"""),
    "Corpus-trained bigram-LM quality score (avg conditional probability per doc).")

  // DSIR-style importance scoring (round 14; Xie et al. 2023, "Data
  // Selection for Language Models via Importance Resampling") — the
  // modern pretraining-mix selector: score every document by how much
  // its hashed n-gram distribution looks like a TARGET corpus vs the
  // SOURCE at large, then resample by the importance weights. This is
  // the scoring stage, end to end in-engine:
  //   features  = word unigrams + bigrams hashed into B=1024 buckets
  //               (the md5 recipe every hash op here shares);
  //   target    = the d_hash_sample 10% split (hash(doc_id) % 10 = 0) —
  //               a stand-in for "quality/eval-like" docs, chosen by
  //               the same deterministic predicate both engines share;
  //   weight    = per-bucket log ratio of add-1-smoothed unigram-bucket
  //               probabilities, lam_b = ln(t_b+1) - ln(T+B)
  //               - ln(s_b+1) + ln(S+B);
  //   score     = sum of lam over the doc's gram OCCURRENCES (the log
  //               of the DSIR product weight).
  // Determinism: ln() is pinned into the 1e-6 integer domain the moment
  // it is computed (the t_zipf_fit pattern) — lam_b is a BIGINT of
  // micro-nats, per-doc sums are exact integer arithmetic, and the only
  // emitted float is one IEEE division rounded at 6dp. Scale shape: the
  // model is ONE groupBy over the exploded gram stream (map-side
  // partial agg absorbs the explosion) with its two totals as window
  // sums over the <=1024-row model frame — no driver collect (the a14
  // lesson); scoring joins the corpus stream against the BROADCAST
  // <=1024-row model. Nothing pairwise, nothing corpus-proportional on
  // the build side.
  /** The exploded (doc_id, is_target, bucket) gram-occurrence stream.
    * Feature space = word unigrams + SPACE-joined bigrams hashed into
    * 1024 buckets; the buckets come from the codegen'd
    * [[GraftFunctions.dsirBuckets]] kernel (hash32 of the gram bytes —
    * identical to the oracle's `('0x'||substr(md5(g),1,8))::BIGINT %
    * 1024` without building gram strings; the SQL-HOF formulation ran
    * interpreted at ~6 us/gram). */
  private def dsirOcc(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("toks", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .withColumn("is_target", expr(s"${hS("cast(doc_id AS string)")} % 10 = 0"))
      .select(col("doc_id"), col("is_target"),
        explode(GraftFunctions.dsirBuckets(col("toks"))).as("b"))

  /** The (bucket, lam, tt, ss) model frame over observed buckets —
    * micro-nat log-ratios plus the two corpus totals (needed by the
    * streaming calibrate to fill UNSEEN buckets with the tb=sb=0
    * default; the batch query prunes them). */
  private def dsirModelFrom(occ: DataFrame): DataFrame = {
    val allW = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    occ.groupBy(col("b")).agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tb"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("sb"))
      .withColumn("tt", sum(col("tb")).over(allW))
      .withColumn("ss", sum(col("sb")).over(allW))
      .withColumn("lam", expr(
        "CAST(round((ln(tb + 1) - ln(tt + 1024) - ln(sb + 1) + ln(ss + 1024)) * 1000000e0, 0) AS BIGINT)"))
  }

  /** Complete 1024-entry DSIR model as an array, None on an empty
    * corpus: observed buckets carry their trained lam, unseen buckets
    * the tb=sb=0 default ln((S+B)/(T+B)) — so a NEW document hitting a
    * bucket the calibration corpus never produced still scores, exactly
    * as the batch formula would score it. Bounded collect (<=1024
    * rows), the ivfCellsCalibrate discipline. */
  private[graft] def dsirModelArray(s: SparkSession, dir: String): Option[Array[Long]] = {
    val rows = dsirModelFrom(dsirOcc(s, dir))
      .select(col("b"), col("lam"), col("tt"), col("ss")).collect()
    if (rows.isEmpty) None
    else {
      val tt = rows.head.getLong(2); val ss = rows.head.getLong(3)
      // Same rounding rule as the trained lams' SQL round() — HALF_UP in
      // java.math terms is "ties away from zero", which is what both
      // engines' round(x, 0) implements; Scala math.round is half-up
      // toward +inf and would differ by 1 on a negative exact-half
      // micro-nat default (ADVICE r14).
      val default = BigDecimal(
          (math.log(ss + 1024d) - math.log(tt + 1024d)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val arr = Array.fill(1024)(default)
      // b is the kernel's IntegerType bucket
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      Some(arr)
    }
  }

  /** Complete model for the streaming calibrate — loud on empty. */
  private[graft] def dsirModelComplete(s: SparkSession, dir: String): Array[Long] =
    dsirModelArray(s, dir).getOrElse(
      throw new IllegalArgumentException("dsir calibrate: empty corpus"))

  /** The APPLY stage, shared verbatim by the batch query and the
    * streaming dual ([[graft.streaming.StreamingPipelines.dsirScore]]):
    * the complete 1024-entry model rides into codegen as a referenced
    * long[] and each doc's score is ONE static-call fold over its
    * tokens ([[GraftFunctions.dsirFoldMicro]]) — no explode, no
    * shuffle, no join on the scoring pass (the model side already paid
    * its one exploded-bucket aggregation). Every column the input
    * carries besides the computed four is dropped; callers select. */
  private[graft] def dsirApply(docsFrame: DataFrame, lam: Array[Long]): DataFrame = {
    require(lam.length == 1024,
      s"dsir apply: model must cover all 1024 buckets, got ${lam.length}")
    docsFrame
      .withColumn("toks", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .filter(expr("size(toks) > 0"))
      // gram count = unigrams + bigrams, straight off the token count
      .withColumn("n_grams", expr(
        "CAST(IF(size(toks) >= 2, 2 * size(toks) - 1, size(toks)) AS BIGINT)"))
      .withColumn("dsir_micro", GraftFunctions.dsirFoldMicro(col("toks"), lam.toSeq))
      // + 0e0 normalizes IEEE negative zero: a score in (-5e-7, 0)
      // rounds to -0.0 in DuckDB but 0.0 in Spark (sf0.1 doc 1156
      // caught it) — adding positive zero maps -0.0 -> 0.0 identically
      // on both engines and is a no-op on every other value
      .withColumn("dsir_avg",
        expr("round(dsir_micro / n_grams / 1000000e0 + 1e-9, 6) + 0e0"))
      .select(col("doc_id"), col("n_grams"), col("dsir_micro"), col("dsir_avg"))
  }

  private val tDsirScore = GQuery(
    "t_dsir_score",
    (s, dir) =>
      // calibrate (one exploded-gram aggregation, bounded 1024-row model
      // collect) + apply (one fold pass over the corpus). Round-14 note:
      // the first formulation scored via a second explode + broadcast
      // join + per-doc shuffle agg, re-deriving the gram stream — 10 s
      // at sf0.1; the fold apply reads the corpus once more and shuffles
      // nothing. In batch every scored gram's bucket is observed (every
      // doc is target or source), so the complete model's defaults never
      // fire and the join formulation's values are reproduced exactly —
      // which is what the unchanged join-formulated oracle hash-checks.
      dsirModelArray(s, dir) match {
        case Some(lam) => dsirApply(docs(s, dir), lam)
        case None => docs(s, dir).limit(0).selectExpr("doc_id",
          "CAST(0 AS bigint) AS n_grams", "CAST(0 AS bigint) AS dsir_micro",
          "CAST(0.0 AS double) AS dsir_avg")
      },
    Some(s"""WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS toks,
         ${hD("CAST(doc_id AS VARCHAR)")} % 10 = 0 AS is_target
  FROM documents),
g AS (SELECT doc_id, is_target,
        unnest(list_concat(toks,
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS g
      FROM t),
o AS (SELECT doc_id, is_target, ${hD("g")} % 1024 AS b FROM g),
m AS (SELECT b, CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tb,
             CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS sb
      FROM o GROUP BY 1),
m2 AS (SELECT b, CAST(round((ln(tb + 1) - ln((SELECT CAST(sum(tb) AS BIGINT) FROM m) + 1024)
                            - ln(sb + 1) + ln((SELECT CAST(sum(sb) AS BIGINT) FROM m) + 1024)) * 1000000e0, 0) AS BIGINT) AS lam
       FROM m)
SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(m2.lam) AS BIGINT) AS dsir_micro,
       round(CAST(sum(m2.lam) AS BIGINT) / CAST(count(*) AS BIGINT) / 1000000e0 + 1e-9, 6) + 0e0 AS dsir_avg
FROM o JOIN m2 USING (b) GROUP BY 1"""),
    "DSIR importance score per document: hashed unigram+bigram buckets, add-1-smoothed target/source log-ratio in exact micro-nats.")

  /** Per-source distribution divergence (round 15) — the data-MIXTURE
    * diagnostic: KL(source ‖ corpus) over the DSIR hashed-gram feature
    * space (unigram+bigram buckets mod 1024, the one bucket definition —
    * [[GraftFunctions.dsirBuckets]]), add-1 smoothed on both sides so
    * every source is scored over the FULL 1024-bucket domain (a bucket
    * the source never produced still contributes its smoothed mass).
    * This is what mixture design reads before setting source weights:
    * a near-zero KL source is interchangeable with the corpus average,
    * a high-KL source is the distinct voice temperature-mixing exists
    * to protect (d_temperature_mix sets the weights; THIS says which
    * sources are actually different).
    *
    * Determinism: counts are exact integers; each bucket's term rounds
    * to integer MICRO-nats before the sum (the t_dsir_score discipline —
    * ln of integer arguments agreed cross-engine at 1e6 rounding across
    * every replica), so kl_micro is an exact BIGINT on both engines;
    * the final kl derives from it. Per-term rounding can leave a
    * degenerate source's sum epsilon-negative → the +0e0 negative-zero
    * pin on the derived column.
    *
    * Scale shape: ONE exploded-gram shuffle into the (source, bucket)
    * partial agg; everything after is model-sized (#sources x 1024
    * rows) — the corpus-total scalar broadcasts, the full-domain frame
    * is a tiny cross join. At 100 TB the gram agg is the only stage
    * that sees the corpus. */
  /** The one gram-bucket stream definition shared by the batch
    * t_source_kl, its calibrate, and the streaming dual: tokens → DSIR
    * hashed buckets, one row per gram occurrence, every other input
    * column carried (the dual needs ts for its window). */
  private[graft] def sourceKlBuckets(docsFrame: DataFrame): DataFrame =
    docsFrame
      .withColumn("toks", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .filter(expr("size(toks) > 0"))
      .withColumn("b", explode(GraftFunctions.dsirBuckets(col("toks"))))
      .drop("toks")

  /** Source-KL reference model — the calibrate half of the streaming
    * calibrate/apply split (dsir/abtt convention): the reference
    * corpus' exact bucket counts over the full 1024 domain + total.
    * Bounded collect (≤1024 rows). None on an empty corpus. */
  final case class SourceKlModel(nb: Seq[Long], nn: Long)

  private[graft] def sourceKlCalibrate(s: SparkSession, dir: String): Option[SourceKlModel] = {
    val rows = sourceKlBuckets(docs(s, dir))
      .groupBy(col("b")).agg(count(lit(1)).as("nb")).collect()
    if (rows.isEmpty) None
    else {
      val arr = Array.fill(1024)(0L)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      Some(SourceKlModel(arr.toSeq, arr.sum))
    }
  }

  /** The APPLY half, shared by the streaming dual
    * ([[graft.streaming.StreamingPipelines.sourceKl]], grouping on
    * (window, source)) and its spec's batch replay: ONE stateful
    * aggregation ([[GraftFunctions.sourceKl]] — the group's exact
    * 1024-bucket histogram, constant 8 KiB state, merged map-side),
    * then the batch query's own derived-kl projection. The chained
    * count-then-sum shape the batch query uses is illegal in a
    * streaming query (two stateful aggregations); this is the same
    * term sum in one stage. */
  private[graft] def sourceKlApply(bucketed: DataFrame, model: SourceKlModel,
      groupCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    bucketed
      .groupBy(groupCols: _*)
      .agg(GraftFunctions.sourceKl(col("b"), model.nb, model.nn).as("klb"))
      .withColumn("n_grams", col("klb.n_grams"))
      .withColumn("kl_micro", col("klb.kl_micro"))
      .withColumn("kl", expr("round(kl_micro / 1000000e0 + 1e-9, 6) + 0e0"))
      .drop("klb")

  private val tSourceKl = GQuery(
    "t_source_kl",
    (s, dir) => {
      val occ = sourceKlBuckets(docs(s, dir)).select(col("source"), col("b"))
      val perSrc = occ.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("nsb"))
        .transform(graft.Checkpoints.pin(_))
      val srcTot = perSrc.groupBy(col("source")).agg(sum(col("nsb")).as("ns"))
      val corpusB = perSrc.groupBy(col("b")).agg(sum(col("nsb")).as("nb"))
      val corpusTot = perSrc.agg(sum(col("nsb")).as("nn"))
      val domain = srcTot.crossJoin(
        s.range(1024).select(col("id").cast("int").as("b")))
      domain
        .join(perSrc, Seq("source", "b"), "left")
        .join(corpusB, Seq("b"), "left")
        .crossJoin(broadcast(corpusTot))
        .withColumn("tm", expr(
          "CAST(round((CAST(coalesce(nsb, 0) + 1 AS DOUBLE) / (ns + 1024)) * " +
            "(ln(coalesce(nsb, 0) + 1) - ln(ns + 1024) - " +
            "ln(coalesce(nb, 0) + 1) + ln(nn + 1024)) * 1000000e0, 0) AS BIGINT)"))
        .groupBy(col("source"), col("ns").as("n_grams"))
        .agg(sum(col("tm")).as("kl_micro"))
        .withColumn("kl",
          expr("round(kl_micro / 1000000e0 + 1e-9, 6) + 0e0"))
        .select(col("source"), col("n_grams"), col("kl_micro"), col("kl"))
    },
    Some(s"""WITH t AS (
  SELECT source, list_filter(string_split(text, ' '), w -> length(w) > 0) AS toks
  FROM documents),
g AS (SELECT source,
        unnest(list_concat(toks,
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS g
      FROM t WHERE len(toks) > 0),
o AS (SELECT source, ${hD("g")} % 1024 AS b FROM g),
sb AS (SELECT source, b, CAST(count(*) AS BIGINT) AS nsb FROM o GROUP BY 1, 2),
st AS (SELECT source, CAST(sum(nsb) AS BIGINT) AS ns FROM sb GROUP BY 1),
cbk AS (SELECT b, CAST(sum(nsb) AS BIGINT) AS nb FROM sb GROUP BY 1),
ct AS (SELECT CAST(sum(nsb) AS BIGINT) AS nn FROM sb),
dom AS (SELECT st.source, st.ns, CAST(r.b AS INT) AS b FROM st, range(1024) r(b)),
term AS (SELECT d.source, d.ns,
    CAST(round((CAST(coalesce(s2.nsb, 0) + 1 AS DOUBLE) / (d.ns + 1024)) *
      (ln(coalesce(s2.nsb, 0) + 1) - ln(d.ns + 1024) -
       ln(coalesce(cbk.nb, 0) + 1) + ln(ct.nn + 1024)) * 1000000e0, 0) AS BIGINT) AS tm
  FROM dom d
  LEFT JOIN sb s2 ON d.source = s2.source AND d.b = s2.b
  LEFT JOIN cbk ON cbk.b = d.b, ct)
SELECT source, ns AS n_grams, CAST(sum(tm) AS BIGINT) AS kl_micro,
       round(CAST(sum(tm) AS BIGINT) / 1000000e0 + 1e-9, 6) + 0e0 AS kl
FROM term GROUP BY 1, 2"""),
    "Per-source KL divergence vs the corpus over hashed-gram buckets, add-1 smoothed, exact micro-nats — the data-mixture diagnostic.")

  // CCNet-style perplexity BAND filter: keep the middle half of the
  // LM-score distribution — dropping both the degenerate tail (too
  // unpredictable = garbage) and the over-predictable head (templated/
  // repetitive text the model finds too easy). The band edges are exact
  // quantiles of the 4 dp score domain selected from a <=10001-row
  // cumulative histogram (the d_quality_prune machinery) — integer
  // cumulative counts, integer cutoff compares (cum*4 >= N), no
  // percentile aggregate and no corpus sort at any scale; the cuts
  // broadcast back into the scan-side filter.
  private val dPerplexityBand = GQuery(
    "d_perplexity_band",
    (s, dir) => {
      // the scored frame feeds the histogram, the total count AND the
      // final filter — it comes from the SHARED pinned lm-score cache
      // (one row per document; `si` is a cheap map over the pin), so
      // the bigram-LM build runs once per session, not once per
      // consumer per invocation
      val scored = lmScoresCached(s, dir)
        .withColumn("si", expr("CAST(round(lm_score * 10000, 0) AS BIGINT)"))
      val hist = scored.groupBy(col("si")).agg(count(lit(1)).as("n"))
      val wcum = Window.orderBy(col("si"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nTot = scored.agg(count(lit(1)).as("nn"))
      val cuts = hist.withColumn("cum", sum(col("n")).over(wcum))
        .crossJoin(broadcast(nTot))
        .agg(
          min(when(col("cum") * 4 >= col("nn"), col("si"))).as("lo"),
          min(when(col("cum") * 4 >= col("nn") * 3, col("si"))).as("hi"))
      scored.crossJoin(broadcast(cuts))
        .filter(col("si") >= col("lo") && col("si") <= col("hi"))
        .select(col("doc_id"), col("lm_score"))
    },
    Some(s"""WITH $lmScoreDuck,
s AS (SELECT doc_id, lm_score, CAST(round(lm_score * 10000, 0) AS BIGINT) AS si FROM lm),
h AS (SELECT si, count(*) AS n FROM s GROUP BY si),
c AS (SELECT si, sum(n) OVER (ORDER BY si) AS cum FROM h),
t2 AS (SELECT count(*) AS nn FROM s),
cuts AS (SELECT min(CASE WHEN cum * 4 >= nn THEN si END) AS lo,
                min(CASE WHEN cum * 4 >= nn * 3 THEN si END) AS hi
         FROM c, t2)
SELECT doc_id, lm_score FROM s, cuts WHERE si BETWEEN lo AND hi"""),
    "Perplexity-band filter: keep the middle half of the LM-score distribution (exact histogram quantiles).")

  // TF-IDF top term per document — the classic keyword extractor. Score =
  // c * ln(N / df) from pure integer inputs, so both engines compute the
  // identical double; exact score ties (same c, same df) break on the
  // term string. At 100 TB: the token explode collapses into (doc, term)
  // partial aggregation map-side; df is a term-keyed agg whose Zipf head
  // is absorbed the same way; the tf x df join is term-keyed with AQE
  // skew split covering stopword-class terms, and the final argmax is a
  // per-doc window over a handful of rows. The argmax ranks on the score
  // ROUNDED to 6 decimals (+1e-9): ln() is not bit-reproducible across
  // engines (Java Math.log tolerates 1 ulp; DuckDB's libm is correctly
  // rounded), so mathematically-tied scores reached via different (c, df)
  // pairs — e.g. 2*ln(10) vs ln(100) — must collapse to EQUAL pinned
  // values and fall to the term tiebreak on both sides.
  private val tTfidf = GQuery(
    "t_tfidf",
    (s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(expr("split(text, ' ')")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n"))
      // per-doc argmax as a min_by hash aggregate on the ordering key
      // (-score, term): identical winner to the historical
      // `row_number OVER (ORDER BY score DESC, term) = 1` (max score,
      // ties to the smallest term; double negation is exact), but with
      // map-side partial aggregation instead of a full doc_id exchange
      // + sort of every (doc, term) score row (round-19, guide §2.3)
      tf.join(df, Seq("term")).crossJoin(broadcast(n))
        .withColumn("score", round(col("c") * log(col("n") / col("df")) + lit(1e-9), 6))
        .groupBy(col("doc_id"))
        .agg(min_by(struct(col("term"), col("score")),
          struct((col("score") * lit(-1d)).as("ns"), col("term"))).as("m"))
        .select(col("doc_id"), col("m.term").as("top_term"),
          round(col("m.score"), 4).as("tfidf"))
    },
    Some("""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
c AS (SELECT doc_id, term, count(*) AS c FROM tf GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM c GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, term, round(c * ln(n.n / df.df) + 1e-9, 6) AS score FROM c JOIN df USING (term), n),
r AS (SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      FROM s)
SELECT doc_id, term AS top_term, round(score, 4) AS tfidf FROM r WHERE rn = 1"""),
    "TF-IDF argmax term per document (integer-derived scores, exact tiebreak).")

  // Redaction: mask every digit run in the payload and count what was
  // masked — the PII-scrubbing shape of a training-data pipeline (here
  // the pattern is digit runs; in production it is emails/phones/IDs —
  // the mechanics are identical). Pure map inside the scan projection:
  // codegen'd regex, no shuffle at any scale; the masked-run count rides
  // along so downstream audits can aggregate redaction volume without
  // re-scanning. The regex sticks to portable character-class syntax
  // ([0-9]+) that Java's engine and DuckDB's RE2 interpret identically.
  private val tRedact = GQuery(
    "t_redact_digits",
    (s, dir) =>
      Tables.t(s, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
          expr("cast(regexp_count(props, '[0-9]+') AS bigint)").as("n_redacted")),
    Some("""SELECT event_id,
       regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
       len(regexp_extract_all(props, '[0-9]+')) AS n_redacted
FROM events"""),
    "Digit-run redaction with masked-run counts (PII-scrubbing mechanics).")

  // ---------------------------------------------------------------------
  // Benchmark decontamination — the train/test contamination check every
  // LLM training pipeline runs before shipping a corpus: flag training
  // documents sharing any 13-token n-gram (the GPT-3/PaLM convention)
  // with a held-out eval set. The eval set here is fixture-derived (a
  // deterministic md5 split of doc_id, ~25%) standing in for a real
  // benchmark corpus; the mechanics are identical.
  //
  // Plan shape (the 100 TB one): 13-gram hashing is a pure map inside
  // the scan (distinct 60-bit md5 hashes per doc, same discipline as
  // d_ngram_jaccard's shingles — 8 bytes per gram, never the text). The
  // eval side is SMALL by construction (benchmarks are MBs, corpora are
  // TBs), so its distinct gram set BROADCASTS and the train side joins
  // map-side — no shuffle of train grams at all; the only wide stage is
  // the per-doc count aggregation, keyed on doc_id. If the eval set ever
  // outgrew broadcast, the same plan degrades gracefully to a shuffle
  // join bucketed on the gram hash — uniform by construction.
  /** Contaminated (train doc, eval doc, gram) triples — the shared core
    * of the train-side flag query and the eval-side report. */
  private def contaminationHits(s: SparkSession, dir: String): DataFrame = {
    val grams = docs(s, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .filter(expr("size(toks) >= 13"))
      .select(col("doc_id"), explode(gram13(col("toks"))).as("g"))
      .withColumn("is_eval", expr(s"${hS("cast(doc_id AS string)")} % 4 = 0"))
    val evalGrams = grams.filter(col("is_eval"))
      .select(col("doc_id").as("eval_doc"), col("g"))
    val trainGrams = grams.filter(!col("is_eval"))
      .select(col("doc_id"), col("g"))
    trainGrams.join(broadcast(evalGrams), Seq("g"))
  }

  /** Matching DuckDB CTE body producing tr(doc_id, g) x e(eval_doc, g). */
  private val contaminationDuck: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 13),
g0 AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 12),
         i -> ('0x'||substr(md5(array_to_string(toks[i+1:i+13], chr(1))),1,15))::BIGINT))) AS g
       FROM t),
e AS (SELECT doc_id AS eval_doc, g FROM g0 WHERE ${hD("CAST(doc_id AS VARCHAR)")} % 4 = 0),
tr AS (SELECT doc_id, g FROM g0 WHERE ${hD("CAST(doc_id AS VARCHAR)")} % 4 <> 0)"""

  private val dDecontaminate = GQuery(
    "d_decontaminate",
    (s, dir) =>
      contaminationHits(s, dir)
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"),
          countDistinct(col("eval_doc")).as("n_eval_docs")),
    Some(s"""WITH $contaminationDuck
SELECT tr.doc_id, count(DISTINCT tr.g) AS n_hits, count(DISTINCT e.eval_doc) AS n_eval_docs
FROM tr JOIN e USING (g) GROUP BY 1"""),
    "13-gram train/eval contamination check (hash-domain, broadcast eval side).")

  // The eval-side report of the same join — what a benchmark owner
  // consumes: per eval document, how many training documents overlap it
  // and how many of its grams leaked. Same plan, aggregation keyed on
  // the (small) eval side.
  private val dContaminationReport = GQuery(
    "d_contamination_report",
    (s, dir) =>
      contaminationHits(s, dir)
        .groupBy(col("eval_doc"))
        .agg(countDistinct(col("doc_id")).as("n_train_docs"),
          countDistinct(col("g")).as("n_leaked_grams")),
    Some(s"""WITH $contaminationDuck
SELECT e.eval_doc, count(DISTINCT tr.doc_id) AS n_train_docs,
       count(DISTINCT tr.g) AS n_leaked_grams
FROM tr JOIN e USING (g) GROUP BY 1"""),
    "Per-eval-document contamination report (train-doc and leaked-gram counts).")

  // ---------------------------------------------------------------------
  // Sequence packing — assign documents to fixed token-budget bins (2048
  // tokens), the step that turns a curated corpus into training
  // sequences. Deterministic first-fit-in-order: docs are ordered by an
  // md5 shuffle key (uniform, so bins mix lengths instead of clustering
  // them), each doc's bin is its EXCLUSIVE token-count prefix sum
  // `div` the budget, and bin_offset is where it starts inside the bin.
  //
  // Scale shape: the global running sum over a shuffle order is the
  // classic single-task trap, so the prefix sum is HIERARCHICAL (the
  // a11/a2b recurrence): the 48-bit shuffle key's top bits form 256
  // buckets MONOTONE in the sort order, local sums partition by bucket,
  // and the 256 bucket totals' prefix broadcasts back as offsets. Every
  // stage is bounded by corpus/256, and deeper nesting extends the same
  // recurrence. All-integer arithmetic on both engines.
  private val dPackSequences = GQuery(
    "d_pack_sequences",
    (s, dir) => {
      val binTok = 2048L
      val t = docs(s, dir).select(col("doc_id"),
        expr("cast(size(split(text, ' ')) AS bigint)").as("n"),
        expr(s"${hS48("cast(doc_id AS string)")}").as("h"))
        .withColumn("hb", expr(s"h div ${1L << 40}"))
      val local = t.withColumn("lc", coalesce(
        sum(col("n")).over(Window.partitionBy(col("hb"))
          .orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // The prefix over BUCKET TOTALS is a <=256-row frame by
      // construction (one row per high-bits bucket) — single-partition
      // on purpose. The pmod(hb, 1) partition key is constant (always 0,
      // semantically a global window) but not foldable, so the engine's
      // "no partition defined" warning can't misread a bounded frame as
      // a scan-scale window (a bare lit(0) gets constant-folded away and
      // the warning returns).
      val off = t.groupBy(col("hb")).agg(sum(col("n")).as("tot"))
        .withColumn("off", coalesce(sum(col("tot")).over(
          Window.partitionBy(pmod(col("hb"), lit(1))).orderBy(col("hb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("hb"), col("off"))
      local.join(broadcast(off), Seq("hb"))
        .withColumn("prev", col("off") + col("lc"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          expr(s"prev div $binTok").as("bin"),
          expr(s"prev % $binTok").as("bin_offset"))
    },
    Some(s"""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
                  ${hD48("CAST(doc_id AS VARCHAR)")} AS h
           FROM documents),
c AS (SELECT doc_id, n,
             COALESCE(sum(n) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t)
SELECT doc_id, n AS n_tokens, CAST(prev // 2048 AS BIGINT) AS bin,
       CAST(prev % 2048 AS BIGINT) AS bin_offset FROM c"""),
    "Deterministic sequence packing into 2048-token bins (hierarchical prefix sum).")

  // ---------------------------------------------------------------------
  // Context-window chunking with overlap — the retrieval/packing prep
  // step that splits every document into fixed-size token windows
  // (32 tokens, stride 24, so consecutive chunks share 8 tokens).
  // Pure in-scan row expansion: sequence() enumerates the start
  // offsets, posexplode emits one row per chunk, and the emitted
  // payload is an 8-byte content fingerprint (never the chunk text) —
  // at 100 TB the output is ~n/stride rows per doc of five fixed-width
  // columns, produced with ZERO shuffles. The fingerprint is the shared
  // md5-derived 48-bit hash of the chr(1)-joined tokens, so the oracle
  // recomputes it bit-for-bit.
  private val dChunkOverlap = GQuery(
    "d_chunk_overlap",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("size(toks)"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(expr("sequence(0, n - 1, 24)")).as(Seq("chunk_idx", "start")))
        .withColumn("chunk", expr("slice(toks, start + 1, 32)"))
        .select(col("doc_id"), col("chunk_idx"), col("start").cast("long").as("start"),
          expr("size(chunk)").as("chunk_len"),
          graft.functions.GraftFunctions.md5Hash48(
            concat_ws("", col("chunk"))).as("chunk_fp")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents WHERE len(string_split(text, ' ')) > 0),
g AS (SELECT doc_id, unnest(range((n + 23) // 24)) AS k, toks, n FROM t),
c AS (SELECT doc_id, k AS chunk_idx, k * 24 AS start,
             toks[k * 24 + 1 : least(k * 24 + 32, n)] AS chunk
      FROM g)
SELECT doc_id, chunk_idx, start, len(chunk) AS chunk_len,
       ('0x' || substr(md5(array_to_string(chunk, chr(1))), 1, 12))::BIGINT AS chunk_fp
FROM c"""),
    "Overlapping 32-token chunks at stride 24, fingerprinted in-scan (zero shuffles).")

  // ---------------------------------------------------------------------
  // Boilerplate segment removal (CCNet-style line dedup, fixed-width
  // form): each doc splits into non-overlapping 16-token segments, a
  // segment is boilerplate when its content hash appears in >= 2
  // DISTINCT documents corpus-wide, and the per-doc report gives the
  // retained token count + boilerplate ratio. Scale shape: segments
  // carry only (doc_id, 8-byte hash, len) into ONE hash-keyed shuffle;
  // the distinct-doc counts join back on that same key (co-partitioned
  // with the aggregation, never broadcast — the count table scales with
  // the corpus), then one doc_id shuffle folds the report. The ratio is
  // a single integer/integer division, exact on both engines.
  private val dBoilerplate = GQuery(
    "d_boilerplate_segments",
    (s, dir) => {
      val seg = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("size(toks)"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("toks"), col("n"),
          posexplode(expr("sequence(0, (n - 1) div 16)")).as(Seq("seg_idx", "k")))
        .withColumn("seg", expr("slice(toks, k * 16 + 1, 16)"))
        .select(col("doc_id"), col("seg_idx"), expr("size(seg)").as("seg_len"),
          graft.functions.GraftFunctions.md5Hash48(
            concat_ws("", col("seg"))).as("sh"))
      // pinned: the segment-hash frame feeds the distinct-doc counts AND
      // the report join — unpinned, the split + md5 segment scan ran
      // twice (round 19; narrow 4-column frame)
      val segP = graft.Checkpoints.pin(seg)
      val counts = segP.groupBy(col("sh"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      segP.join(counts, Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_seg"),
          count(when(col("nd") >= 2, lit(1))).as("n_boiler"),
          coalesce(sum(when(col("nd") < 2, col("seg_len"))), lit(0L)).as("kept_tokens"))
        .withColumn("boiler_ratio", expr("round(n_boiler / cast(n_seg AS double), 4)"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents WHERE len(string_split(text, ' ')) > 0),
g AS (SELECT doc_id, unnest(range((n + 15) // 16)) AS k, toks, n FROM t),
seg AS (SELECT doc_id, k AS seg_idx,
               least(k * 16 + 16, n) - k * 16 AS seg_len,
               ('0x' || substr(md5(array_to_string(toks[k * 16 + 1 : least(k * 16 + 16, n)], chr(1))), 1, 12))::BIGINT AS sh
        FROM g),
c AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1)
SELECT seg.doc_id, count(*) AS n_seg,
       count(*) FILTER (WHERE c.nd >= 2) AS n_boiler,
       CAST(COALESCE(sum(CASE WHEN c.nd < 2 THEN seg.seg_len END), 0) AS BIGINT) AS kept_tokens,
       round(count(*) FILTER (WHERE c.nd >= 2) / count(*)::DOUBLE, 4) AS boiler_ratio
FROM seg JOIN c USING (sh) GROUP BY 1"""),
    "Cross-doc duplicated 16-token segments flagged as boilerplate; per-doc retention report.")

  // ---------------------------------------------------------------------
  // Incremental ingest near-dup — dedup a NEW batch of documents against
  // the EXISTING corpus (the production shape: every ingestion run checks
  // arrivals against the index, never the corpus against itself). The
  // batch is a deterministic md5 quarter of doc_ids standing in for an
  // arrival set. Candidates come from a band equi-join of new-side band
  // keys against existing-side band keys — CROSS-corpus only, so the
  // in-corpus quadratic of a standalone pair listing never happens; the
  // existing side drops degenerate buckets (> lshBucketCap rows share a
  // band key) exactly like the in-corpus listing, since those belong to
  // exact dedup. At 100 TB the arrival batch is the small side: its
  // banded signature broadcasts and the corpus is scanned once; here
  // both sides shuffle on band keys, same plan one AQE decision over.
  private val dIngestNeardup = GQuery(
    "d_ingest_neardup",
    (s, dir) => {
      // pinned: the banded-signature frame feeds the arrival side, the
      // bucket-cap agg AND the existing side — unpinned, the minhash
      // kernel scan ran three times (round 19; the mediaNeardupPairs
      // lesson)
      val sig = graft.Checkpoints.pin(bandedSig(docs(s, dir))
        .withColumn("is_new", expr(s"${hS("cast(doc_id AS string)")} % 4 = 1")))
      val newSide = sig.filter(col("is_new"))
        .select(col("doc_id").as("new_doc"), col("mharr").as("mh_n"),
          col("band_idx"), col("band_key"))
      val oldOk = sig.filter(!col("is_new"))
        .groupBy(col("band_idx"), col("band_key"))
        .agg(count(lit(1)).as("bsz"))
        .filter(col("bsz") <= lshBucketCap)
        .select(col("band_idx"), col("band_key"))
      val oldSide = sig.filter(!col("is_new"))
        .join(oldOk, Seq("band_idx", "band_key"))
        .select(col("doc_id").as("existing_doc"), col("mharr").as("mh_o"),
          col("band_idx"), col("band_key"))
      newSide.join(oldSide, Seq("band_idx", "band_key"))
        .withColumn("est_sim", expr(
          "round(size(filter(zip_with(mh_n, mh_o, (x, y) -> x = y), v -> v)) / cast(16 as double), 4)"))
        .groupBy(col("new_doc"), col("existing_doc"))
        .agg(min(col("est_sim")).as("est_sim"))
        .filter(col("est_sim") >= 0.5)
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE len(string_split(text, ' ')) >= 3),
h AS (SELECT doc_id, $shingleDuck AS hs FROM t),
m AS (SELECT doc_id, ${mhDuckExprs.mkString(", ")} FROM h),
bands AS (${(0 until 4).map(z =>
      s"SELECT doc_id, $z AS band_idx, concat_ws('_', ${(4 * z until 4 * z + 4).map("mh" + _).mkString(", ")}) AS band_key FROM m").mkString("\nUNION ALL\n")}),
flagged AS (SELECT doc_id, band_idx, band_key,
                   ${hD("CAST(doc_id AS VARCHAR)")} % 4 = 1 AS is_new FROM bands),
old_ok AS (SELECT band_idx, band_key FROM flagged WHERE NOT is_new
           GROUP BY 1, 2 HAVING count(*) <= $lshBucketCap),
cand AS (SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS existing_doc
         FROM flagged n
         JOIN flagged o ON n.band_idx = o.band_idx AND n.band_key = o.band_key
         JOIN old_ok k ON k.band_idx = n.band_idx AND k.band_key = n.band_key
         WHERE n.is_new AND NOT o.is_new),
pairs AS (SELECT c.new_doc, c.existing_doc,
       round((${(0 until 16).map(i => s"CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END").mkString(" + ")}) / 16.0::DOUBLE, 4) AS est_sim
FROM cand c JOIN m x ON c.new_doc = x.doc_id JOIN m y ON c.existing_doc = y.doc_id)
SELECT new_doc, existing_doc, est_sim FROM pairs WHERE est_sim >= 0.5"""),
    "Arrival-batch near-dup check against the existing corpus (cross-corpus LSH bands).")

  // ---------------------------------------------------------------------
  // Vocabulary coverage — induce a top-V vocabulary from corpus token
  // frequencies (deterministic count-desc/token-asc rank) and report each
  // document's out-of-vocabulary rate: the analysis that sizes a
  // tokenizer's vocab against a corpus. V=16 here because the synthetic
  // fixture has ~31 distinct tokens (production V=32k against billions of
  // distinct tokens is the same plan). Scale shape: the vocab build is a
  // partial-agg token count + TakeOrdered (tiny); the per-doc pass is one
  // explode + BROADCAST left join + keyed agg — the corpus shuffles only
  // on doc_id for its own aggregation, never on token.
  private val tVocabCoverage = GQuery(
    "t_vocab_coverage",
    (s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(expr("split(text, ' ')")).as("t"))
      val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(16)
        .select(col("t"), lit(1).as("in_v"))
      tok.join(broadcast(vocab), Seq("t"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_ratio",
          expr("round(n_oov / cast(n_tokens AS double) + 1e-9, 4)"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
v AS (SELECT t, 1 AS in_v FROM (SELECT t, count(*) AS c FROM tok GROUP BY 1
                                ORDER BY c DESC, t LIMIT 16)),
a AS (SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(CASE WHEN in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM tok LEFT JOIN v USING (t) GROUP BY 1)
SELECT doc_id, n_tokens, n_oov,
       round(n_oov / n_tokens::DOUBLE + 1e-9, 4) AS oov_ratio FROM a"""),
    "Top-V induced vocabulary + per-document out-of-vocabulary rate.")

  // ---------------------------------------------------------------------
  // BM25 ranked retrieval — Okapi BM25 (k1 = 1.2, b = 0.75) of the corpus
  // against a fixed query-term set, top-20 documents. Cross-engine float
  // discipline: IDF is the only transcendental (ln differs in the last
  // bit between engines) and is pinned to 8 dp; the tf normalization is
  // pure rational arithmetic on integers (bit-exact in IEEE doubles on
  // both engines); each per-term contribution is then scaled to an
  // integer micro-score so the per-doc SUM is exact and order-free — a
  // float sum across terms would round differently per aggregation
  // order. Scale shape: doc length rides the tokenize scan (no dl join),
  // the term filter collapses the explode to query-term rows only, the
  // df/N sides are tiny broadcasts, and the final top-20 is a
  // TakeOrdered — no full sort, one doc_id-keyed shuffle total.
  private val tBm25 = GQuery(
    "t_bm25_rank",
    (s, dir) => {
      val qterms = Seq("hash", "join", "scan", "vector")
      val tok = docs(s, dir)
        .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
        .withColumn("dl", expr("cast(size(toks) AS bigint)"))
      val stats = tok.agg(count(lit(1)).as("n"),
        sum(col("dl")).as("sumdl"))
      // tf feeds BOTH the score expression and the df aggregation;
      // Catalyst does not share the subtree across that join, so an
      // unmaterialized tf re-scans and re-explodes the corpus for the
      // 4-row df side. tf is tiny (<= |qterms| rows per matching doc) —
      // materialize it once.
      val tf = tok
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(qterms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("c"))
        .transform(graft.Checkpoints.pin(_, eager = true))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfq), Seq("term")).crossJoin(broadcast(stats))
        .withColumn("idf", round(
          log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) + lit(1e-9), 8))
        .withColumn("tfnorm", col("c") * lit(2.2) /
          (col("c") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
            (col("sumdl").cast("double") / col("n")))))
        .withColumn("contrib", expr("cast(round(idf * tfnorm * 1000000.0 + 1e-9) AS bigint)"))
        .groupBy(col("doc_id")).agg(sum(col("contrib")).as("sc"))
        .select(col("doc_id"),
          expr("round(cast(sc AS double) / 1000000.0, 4)").as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
t AS (SELECT doc_id, len(toks)::BIGINT AS dl, toks FROM d),
st AS (SELECT count(*)::BIGINT AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM t),
tf AS (SELECT doc_id, dl, term, count(*) AS c
       FROM (SELECT doc_id, dl, unnest(toks) AS term FROM t)
       WHERE term IN ('hash', 'join', 'scan', 'vector') GROUP BY 1, 2, 3),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
co AS (SELECT tf.doc_id,
         CAST(round(
           round(ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1) + 1e-9, 8)
           * (tf.c * 2.2 / (tf.c + 1.2 * (0.25 + 0.75 * tf.dl / (st.sumdl::DOUBLE / st.n))))
           * 1000000.0 + 1e-9) AS BIGINT) AS contrib
       FROM tf JOIN dfq USING (term), st),
agg AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS sc FROM co GROUP BY 1)
SELECT doc_id, round(sc / 1000000.0, 4) AS score
FROM agg ORDER BY score DESC, doc_id LIMIT 20"""),
    "Okapi BM25 top-20 against a fixed query (pinned IDF, exact integer score sum).")

  // ---------------------------------------------------------------------
  // Fixed-size uniform corpus sample — bottom-k by hash priority, the
  // reservoir-sampling equivalent that distributes: every engine
  // (and every RE-RUN) picks the same k documents, because the
  // "random" priority is a hash of the doc id, and a reservoir over a
  // stream of priorities is exactly "keep the k smallest". Contrast
  // d_hash_sample (Bernoulli: fixed RATE, size varies with corpus) —
  // training-set construction usually wants the fixed SIZE. Scale
  // shape: priority is a pure map in the scan and bottom-k is a
  // TakeOrdered (per-partition heaps + driver merge of k*P rows) — no
  // global sort, no shuffle of the corpus. Streaming dual:
  // StatefulProcessors.topKPerKey over negated priorities
  // (ReservoirStreamSpec proves batch/stream equivalence).
  private val dReservoir = GQuery(
    "d_reservoir_sample",
    (s, dir) =>
      docs(s, dir)
        .withColumn("pri", expr(hS48("cast(doc_id AS string)")))
        .orderBy(col("pri"), col("doc_id"))
        .limit(256)
        .select(col("doc_id"), col("lang"), col("n_chars")),
    Some(s"""SELECT doc_id, lang, n_chars FROM documents
ORDER BY ${hD48("CAST(doc_id AS VARCHAR)")}, doc_id LIMIT 256"""),
    "Deterministic fixed-size-256 uniform sample (bottom-k hash priority, TakeOrdered).")

  // ---------------------------------------------------------------------
  // Temperature-weighted domain mixing — the multilingual-corpus
  // sampling policy (share_d proportional to n_d^alpha, alpha = 0.5):
  // raw proportions starve low-resource domains, uniform shares starve
  // high-resource ones; the alpha exponent interpolates. Given a budget
  // of K = 512 documents, each language gets
  // target_d = min(n_d, max(1, floor(K * w_d / sum(w)))) picks, chosen
  // deterministically by hash rank within the language (the same
  // rank-by-hash discipline as d_stratified_sample, so the pick is
  // Epoch planning: the per-source mixing TABLE a training run consumes —
  // available tokens, temperature-weighted (sqrt) target share of a fixed
  // token budget (2x the corpus here), and the resulting repeat factor
  // (epochs > 1 = upsample, < 1 = subsample) — the LLaMA/Pile-style
  // "how many epochs of each source" plan, the planning-side complement
  // of d_temperature_mix's document picking. Float discipline: sqrt
  // weights pinned to exact 1e-6 integers so the weight SUM is
  // order-independent; shares/epochs are then single divisions of
  // identical integers (bit-equal both engines), pinned at 4 dp. Scale:
  // one token-count aggregation (map-side partial absorbs the corpus),
  // a one-row totals broadcast, and an O(sources) output.
  private val dEpochPlan = GQuery(
    "d_epoch_plan",
    (s, dir) => {
      val perSrc = docs(s, dir)
        .select(col("source"), expr("size(split(text, ' '))").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
        .withColumn("wi6",
          expr("CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000e0, 0) AS BIGINT)"))
      val totals = perSrc.agg(sum(col("n_tokens")).as("total"), sum(col("wi6")).as("sw"))
      perSrc.crossJoin(broadcast(totals))
        .select(col("source"), col("n_tokens"),
          expr("CAST(round(2 * total * (CAST(wi6 AS DOUBLE) / CAST(sw AS DOUBLE)), 0) AS BIGINT)").as("target_tokens"),
          expr("round(2 * total * (CAST(wi6 AS DOUBLE) / CAST(sw AS DOUBLE)) / CAST(n_tokens AS DOUBLE) + 1e-9, 4)").as("epochs"))
    },
    Some("""WITH s AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
w AS (SELECT source, n_tokens,
             CAST(round(sqrt(n_tokens::DOUBLE) * 1000000e0, 0) AS BIGINT) AS wi6 FROM s),
t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total, CAST(sum(wi6) AS BIGINT) AS sw FROM w)
SELECT source, n_tokens,
       CAST(round(2 * total * (wi6::DOUBLE / sw::DOUBLE), 0) AS BIGINT) AS target_tokens,
       round(2 * total * (wi6::DOUBLE / sw::DOUBLE) / n_tokens::DOUBLE + 1e-9, 4) AS epochs
FROM w, t"""),
    "Per-source epoch plan: sqrt-temperature target shares of a 2x token budget.")

  // reproducible across engines and runs). Float discipline: sqrt and
  // division are IEEE exact-rounded (bit-equal both engines); the only
  // discontinuity is floor, nudged by 1e-9. Scale shape: the per-lang
  // counts are a tiny agg broadcast back; ranking shuffles the corpus
  // once on lang (same as any per-domain top-k); no global sort.
  private val dTemperatureMix = GQuery(
    "d_temperature_mix",
    (s, dir) => {
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      val counts = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_lang"))
        .withColumn("w", expr("sqrt(cast(n_lang AS double))"))
      val targets = counts
        .crossJoin(broadcast(counts.agg(sum(col("w")).as("sw"))))
        .withColumn("target", expr(
          "least(n_lang, greatest(1L, cast(floor(512.0 * w / sw + 1e-9) AS bigint)))"))
        .select(col("lang"), col("target"))
      docs(s, dir)
        .withColumn("hk", expr(hS("cast(doc_id AS string)")))
        .withColumn("rn", row_number().over(byLang.orderBy(col("hk"), col("doc_id"))))
        .join(broadcast(targets), Seq("lang"))
        .filter(col("rn") <= col("target"))
        .select(col("doc_id"), col("lang"))
    },
    Some(s"""WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
w AS (SELECT lang, n_lang, sqrt(n_lang::DOUBLE) AS w FROM c),
tg AS (SELECT lang, least(n_lang, greatest(1, CAST(floor(512.0 * w / (SELECT sum(w) FROM w) + 1e-9) AS BIGINT))) AS target FROM w),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY ${hD("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
      FROM documents)
SELECT r.doc_id, r.lang FROM r JOIN tg USING (lang) WHERE r.rn <= tg.target"""),
    "Temperature-weighted (alpha=0.5) domain-mix sample: share per language ~ n^0.5, deterministic hash-rank picks.")

  // Per-source duplication triage: how much of each source survives exact
  // dedup — the first report a curation run produces when deciding which
  // sources to keep, re-crawl, or drop. Counts DISTINCT content digests
  // (never the text itself), so the distinct agg shuffles 16-byte md5
  // values: standard two-phase distinct, one shuffle keyed by source.
  // n_docs/n_uniq/n_dups are exact integers; the ratio is the single
  // float op.
  private val dDupStatsBySource = GQuery(
    "d_dup_stats_by_source",
    (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(expr("md5(text)")).as("n_uniq"))
        .select(col("source"), col("n_docs"), col("n_uniq"),
          (col("n_docs") - col("n_uniq")).as("n_dups"),
          round((col("n_docs") - col("n_uniq")) / col("n_docs") + lit(1e-9), 6)
            .as("dup_ratio")),
    Some("""SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_uniq,
       count(*) - count(DISTINCT md5(text)) AS n_dups,
       round((count(*) - count(DISTINCT md5(text))) / count(*) + 1e-9, 6) AS dup_ratio
FROM documents GROUP BY 1"""),
    "Per-source exact-dup rate via content digests — curation triage report.")

  // Deterministic train/val/test split assignment: hash the stable doc_id
  // (not the text, so re-crawled/edited documents keep their split and
  // never leak across the boundary), bucket mod 100, 80/10/10. Pure map —
  // zero shuffles at any scale; the same expression assigns consistently
  // across runs, machines, and engines.
  private val dSplitAssign = GQuery(
    "d_split_assign",
    (s, dir) =>
      docs(s, dir)
        .selectExpr("doc_id", s"${hS("cast(doc_id AS string)")} % 100 AS bucket")
        .selectExpr("doc_id", "bucket",
          "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split"),
    Some(s"""SELECT doc_id, b AS bucket,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, ${hD("doc_id::VARCHAR")} % 100 AS b FROM documents)"""),
    "Hash-bucketed 80/10/10 train/val/test split, stable under re-crawls.")

  // Curation funnel observability: how many documents survive each
  // successive filter stage (length -> language -> min-words -> exact
  // dedup) — the report that tells you WHICH stage is eating your corpus
  // before you debug it. One scan computes all stage flags; the dedup
  // stage is a keeper window over the content digest (never the text);
  // the cumulative counts are one tiny aggregation unpivoted to a row
  // per stage. Counts are exact integers end to end.
  private val dFilterFunnel = GQuery(
    "d_filter_funnel",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val f = docs(s, dir)
        .withColumn("f_len", col("n_chars") >= 100)
        .withColumn("f_lang", col("lang").isin("en", "de", "es", "fr"))
        .withColumn("f_words", expr("size(split(text, ' ')) >= 20"))
        .withColumn("keeper", row_number().over(
          Window.partitionBy(expr("md5(lower(trim(text)))")).orderBy("doc_id")) === 1)
      f.agg(
          count(lit(1)).as("s0"),
          sum(when(col("f_len"), 1L).otherwise(0L)).as("s1"),
          sum(when(col("f_len") && col("f_lang"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("f_len") && col("f_lang") && col("f_words"), 1L).otherwise(0L)).as("s3"),
          sum(when(col("f_len") && col("f_lang") && col("f_words") && col("keeper"), 1L).otherwise(0L)).as("s4"))
        .selectExpr(
          """stack(5,
               0, 'raw', s0,
               1, 'length', s1,
               2, 'language', s2,
               3, 'min_words', s3,
               4, 'exact_dedup', s4) AS (stage, stage_name, n_pass)""")
    },
    Some("""WITH f AS (
  SELECT n_chars >= 100 AS f_len,
         lang IN ('en', 'de', 'es', 'fr') AS f_lang,
         len(string_split(text, ' ')) >= 20 AS f_words,
         row_number() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) = 1 AS keeper
  FROM documents
),
a AS (SELECT count(*) AS s0,
             count(*) FILTER (f_len) AS s1,
             count(*) FILTER (f_len AND f_lang) AS s2,
             count(*) FILTER (f_len AND f_lang AND f_words) AS s3,
             count(*) FILTER (f_len AND f_lang AND f_words AND keeper) AS s4
      FROM f)
SELECT 0 AS stage, 'raw' AS stage_name, s0 AS n_pass FROM a
UNION ALL SELECT 1, 'length', s1 FROM a
UNION ALL SELECT 2, 'language', s2 FROM a
UNION ALL SELECT 3, 'min_words', s3 FROM a
UNION ALL SELECT 4, 'exact_dedup', s4 FROM a"""),
    "Cumulative survivor counts through the standard curation filter chain.")

  // ---------------------------------------------------------------------
  // Cross-split contamination audit: near-duplicate document pairs that
  // straddle the train/val/test boundary of d_split_assign — the leakage
  // report a pipeline runs AFTER splitting (a val/test doc with a
  // near-dup in train inflates eval scores, the same failure class
  // d_decontaminate guards against for external benchmarks). Candidates
  // come from the shared LSH band machinery at est_sim >= 0.5; the
  // split label is recomputed per pair endpoint with the same pure hash
  // as d_split_assign — a scalar expression, NOT a join back to the
  // corpus, so beyond the pair listing itself the only added work is
  // two md5 evaluations per surviving pair. Scale shape: identical to
  // d_minhash_lsh_pairs (banded buckets, capped expansion).
  private def splitCase(c: String) =
    s"CASE WHEN ${hS(s"cast($c AS string)")} % 100 < 80 THEN 'train' " +
      s"WHEN ${hS(s"cast($c AS string)")} % 100 < 90 THEN 'val' ELSE 'test' END"
  private def splitCaseDuck(c: String) =
    s"CASE WHEN ${hD(s"$c::VARCHAR")} % 100 < 80 THEN 'train' " +
      s"WHEN ${hD(s"$c::VARCHAR")} % 100 < 90 THEN 'val' ELSE 'test' END"

  private val dSplitLeakage = GQuery(
    "d_split_leakage",
    (s, dir) =>
      lshPairsDF(s, dir)
        .filter(col("est_sim") >= 0.5)
        .selectExpr("doc_a", "doc_b",
          s"${splitCase("doc_a")} AS split_a",
          s"${splitCase("doc_b")} AS split_b",
          "est_sim")
        .filter(col("split_a") =!= col("split_b")),
    Some(s"""WITH $lshPairsOracle,
x AS (SELECT doc_a, doc_b,
             ${splitCaseDuck("doc_a")} AS split_a,
             ${splitCaseDuck("doc_b")} AS split_b,
             est_sim
      FROM pairs WHERE est_sim >= 0.5)
SELECT doc_a, doc_b, split_a, split_b, est_sim FROM x
WHERE split_a <> split_b"""),
    "Near-dup pairs straddling the train/val/test boundary — post-split leakage audit.")

  // ---------------------------------------------------------------------
  // Token-distribution entropy per document — the information-density
  // quality signal (template/boilerplate/spam text repeats tokens and
  // scores low; diverse prose scores near ln(n)). Two hash-keyed
  // shuffles: (doc, token) term frequencies, then the per-doc fold —
  // both partial-agg friendly at any scale. Determinism: ln() is not
  // bit-reproducible across engines, so each term pins ln at 8 decimals,
  // integer-scales x1e6, and sums EXACT longs per doc (the BM25
  // pattern); the emitted entropy is one division rounded once.
  private val tEntropy = GQuery(
    "t_token_entropy",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) >= 1"))
        .select(col("doc_id"), expr("size(toks)").as("n"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("n"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .withColumn("term", expr(
          "CAST(round(c * round(ln(c / CAST(n AS DOUBLE)), 8) * 1000000e0) AS BIGINT)"))
        .groupBy(col("doc_id"), col("n"))
        .agg(sum(col("term")).as("ti"))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          round(expr("-CAST(ti AS DOUBLE) / (n * 1000000e0)") + lit(1e-9), 4).as("entropy")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 1),
f AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS tok FROM t),
c AS (SELECT doc_id, n, tok, count(*) AS c FROM f GROUP BY 1, 2, 3),
e AS (SELECT doc_id, n,
             CAST(round(c * round(ln(c / CAST(n AS DOUBLE)), 8) * 1000000e0) AS BIGINT) AS term
      FROM c)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       round(-CAST(sum(term) AS DOUBLE) / (n * 1000000e0) + 1e-9, 4) AS entropy
FROM e GROUP BY doc_id, n"""),
    "Per-doc token entropy (exact integer-scaled sums) — information-density quality signal.")

  // ---------------------------------------------------------------------
  // N-gram novelty per source — what fraction of a source's distinct
  // 13-grams appear NOWHERE else in the corpus. The data-mixing
  // diversity signal: a source whose grams are mostly shared adds
  // little new text to a training mix; a high-novelty source is
  // irreplaceable. Reuses the native 13-gram hash kernel (in-scan,
  // per-doc-distinct), so grams live in the same 60-bit hash domain as
  // decontamination. Scale shape: ONE gram-keyed shuffle builds the
  // distinct (source, gram) set; the per-gram source count aggregates
  // on that same key (co-partitioned, no second gram shuffle); the
  // per-source fold is partial-agg friendly (only #sources rows move).
  // Counts are exact integers; the ratio is the single float op.
  private val dNgramNovelty = GQuery(
    "d_ngram_novelty",
    (s, dir) => {
      val sg = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) >= 13"))
        .select(col("source"), explode(gram13(col("toks"))).as("g"))
        .distinct()
      val gs = sg.groupBy(col("g")).agg(count(lit(1)).as("ns"))
      sg.join(gs, Seq("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("ns") === 1, 1L).otherwise(0L)).as("n_exclusive"))
        .withColumn("novelty",
          round(col("n_exclusive") / col("n_grams").cast("double") + lit(1e-9), 6))
    },
    Some("""WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents
           WHERE len(string_split(text, ' ')) >= 13),
g1 AS (SELECT source, unnest(list_distinct(list_transform(range(len(toks) - 12),
         i -> ('0x'||substr(md5(array_to_string(toks[i+1:i+13], chr(1))),1,15))::BIGINT))) AS g
       FROM t),
sg AS (SELECT DISTINCT source, g FROM g1),
gs AS (SELECT g, count(*) AS ns FROM sg GROUP BY 1)
SELECT source, count(*) AS n_grams,
       CAST(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
       round(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS novelty
FROM sg JOIN gs USING (g) GROUP BY 1"""),
    "Fraction of each source's distinct 13-grams found nowhere else — mixing diversity signal.")

  // Percentile-threshold quality pruning: drop the bottom quartile of
  // documents PER LANGUAGE by quality score — the curation step between
  // scoring and dedup in a training-data pipeline. The per-language p25
  // cutoff comes from a HISTOGRAM, not a sort: scores are 4-dp by
  // construction, so CAST(round(qs * 10000)) is an exact integer bucket,
  // the (lang, bucket) histogram is at most 10001 rows per language, and
  // the cumulative-count windows run over THAT — never over documents.
  // The rank inequality cross-multiplies (4 * cum >= n) so no float
  // quantile is ever compared. The kept-count derives from the same
  // histogram — the corpus is scanned exactly once. 100 TB: one partial-
  // agg shuffle on (lang, bucket); everything after is O(langs * 10^4).
  private val dQualityPrune = GQuery(
    "d_quality_prune",
    (s, dir) => {
      val hist = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("cast(size(toks) AS double)"))
        .selectExpr("lang",
          "CAST(round((0.4 * (1.0 - size(filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (size(array_distinct(toks)) / n) + 1e-9) * 10000e0) AS BIGINT) AS qb")
        .groupBy(col("lang"), col("qb"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy("qb")
      val tot = Window.partitionBy("lang")
      hist
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n_total", sum(col("cnt")).over(tot))
        .withColumn("cutoff", min(when(col("cum") * 4 >= col("n_total"), col("qb"))).over(tot))
        .groupBy(col("lang"))
        .agg(max(col("n_total")).as("n_total"),
          max(col("cutoff")).as("cutoff_b"),
          sum(when(col("qb") >= col("cutoff"), col("cnt")).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("n_total"),
          round(col("cutoff_b") / lit(10000.0) + lit(1e-9), 4).as("cutoff_q"),
          col("n_kept"))
    },
    Some("""WITH t AS (SELECT lang, string_split(text, ' ') AS toks,
              len(string_split(text, ' '))::DOUBLE AS n FROM documents),
hist AS (
  SELECT lang,
         CAST(round((0.4 * (1.0 - len(list_filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (len(list_distinct(toks)) / n) + 1e-9) * 10000) AS BIGINT) AS qb,
         count(*) AS cnt
  FROM t GROUP BY 1, 2),
c AS (
  SELECT lang, qb, cnt,
         CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY qb) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n_total
  FROM hist),
cut AS (
  SELECT lang, qb, cnt, n_total,
         min(CASE WHEN cum * 4 >= n_total THEN qb END) OVER (PARTITION BY lang) AS cutoff
  FROM c)
SELECT lang, max(n_total) AS n_total,
       round(max(cutoff) / 10000.0 + 1e-9, 4) AS cutoff_q,
       CAST(sum(CASE WHEN qb >= cutoff THEN cnt ELSE 0 END) AS BIGINT) AS n_kept
FROM cut GROUP BY lang"""),
    "Per-language p25 quality cutoff from an exact score histogram; corpus scanned once.")

  // Gopher-style rule report: the audit-friendly shape of corpus
  // filtering — one boolean per RULE per document (not a blended
  // score), so a curation run can explain exactly why a document was
  // dropped and rule pass-rates can be monitored per source/crawl.
  // Every rule is an ALL-INTEGER cross-multiplied comparison (mean
  // word length in [4.0, 10.0] becomes n_chr*10 between 40*n_tok and
  // 100*n_tok) — no float quotient exists on either engine, so no
  // rounding hazard. Bounds are set to discriminate on this fixture
  // (token count p25≈32, mean word length p50≈4.5, stopword share
  // p50≈6%, type-token ratio p50≈0.46). 100 TB: a pure map inside
  // the scan projection — zero shuffles; this is THE filter that runs
  // inline during ingest, and `keep` is the product of the flags.
  private val tGopherRules = GQuery(
    "t_gopher_rules",
    (s, dir) =>
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .selectExpr(
          "doc_id",
          "cast(size(toks) AS bigint) AS n_tok",
          "cast(length(replace(text, ' ', '')) AS bigint) AS n_chr",
          "cast(size(filter(toks, t -> t IN ('the', 'a'))) AS bigint) AS n_stop",
          "cast(size(array_distinct(toks)) AS bigint) AS n_uniq")
        .selectExpr(
          "doc_id", "n_tok",
          "cast(CASE WHEN n_tok BETWEEN 30 AND 10000 THEN 1 ELSE 0 END AS bigint) AS r_len",
          "cast(CASE WHEN n_chr * 10 BETWEEN 40 * n_tok AND 100 * n_tok THEN 1 ELSE 0 END AS bigint) AS r_wordlen",
          "cast(CASE WHEN n_stop * 100 >= n_tok THEN 1 ELSE 0 END AS bigint) AS r_stop",
          "cast(CASE WHEN n_uniq * 10 >= n_tok * 4 THEN 1 ELSE 0 END AS bigint) AS r_ttr")
        .withColumn("keep",
          col("r_len") * col("r_wordlen") * col("r_stop") * col("r_ttr")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
            len(replace(text, ' ', '')) AS n_chr FROM documents),
f AS (SELECT doc_id,
        len(toks)::BIGINT AS n_tok, n_chr::BIGINT AS n_chr,
        len(list_filter(toks, t -> t IN ('the', 'a')))::BIGINT AS n_stop,
        len(list_distinct(toks))::BIGINT AS n_uniq
      FROM t)
SELECT doc_id, n_tok,
       CAST(CASE WHEN n_tok BETWEEN 30 AND 10000 THEN 1 ELSE 0 END AS BIGINT) AS r_len,
       CAST(CASE WHEN n_chr * 10 BETWEEN 40 * n_tok AND 100 * n_tok THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
       CAST(CASE WHEN n_stop * 100 >= n_tok THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
       CAST(CASE WHEN n_uniq * 10 >= n_tok * 4 THEN 1 ELSE 0 END AS BIGINT) AS r_ttr,
       CAST(CASE WHEN n_tok BETWEEN 30 AND 10000 THEN 1 ELSE 0 END
          * CASE WHEN n_chr * 10 BETWEEN 40 * n_tok AND 100 * n_tok THEN 1 ELSE 0 END
          * CASE WHEN n_stop * 100 >= n_tok THEN 1 ELSE 0 END
          * CASE WHEN n_uniq * 10 >= n_tok * 4 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM f"""),
    "Per-rule Gopher-style filter flags (all-integer bounds); keep = product of rules.")

  // Domain quota: cap any single source's contribution by keeping only
  // its top-q documents by quality — the anti-over-representation step
  // of corpus mixing (one crawl/domain must not dominate the corpus).
  // Ranks on the SAME x10000 integer quality bucket as d_quality_prune
  // (shared-constant discipline: one quality definition in the
  // registry), doc_id tiebreak so the rank never sits on a tie. 100 TB:
  // one shuffle on source; the rank<=8 cut pushes below the exchange as
  // WindowGroupLimit (the q_topk_per_brand plan family), so each task
  // forwards at most 8 rows per source — output is O(sources), not
  // O(corpus).
  private val dSourceQuota = GQuery(
    "d_source_quota",
    (s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("qb").desc, col("doc_id"))
      docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("cast(size(toks) AS double)"))
        .selectExpr("doc_id", "source",
          "CAST(round((0.4 * (1.0 - size(filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (size(array_distinct(toks)) / n) + 1e-9) * 10000e0) AS BIGINT) AS qb")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 8)
        .select(col("source"), col("doc_id"), col("qb"), col("rnk"))
    },
    Some("""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks,
              len(string_split(text, ' '))::DOUBLE AS n FROM documents),
q AS (SELECT doc_id, source,
        CAST(round((0.4 * (1.0 - len(list_filter(toks, t -> t IN ('the', 'a'))) / n) + 0.3 * least(n / 100.0, 1.0) + 0.3 * (len(list_distinct(toks)) / n) + 1e-9) * 10000) AS BIGINT) AS qb
      FROM t),
r AS (SELECT source, doc_id, qb,
        row_number() OVER (PARTITION BY source ORDER BY qb DESC, doc_id) AS rnk
      FROM q)
SELECT source, doc_id, qb, rnk FROM r WHERE rnk <= 8"""),
    "Per-source quota: top-8 documents by integer quality bucket per source.")

  // Cross-source duplication matrix: which sources (crawls, dumps,
  // domains) overlap each other, measured on the SAME MinHash-LSH pair
  // stage as d_minhash_lsh_pairs — the dataset-provenance signal that
  // decides which acquisition is redundant before paying for it. Pair
  // orientation is normalized on the SOURCE names (least/greatest) so
  // (srcA, srcB) and (srcB, srcA) aggregate together; in-source pairs
  // keep source_a = source_b and measure internal duplication. 100 TB:
  // the matrix aggregates the PAIR list (orders of magnitude smaller
  // than the corpus) and the doc->source map joins by doc_id — at most
  // two broadcast-or-shuffle equi joins bounded by the pair count;
  // output is O(sources^2).
  private val dCrossSourceOverlap = GQuery(
    "d_cross_source_overlap",
    (s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      lshPairsDF(s, dir)
        .join(src.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("source", "src_a"), Seq("doc_a"))
        .join(src.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("source", "src_b"), Seq("doc_b"))
        .select(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some(s"""WITH $lshPairsOracle,
j AS (SELECT least(sa.source, sb.source) AS source_a,
             greatest(sa.source, sb.source) AS source_b
      FROM pairs
      JOIN documents sa ON pairs.doc_a = sa.doc_id
      JOIN documents sb ON pairs.doc_b = sb.doc_id)
SELECT source_a, source_b, count(*) AS n_pairs
FROM j GROUP BY 1, 2"""),
    "Near-dup pair counts per source pair (LSH pair stage + provenance join).")

  // LSH band-plan tuning: candidate-pair counts for three (bands x
  // rows) layouts of the SAME 16-perm MinHash signature — the knob-
  // setting companion to d_minhash_lsh_pairs (more bands = higher
  // recall / more candidates; longer rows = higher precision / fewer).
  // The count comes from per-bucket COMBINATORICS (sum of n*(n-1)/2
  // over buckets), never from materializing pairs — so unlike the pair
  // listing this stays safe on arbitrarily dup-heavy corpora with NO
  // bucket cap: counting a million-doc bucket is one integer multiply,
  // not 10^12 rows. 100 TB: one signature scan, one (cfg, band, key)
  // partial-agg shuffle whose cardinality is bounded by the band-bucket
  // count, then a 3-row rollup. All-integer output.
  private val dLshBandTuning = GQuery(
    "d_lsh_band_tuning",
    (s, dir) => {
      val sig = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .filter(expr("size(toks) >= 3"))
        .withColumn("mharr", graft.functions.GraftFunctions.minhashSig(
          col("toks"), perms.map(_._1), perms.map(_._2), MP))
      // ONE scan, ONE signature computation: every (cfg, band) row of
      // all three layouts explodes from the same mharr (a 3-scan union
      // would recompute the minhash — the expensive part — per config).
      val cfgs = Seq((2, 8), (4, 4), (8, 2))
      val bandStructs = cfgs.map { case (b, r) =>
        s"""transform(sequence(0, ${b - 1}), z -> named_struct(
           'cfg', 'b${b}_r$r', 'band_idx', z,
           'band_key', concat_ws('_', slice(mharr, z * $r + 1, $r))))"""
      }.mkString(", ")
      sig.select(col("doc_id"),
          explode(expr(s"flatten(array($bandStructs))")).as("e"))
        .select(col("doc_id"), col("e.cfg").as("cfg"),
          col("e.band_idx").as("band_idx"), col("e.band_key").as("band_key"))
        .groupBy(col("cfg"), col("band_idx"), col("band_key"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2L)
        .groupBy(col("cfg"))
        .agg(count(lit(1)).as("n_buckets_ge2"),
          sum(expr("n * (n - 1) div 2")).as("n_cand_pairs"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
h AS (SELECT doc_id, $shingleDuck AS hs FROM t),
m AS (SELECT doc_id, ${mhDuckExprs.mkString(", ")} FROM h),
bands AS (${Seq((2, 8), (4, 4), (8, 2)).flatMap { case (b, r) =>
        (0 until b).map(z =>
          s"SELECT doc_id, 'b${b}_r$r' AS cfg, $z AS band_idx, concat_ws('_', ${(r * z until r * z + r).map("mh" + _).mkString(", ")}) AS band_key FROM m")
      }.mkString("\nUNION ALL\n")}),
g AS (SELECT cfg, band_idx, band_key, count(*) AS n
      FROM bands GROUP BY 1, 2, 3 HAVING count(*) >= 2)
SELECT cfg, count(*) AS n_buckets_ge2,
       CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_cand_pairs
FROM g GROUP BY 1"""),
    "Candidate-pair counts for three LSH band layouts via per-bucket combinatorics.")

  // ---------------------------------------------------------------------
  // Segment-dedup corpus REWRITE (the C4 "keep first occurrence" rule,
  // fixed-width form): every doc splits into non-overlapping 16-token
  // segments; a segment occurrence survives iff it is the corpus-wide
  // FIRST occurrence of its content hash under the deterministic total
  // order (doc_id, seg_idx); the output is the rewritten corpus (kept
  // segments re-joined in document order) plus the retention counts.
  // Unlike d_boilerplate_segments (which only FLAGS cross-doc dup
  // segments), this op produces the cleaned text — the dedup step that
  // actually edits training data. Scale shape: one corpus scan, one
  // hash-keyed shuffle for the first-occurrence window (each hash group
  // is the duplicate multiplicity, so groups stay tiny even at 100 TB),
  // then one doc_id shuffle to fold the rewrite. Segment payloads carry
  // the token text only as far as the two keyed exchanges — no
  // all-pairs stage, no broadcast of anything corpus-sized.
  private val dSegmentDedupRewrite = GQuery(
    "d_segment_dedup_rewrite",
    (s, dir) => {
      val seg = docs(s, dir)
        .withColumn("toks", expr("split(text, ' ')"))
        .withColumn("n", expr("size(toks)"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("toks"),
          posexplode(expr("sequence(0, (n - 1) div 16)")).as(Seq("seg_idx", "k")))
        .withColumn("seg", expr("slice(toks, k * 16 + 1, 16)"))
        .select(col("doc_id"), col("seg_idx"),
          concat_ws(" ", col("seg")).as("seg_txt"),
          graft.functions.GraftFunctions.md5Hash48(
            concat_ws("", col("seg"))).as("sh"))
      val w = Window.partitionBy(col("sh")).orderBy(col("doc_id"), col("seg_idx"))
      seg.withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_seg"),
          sum(when(col("rn") === 1, lit(1L)).otherwise(lit(0L))).as("n_kept"),
          coalesce(
            concat_ws(" ",
              expr("transform(array_sort(collect_list(CASE WHEN rn = 1 THEN struct(seg_idx, seg_txt) END)), x -> x.seg_txt)")),
            lit("")).as("new_text"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents WHERE len(string_split(text, ' ')) > 0),
g AS (SELECT doc_id, unnest(range((n + 15) // 16)) AS k, toks, n FROM t),
seg AS (SELECT doc_id, k AS seg_idx,
               array_to_string(toks[k * 16 + 1 : least(k * 16 + 16, n)], ' ') AS seg_txt,
               ('0x' || substr(md5(array_to_string(toks[k * 16 + 1 : least(k * 16 + 16, n)], chr(1))), 1, 12))::BIGINT AS sh
        FROM g),
r AS (SELECT doc_id, seg_idx, seg_txt,
             row_number() OVER (PARTITION BY sh ORDER BY doc_id, seg_idx) AS rn
      FROM seg)
SELECT doc_id, count(*) AS n_seg,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(seg_txt, ' ' ORDER BY seg_idx) FILTER (WHERE rn = 1), '') AS new_text
FROM r GROUP BY 1"""),
    "C4-style segment dedup that rewrites the corpus: global first occurrence survives, later copies are cut.")

  // ---------------------------------------------------------------------
  // Duplicated-SPAN coverage (round 16) — the exact-substring dedup
  // metric of Lee et al. 2022 ("Deduplicating Training Data Makes
  // Language Models Better"), fixed-width form: every OVERLAPPING
  // 8-token window is fingerprinted; a window is duplicated when its
  // content hash occurs >= 2 times corpus-wide (within-doc repeats
  // count — a doc that repeats itself is self-duplication); the per-doc
  // report gives how many tokens sit under at least one duplicated
  // window (the union of overlapping [p, p+8) intervals) and the
  // resulting dup fraction — the signal the span-removal rewrite and
  // doc-level filters ("drop docs > X% duplicated") both key on.
  // Distinct from d_boilerplate_segments / d_segment_dedup_rewrite:
  // those tile NON-overlapping segments (a duplicate straddling a
  // segment boundary is invisible); the stride-1 windows here catch any
  // duplicated run >= 8 tokens at any offset.
  // Interval union: duplicated positions are strictly increasing per
  // doc, so each window's fresh coverage is
  // (p+8) - greatest(p, prev_end) with prev_end seeded at 0 — computed
  // here as a fold over the doc's sorted duplicated-position list (the
  // list is doc-length-bounded), the EXACT arithmetic the streaming
  // dual runs ([[graft.streaming.StreamingPipelines.dupSpanStream]] —
  // the duals share the formula verbatim); the oracle states the same
  // recurrence through a lag() window, an independent formulation of
  // the same function (cross-checked by the hash gate and brute force).
  // Scale shape (100 TB): the window hashes come from ONE codegen'd
  // pass (ngramHashesPos — md5 over chr(1)-joined token bytes, no gram
  // strings materialized) feeding ONE gh-keyed exchange that BOTH the
  // duplicate-count aggregation and the join-back consume (same key →
  // ReuseExchange; the dup side is never broadcast — it scales with
  // the corpus), then ONE doc_id shuffle folds the per-doc report. No
  // all-pairs stage, no second scan, no stage wider than the gram
  // count.
  /** The (doc_id[, carry…], n, p, gh) overlapping-8-token-window frame —
    * the ONE gram definition shared by the batch d_dup_span_coverage and
    * the streaming calibrate/apply (DupSpanStreamSpec pins the duals
    * equal, so the gram expressions must not be able to drift). */
  private[graft] def dupSpanGrams(d: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    d.withColumn("toks", expr("split(text, ' ')"))
      .withColumn("n", expr("size(toks)"))
      .filter(col("n") >= 8)
      .select(col("doc_id") +: carry.map(col) :+ col("n") :+
        posexplode(graft.functions.GraftFunctions.ngramHashesPos(col("toks"), 8))
          .as(Seq("p", "gh")): _*)

  private val dDupSpanCoverage = GQuery(
    "d_dup_span_coverage",
    (s, dir) => {
      val grams = dupSpanGrams(docs(s, dir))
      val dup = grams.groupBy(col("gh"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2)
        .select(col("gh"), lit(true).as("isdup"))
      val rep = grams.join(dup, Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          collect_list(when(col("isdup"), col("p"))).as("ps"))
        .select(col("doc_id"), col("n_grams"),
          expr("cast(size(ps) AS bigint)").as("n_dup_grams"),
          expr("""aggregate(array_sort(ps),
              named_struct('e', 0, 't', cast(0 AS bigint)),
              (acc, p) -> named_struct(
                'e', greatest(acc.e, p + 8),
                't', acc.t + cast(p + 8 - greatest(p, acc.e) AS bigint)),
              acc -> acc.t)""").as("covered_tokens"))
      // ADVICE r16: n<8-token docs carry no 8-token window and so no
      // gram rows — they must still APPEAR in the report (dup_frac 0),
      // or corpus-level totals computed from it undercount and doc-level
      // "drop if > X% duplicated" consumers never see them. The report
      // left-joins back to the full corpus on doc_id (narrow 2-column
      // scan, co-partitioned with the aggregation output).
      docs(s, dir)
        .select(col("doc_id"),
          expr("cast(size(split(text, ' ')) AS bigint)").as("n_tokens"))
        .join(rep, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
        .withColumn("dup_frac",
          round(col("covered_tokens") / col("n_tokens").cast("double")
            + lit(1e-9), 4))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
g AS (SELECT doc_id, n, unnest(range(n - 7)) AS p, toks FROM t WHERE n >= 8),
h AS (SELECT doc_id, n, p,
        ('0x' || substr(md5(array_to_string(toks[p + 1 : p + 8], chr(1))), 1, 12))::BIGINT AS gh
      FROM g),
c AS (SELECT gh FROM h GROUP BY 1 HAVING count(*) >= 2),
dp AS (SELECT h.doc_id, h.p,
         greatest(h.p, coalesce(lag(h.p) OVER (PARTITION BY h.doc_id ORDER BY h.p) + 8, 0)) AS lo
       FROM h JOIN c USING (gh)),
a AS (SELECT doc_id, count(*) AS n_dup_grams,
        CAST(sum(p + 8 - lo) AS BIGINT) AS covered_tokens
      FROM dp GROUP BY 1),
tot AS (SELECT doc_id, count(*) AS n_grams FROM h GROUP BY 1)
SELECT t.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
       COALESCE(tot.n_grams, 0) AS n_grams,
       COALESCE(a.n_dup_grams, 0) AS n_dup_grams,
       COALESCE(a.covered_tokens, 0) AS covered_tokens,
       round(COALESCE(a.covered_tokens, 0) / CAST(t.n AS DOUBLE) + 1e-9, 4) AS dup_frac
FROM t LEFT JOIN tot USING (doc_id) LEFT JOIN a USING (doc_id)"""),
    "Exact duplicated-span coverage: overlapping 8-token window hashes, corpus-wide duplicate marking, per-doc interval-union token coverage (Lee et al. 2022 metric).")

  // ---------------------------------------------------------------------
  // Duplicated-SPAN rewrite (round 16) — the removal step of Lee et al.
  // 2022 at span granularity: for every duplicated 8-token window
  // (corpus count >= 2), the corpus-wide FIRST occurrence under the
  // deterministic (doc_id, p) total order survives; every token covered
  // by a LATER occurrence's [p, p+8) window is cut, and the output is
  // the rewritten corpus (kept tokens re-joined in document order) plus
  // retention counts. Completes the dedup-editing family:
  // d_boilerplate_segments FLAGS (non-overlapping tiles),
  // d_segment_dedup_rewrite EDITS at tile granularity (a duplicate
  // straddling a tile boundary is invisible), d_dup_span_coverage
  // REPORTS at span granularity — this op EDITS at span granularity:
  // two identical documents leave exactly one intact copy; a document
  // repeating its own first half loses only the repeat.
  // Scale shape (100 TB): the gram frame (doc_id, pos, 8-byte hash —
  // never text) goes through ONE gh-keyed exchange where BOTH window
  // functions (occurrence count, first-occurrence rank) evaluate, then
  // one doc_id aggregation collects each doc's removal starts
  // (doc-length-bounded list), and ONE narrow doc_id equi-join back to
  // `documents` rebuilds the text — the text rides only this final
  // join, never the gram shuffle. Per-doc mask work is
  // O(n_tokens x removals), both doc-bounded.
  /** Rebuild the rewritten corpus from a (doc_id, rs: array<int>)
    * removal-starts frame: every token under any [r, r+8) window is
    * cut, the rest re-join in document order. ONE narrow doc_id
    * equi-join — the text never rides a gram shuffle. Shared verbatim
    * by the batch d_dup_span_rewrite and the apply step of the
    * streaming quarantine report ([[graft.streaming.StreamingPipelines
    * .dupSpanRewriteStream]] — DupSpanRewriteStreamSpec pins the duals
    * equal through this function).
    * ADVICE r16: NO n>=8 filter on the corpus side — a short doc
    * cannot contain a duplicated 8-token window, so a Lee-et-al-style
    * removal must pass it through VERBATIM (new_text = text,
    * kept_tokens = n_tokens), not silently drop it from the rewritten
    * corpus. Docs absent from `rm` — short or simply clean — left-join
    * to no removal list and keep every position. */
  private[graft] def dupSpanApplyRemovals(d: DataFrame,
      rm: DataFrame): DataFrame =
    d.withColumn("toks", expr("split(text, ' ')"))
      .withColumn("n", expr("size(toks)"))
      .join(rm, Seq("doc_id"), "left")
      .withColumn("rs", expr("coalesce(rs, cast(array() AS array<int>))"))
      .withColumn("keep_idx", expr(
        "filter(sequence(0, n - 1), i -> NOT exists(rs, rr -> rr <= i AND i <= rr + 7))"))
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        expr("cast(size(keep_idx) AS bigint)").as("kept_tokens"),
        expr("concat_ws(' ', transform(keep_idx, i -> element_at(toks, i + 1)))")
          .as("new_text"))

  private val dDupSpanRewrite = GQuery(
    "d_dup_span_rewrite",
    (s, dir) => {
      val wCnt = Window.partitionBy("gh")
      val wRn = Window.partitionBy("gh").orderBy(col("doc_id"), col("p"))
      val rm = dupSpanGrams(docs(s, dir))
        .withColumn("cnt", count(lit(1)).over(wCnt))
        .withColumn("rn", row_number().over(wRn))
        .filter(col("cnt") >= 2 && col("rn") >= 2)
        .groupBy(col("doc_id"))
        .agg(expr("sort_array(collect_list(p))").as("rs"))
      dupSpanApplyRemovals(docs(s, dir), rm)
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
g AS (SELECT doc_id, n, unnest(range(n - 7)) AS p, toks FROM t WHERE n >= 8),
h AS (SELECT doc_id, n, p,
        ('0x' || substr(md5(array_to_string(toks[p + 1 : p + 8], chr(1))), 1, 12))::BIGINT AS gh
      FROM g),
r AS (SELECT doc_id, p,
        count(*) OVER (PARTITION BY gh) AS cnt,
        row_number() OVER (PARTITION BY gh ORDER BY doc_id, p) AS rn
      FROM h),
rm AS (SELECT doc_id, list(p ORDER BY p) AS rs
       FROM r WHERE cnt >= 2 AND rn >= 2 GROUP BY 1),
k AS (SELECT t.doc_id, t.n, t.toks,
        list_filter(range(t.n), i -> len(list_filter(
          coalesce(rm.rs, CAST([] AS BIGINT[])),
          rr -> rr <= i AND i <= rr + 7)) = 0) AS keep_idx
      FROM t LEFT JOIN rm USING (doc_id))
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       CAST(len(keep_idx) AS BIGINT) AS kept_tokens,
       coalesce(array_to_string(list_transform(keep_idx, i -> toks[i + 1]), ' '), '') AS new_text
FROM k"""),
    "Span-granular dedup rewrite: corpus-wide first occurrence of each duplicated 8-token window survives; tokens under later occurrences are cut (Lee et al. 2022 removal step).")

  // ---------------------------------------------------------------------
  // BPE merge induction — vocabulary building for the tokenizer itself
  // (Sennrich et al. '16): iteratively merge the corpus's most frequent
  // adjacent symbol pair, starting from characters. The 100 TB shape is
  // the standard one: ONE corpus-wide shuffle builds the word-frequency
  // table (5k-ish rows at any corpus size — BPE trains on word counts,
  // not raw text), then every merge round runs on that bounded frame:
  // pair counts (one small shuffle), a TakeOrdered top-1, and a pure-map
  // segmentation rewrite against the 1-row broadcast winner, lineage
  // pinned per round like q_pagerank. Greedy left-to-right merge
  // application is expressed as delimiter-exact string replace (symbols
  // are space-joined, spaces doubled so consecutive merges don't consume
  // each other's boundary — then doubles collapse), identical in both
  // engines, so the whole merge TRAJECTORY is deterministic and the
  // DuckDB oracle replays it as chained CTEs. Ties break (count DESC,
  // l, r) — integer counts, ASCII symbols, no float anywhere.
  private val bpeRounds = 4

  /** One oracle round: pairs -> best -> rewritten segmentation. */
  private def bpeRoundSql(k: Int): String =
    s"""p$k AS (SELECT split_part(pr, '|', 1) AS l, split_part(pr, '|', 2) AS r,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM (SELECT freq, unnest(list_transform(range(1, len(ts)),
                     i -> ts[i] || '|' || ts[i + 1])) AS pr
            FROM (SELECT freq, string_split(seg, ' ') AS ts FROM w${k - 1}) q) y
      GROUP BY 1, 2),
b$k AS (SELECT l, r, pair_count FROM p$k ORDER BY pair_count DESC, l, r LIMIT 1),
w$k AS (SELECT trim(replace(replace(' ' || replace(seg, ' ', '  ') || ' ',
               ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' '),
               '  ', ' ')) AS seg, freq
       FROM w${k - 1}, b$k b)"""

  /** Induction core over any (doc_id, text) frame — public so the
    * streaming calibration path ([[graft.streaming.StreamingPipelines
    * .bpeMergesCalibrate]]) shares it verbatim. */
  def bpeMergesFrom(d: DataFrame): DataFrame = {
      val words = d
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .select(concat_ws(" ", split(col("w"), "")).as("seg"), col("freq"))
      var state = graft.Checkpoints.pin(words)
      val rounds = (1 to bpeRounds).map { round =>
        val pairs = state
          .select(col("freq"), split(col("seg"), " ").as("ts"))
          .filter(size(col("ts")) >= 2) // ANSI guard: sequence(1,0) descends
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> struct(element_at(ts, i) AS l, element_at(ts, i + 1) AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("pair_count"))
        val best = graft.Checkpoints.pin(
          pairs.orderBy(col("pair_count").desc, col("l"), col("r")).limit(1))
        state = graft.Checkpoints.pin(
          state.crossJoin(broadcast(best.select(col("l").as("bl"), col("r").as("br"))))
            .select(expr(
              "trim(replace(replace(concat(' ', replace(seg, ' ', '  '), ' '), concat(' ', bl, '  ', br, ' '), concat(' ', bl, br, ' ')), '  ', ' '))").as("seg"),
              col("freq")))
        best.select(lit(round).as("round"), col("l"), col("r"),
          concat(col("l"), col("r")).as("merged"), col("pair_count"))
      }
      rounds.reduce(_ unionByName _)
  }

  /** The induced merge table (4 bounded rows + their pinned round
    * frames), computed ONCE per (session, dir, corpus-fingerprint):
    * t_bpe_merges, t_bpe_tokenize and t_tokenizer_fertility each
    * replayed the identical greedy induction trajectory (word-frequency
    * shuffle + 4 rounds of pair counts / TakeOrdered / pinned rewrite)
    * from scratch. Streaming calibration keeps calling
    * [[bpeMergesFrom]] on its own frames — uncached by design. */
  private def bpeMergesCached(s: SparkSession, dir: String): DataFrame =
    graft.CorpusCache.memo(s, dir, "bpe_merges")(docsTextFp(s, dir))(
      graft.Checkpoints.pin(bpeMergesFrom(docs(s, dir))))

  private val tBpeMerges = GQuery(
    "t_bpe_merges",
    (s, dir) => bpeMergesCached(s, dir),
    Some(s"""WITH w0 AS (
  SELECT array_to_string(string_split(w, ''), ' ') AS seg, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  WHERE length(w) > 0 GROUP BY 1),
${(1 to bpeRounds).map(bpeRoundSql).mkString(",\n")}
${(1 to bpeRounds).map(k =>
        s"SELECT $k AS round, l, r, l || r AS merged, pair_count FROM b$k")
        .mkString("\nUNION ALL ")}"""),
    s"BPE vocab induction: $bpeRounds greedy merge rounds over the word-frequency table, trajectory-exact cross-engine.")

  /** Greedy merge application, shared expression text for both engines:
    * the same double-space/replace/collapse as induction, with `l`/`r`
    * as SQL expressions naming the round's winning pair. */
  private[graft] def bpeApply(seg: String, l: String, r: String): String =
    s"trim(replace(replace(concat(' ', replace($seg, ' ', '  '), ' '), " +
      s"concat(' ', $l, '  ', $r, ' '), concat(' ', $l, $r, ' ')), '  ', ' '))"

  // BPE tokenize — the application half of t_bpe_merges: segment every
  // document under the induced merge table and count its BPE tokens.
  // The whole doc becomes one space-joined symbol stream with a chr(1)
  // word separator (no merge can cross it: merges are induced from
  // within-word pairs, so neither side is ever chr(1)), the four merges
  // apply in induction order as nested pure-string rewrites, and the
  // token count is the surviving symbol count. Scale shape: ZERO
  // shuffles — four 1-row broadcast merge winners against one documents
  // scan, everything else codegen'd string ops inside the scan (token
  // accounting under the real tokenizer vocab at 100 TB is a map job,
  // and this plan says so).
  /** Whole-doc symbol stream with the chr(1) word separator. */
  private[graft] val bpeDocSegExpr: String =
    "array_join(transform(split(text, ' '), w -> array_join(split(w, ''), ' ')), concat(' ', chr(1), ' '))"
  /** Surviving-symbol count after merge application. */
  private[graft] def bpeCountExpr(seg: String): String =
    s"cast(size(filter(split($seg, ' '), t -> t != chr(1) AND t != '')) AS long)"

  /** Application core over any (doc_id, text) frame and a merge table
    * shaped like [[bpeMergesFrom]]'s output — public for the streaming
    * dual's batch twin. */
  def bpeTokenizeFrom(d: DataFrame, merges: DataFrame): DataFrame = {
      var df = d.select(col("doc_id"), expr(bpeDocSegExpr).as("seg"))
      (1 to bpeRounds).foreach { k =>
        df = df.crossJoin(broadcast(merges.filter(col("round") === k)
          .select(col("l").as(s"l$k"), col("r").as(s"r$k"))))
          .withColumn("seg", expr(bpeApply("seg", s"l$k", s"r$k")))
      }
      df.select(col("doc_id"), expr(bpeCountExpr("seg")).as("n_tokens"))
  }

  private val tBpeTokenize = GQuery(
    "t_bpe_tokenize",
    (s, dir) => bpeTokenizeFrom(docs(s, dir), bpeMergesCached(s, dir)),
    Some {
      val apply4 = (1 to bpeRounds).foldLeft("doc_seg") { (acc, k) =>
        bpeApply(acc, s"b$k.l", s"b$k.r")
      }
      s"""WITH w0 AS (
  SELECT array_to_string(string_split(w, ''), ' ') AS seg, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  WHERE length(w) > 0 GROUP BY 1),
${(1 to bpeRounds).map(bpeRoundSql).mkString(",\n")},
d AS (SELECT doc_id,
        array_to_string(list_transform(string_split(text, ' '),
          w -> array_to_string(string_split(w, ''), ' ')),
          ' ' || chr(1) || ' ') AS doc_seg
      FROM documents)
SELECT doc_id,
       CAST(len(list_filter(string_split($apply4, ' '),
         t -> t != chr(1) AND t != '')) AS BIGINT) AS n_tokens
FROM d${(1 to bpeRounds).map(k => s", b$k").mkString}"""
    },
    "BPE token accounting: apply the induced merges to every document as a zero-shuffle map; count surviving symbols.")

  // Tokenizer fertility by language (round 13) — the standard tokenizer
  // eval: BPE tokens emitted per whitespace word, per language. High
  // fertility on a language means the vocab under-serves it (every word
  // shatters into many symbols), which inflates training cost and
  // starves that language of effective context — THE number a
  // multilingual vocab is judged by. Composes the induced merge table
  // and the zero-shuffle apply verbatim (bpeTokenizeFrom), joins back
  // the (lang, word count) per doc, and aggregates to #langs rows:
  // integer sums carried in the output so the hash pins the exact
  // domain, fertility the single rounded division. Word counts exclude
  // empty tokens on both engines, matching the symbolization's own
  // filter.
  private val tTokenizerFertility = GQuery(
    "t_tokenizer_fertility",
    (s, dir) => {
      val d = docs(s, dir)
      val toks = bpeTokenizeFrom(d, bpeMergesCached(s, dir))
      toks.join(d.selectExpr("doc_id", "lang",
          "cast(size(filter(split(text, ' '), w -> length(w) > 0)) AS long) AS n_words"),
          Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tokens")).as("bpe_tokens"),
          sum(col("n_words")).as("ws_words"))
        .select(col("lang"), col("bpe_tokens"), col("ws_words"),
          round(col("bpe_tokens") / col("ws_words").cast("double") + lit(1e-9), 4)
            .as("fertility"))
    },
    Some {
      val apply4 = (1 to bpeRounds).foldLeft("doc_seg") { (acc, k) =>
        bpeApply(acc, s"b$k.l", s"b$k.r")
      }
      s"""WITH w0 AS (
  SELECT array_to_string(string_split(w, ''), ' ') AS seg, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  WHERE length(w) > 0 GROUP BY 1),
${(1 to bpeRounds).map(bpeRoundSql).mkString(",\n")},
d AS (SELECT doc_id,
        array_to_string(list_transform(string_split(text, ' '),
          w -> array_to_string(string_split(w, ''), ' ')),
          ' ' || chr(1) || ' ') AS doc_seg
      FROM documents),
tok AS (SELECT doc_id,
       CAST(len(list_filter(string_split($apply4, ' '),
         t -> t != chr(1) AND t != '')) AS BIGINT) AS n_tokens
FROM d${(1 to bpeRounds).map(k => s", b$k").mkString}),
j AS (SELECT doc.lang, tok.n_tokens,
        CAST(len(list_filter(string_split(doc.text, ' '), w -> length(w) > 0)) AS BIGINT) AS n_words
      FROM tok JOIN documents doc USING (doc_id))
SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS bpe_tokens,
       CAST(sum(n_words) AS BIGINT) AS ws_words,
       round(CAST(sum(n_tokens) AS BIGINT) / CAST(sum(n_words) AS BIGINT)::DOUBLE + 1e-9, 4) AS fertility
FROM j GROUP BY 1"""
    },
    "Tokenizer fertility per language: BPE tokens per whitespace word under the induced vocab.")

  // Code-likeness routing (round 13) — the pretraining-mix filter that
  // decides prose-pipeline vs code-pipeline per document (code wants
  // different dedup shingles, different quality rules, different
  // tokenizer). Signals are the standard cheap ones — brace/semicolon/
  // assignment density and indented-line ratio — all computed as EXACT
  // integer counts (length-difference trick for character counts,
  // regexp-free line classification), combined into one integer-scaled
  // score so both engines agree bit-for-bit; the verdict threshold is a
  // plain integer compare. On the synthetic prose fixture every doc
  // scores low (is_code = false everywhere) — the hash still pins all
  // counts and the score arithmetic, and CodeDetectSpec feeds crafted
  // code/prose documents to pin both sides of the threshold. Scale
  // shape: pure per-row map over the corpus scan, no shuffle at all.
  private val tCodeDetect = GQuery(
    "t_code_detect",
    (s, dir) =>
      docs(s, dir)
        .withColumn("braces",
          expr("length(text) - length(replace(replace(text, '{', ''), '}', ''))"))
        .withColumn("semis", expr("length(text) - length(replace(text, ';', ''))"))
        .withColumn("eqs", expr("length(text) - length(replace(text, '=', ''))"))
        .withColumn("lines", expr("split(text, '\n')"))
        .withColumn("n_lines", expr("size(lines)"))
        .withColumn("indented",
          expr("size(filter(lines, l -> startswith(l, '    ') OR startswith(l, '\t')))"))
        // integer-scaled density: signal chars per 1000 chars + indented
        // lines per 10 lines. The counts come from Spark's INT-typed
        // length(), so they are widened to BIGINT BEFORE the *1000 —
        // otherwise a document with >~2.1M signal characters wraps in
        // 32-bit while the DuckDB oracle (BIGINT length()) does not
        // (ADVICE r13).
        .withColumn("code_score",
          expr("(cast(braces AS bigint) + semis + eqs) * 1000 div greatest(cast(n_chars AS bigint), 1) " +
            "+ cast(indented AS bigint) * 10 div greatest(cast(n_lines AS bigint), 1)"))
        .selectExpr("doc_id", "cast(braces AS bigint) AS braces",
          "cast(semis AS bigint) AS semis", "cast(eqs AS bigint) AS eqs",
          "cast(indented AS bigint) AS indented_lines", "code_score",
          "code_score >= 15 AS is_code"),
    Some("""WITH t AS (
  SELECT doc_id, n_chars, text,
         length(text) - length(replace(replace(text, '{', ''), '}', '')) AS braces,
         length(text) - length(replace(text, ';', '')) AS semis,
         length(text) - length(replace(text, '=', '')) AS eqs,
         string_split(text, chr(10)) AS lines
  FROM documents),
c AS (
  SELECT doc_id, braces, semis, eqs,
         len(list_filter(lines, l -> starts_with(l, '    ') OR starts_with(l, chr(9)))) AS indented,
         len(lines) AS n_lines, n_chars
  FROM t)
SELECT doc_id, CAST(braces AS BIGINT) AS braces, CAST(semis AS BIGINT) AS semis,
       CAST(eqs AS BIGINT) AS eqs, CAST(indented AS BIGINT) AS indented_lines,
       CAST(CAST(braces + semis + eqs AS BIGINT) * 1000 // greatest(CAST(n_chars AS BIGINT), 1)
            + CAST(indented AS BIGINT) * 10 // greatest(CAST(n_lines AS BIGINT), 1) AS BIGINT) AS code_score,
       (CAST(braces + semis + eqs AS BIGINT) * 1000 // greatest(CAST(n_chars AS BIGINT), 1)
            + CAST(indented AS BIGINT) * 10 // greatest(CAST(n_lines AS BIGINT), 1)) >= 15 AS is_code
FROM c"""),
    "Code-likeness routing: integer-exact brace/semicolon/assignment/indent densities + threshold.")

  val all: Seq[GQuery] = Seq(
    tCodeDetect, tTokenizerFertility,
    tBpeMerges, tBpeTokenize,
    dDupStatsBySource, dSplitAssign, dFilterFunnel, dSplitLeakage, tEntropy,
    dNgramNovelty,
    tTextStats, tQuality, tLangid, tLangidConfusion, tFingerprint, tTokenFreq,
    dExactDedup, dNgramJaccard, dMinhashSig, dMinhashLsh, dDedupGroups,
    dCurate, tSimhash, dSimhashNeardup, dEditDistance, dHashSample,
    dStratified, tRegexTokens, tRepetition, tLmScore, tDsirScore, tSourceKl, tTfidf, tRedact,
    dDecontaminate, dPackSequences, dIngestNeardup, tVocabCoverage,
    dContaminationReport, tBm25, dReservoir, dTemperatureMix,
    dChunkOverlap, dBoilerplate, dQualityPrune,
    tGopherRules, dSourceQuota, dCrossSourceOverlap, dLshBandTuning,
    dContainmentPairs, dClusterSizeProfile, tZipfFit, dPerplexityBand,
    dEpochPlan, dSegmentDedupRewrite, dDupSpanCoverage, dDupSpanRewrite)
}
