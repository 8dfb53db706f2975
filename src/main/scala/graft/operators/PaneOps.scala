package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}

/** Pane-shared sliding-window sketches (beyond the reference — the
  * classic "panes" optimization of Li et al., "No Pane, No Gain", over
  * the engine's mergeable sketches).
  *
  * A sliding window of size S and slide s covers k = S/s non-overlapping
  * PANES (tumbling s-width buckets). The naive sliding plan replicates
  * every RAW ROW into its k covering windows before aggregating — k× the
  * shuffle bytes, k× the aggregation work. Because the engine's sketches
  * merge associatively (DDSketch bucket counts add; HLL registers max),
  * the pane plan aggregates raw rows ONCE per pane, then replicates and
  * merges only the constant-size pane sketches: shuffle volume drops
  * from k×|rows| to |rows| + k×|panes|×|sketch cells|, and the pane
  * count is time-bounded, not data-bounded — at 100 TB/day with a 30-min
  * slide there are 48 panes/day regardless of row count. The estimates
  * are IDENTICAL to the naive plan's (merge-order invariance), which the
  * PaneSpec asserts and the DuckDB oracle (written in the naive,
  * row-replicating form — an independent derivation) hash-verifies.
  *
  * Streaming duals live in
  * [[graft.streaming.StreamingPipelines.slidingDdQuantilesPaneStream]]:
  * the same pane→window two-level shape as chained watermarked
  * aggregations.
  */
object PaneOps {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")

  /** Validated (window, slide) pair for the pane decomposition; k is
    * derived. Window must be a positive multiple of slide. */
  final case class PaneParams(windowUs: Long, slideUs: Long) {
    require(windowUs > 0 && slideUs > 0,
      s"window/slide must be positive, got $windowUs/$slideUs")
    require(windowUs % slideUs == 0,
      s"window ($windowUs us) must be a whole multiple of slide ($slideUs us)")
    val k: Int = (windowUs / slideUs).toInt
    require(k <= 4096, s"pane count $k exceeds 4096 — widen the slide")

    /** Pane start in µs, FLOOR division (floorMod rewrite) so pre-1970
      * negative micros land in the pane below zero — agreeing with both
      * Spark's `window()` (the streaming duals) and DuckDB's `//` (the
      * oracles); a plain `div` truncates toward zero and would disagree
      * on negative timestamps. */
    def paneExpr(tsCol: String = "ts"): String =
      s"(unix_micros($tsCol) - ((unix_micros($tsCol) % ${slideUs}L + ${slideUs}L) % ${slideUs}L))"

    /** The k sliding-window starts that cover pane column `pane`. */
    def coveringWindowsExpr: String =
      s"transform(sequence(0, ${k - 1}), j -> pane - j * ${slideUs}L)"
  }

  object PaneParams {
    /** 2-hour windows sliding every 30 minutes — the registered shape. */
    val default: PaneParams = PaneParams(7200000000L, 1800000000L)
    def ofMinutes(windowMin: Int, slideMin: Int): PaneParams =
      PaneParams(windowMin * 60000000L, slideMin * 60000000L)
  }

  private[graft] val slideUs = PaneParams.default.slideUs
  private[graft] val paneK = PaneParams.default.k

  /** The decimal-DDSketch bucket of SQL expression `x` — the same
    * (#digits, first-two-digits) bucket the
    * [[org.apache.spark.sql.graftext.DecimalDDSketch]] aggregate uses,
    * as a plain SQL expression (valid in BOTH Spark and DuckDB up to
    * the `//`-vs-`div` spelling handled by the caller), so pane-grouped
    * sketch STATE is expressible as (bucket, count) rows that stay
    * inside whole-stage codegen. */
  private[graft] def ddBucketExpr(x: String): String =
    s"""CASE WHEN $x < 1 THEN 0 ELSE
       length(CAST(CAST(floor($x) AS BIGINT) AS STRING)) * 100 +
       CASE WHEN floor($x) < 10 THEN CAST(floor($x) AS INT) * 10
            ELSE CAST(substring(CAST(CAST(floor($x) AS BIGINT) AS STRING), 1, 2) AS INT) END
     END"""

  /** Bucket → representative value (midpoint), matching DecimalDDSketch. */
  private def ddRepExpr(b: String): String =
    s"CASE WHEN $b = 0 THEN 0.5 ELSE (CAST($b % 100 AS DOUBLE) + 0.5) * pow(10, ($b div 100) - 2) END"

  /** Quantile arm: smallest bucket whose cumulative count reaches ⌈q·n⌉. */
  private def qArm(q: Double): org.apache.spark.sql.Column =
    min(when(col("cum") >= greatest(lit(1L), ceil(lit(q) * col("n")).cast("long")),
      col("bk")))

  /** Shared tail: (event_type, win_start_us, bk, cnt) → per-window
    * quantile estimates. One exchange on (event_type, win_start_us) for
    * the cumulative walk — the input is already sketch-sized. */
  private def quantilesFromCells(cells: DataFrame): DataFrame = {
    val wCum = Window.partitionBy("event_type", "win_start_us").orderBy("bk")
    val wAll = Window.partitionBy("event_type", "win_start_us")
    cells
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("event_type"), col("win_start_us"))
      .agg(max(col("n")).as("n_vals"), qArm(0.50).as("b50"),
        qArm(0.95).as("b95"), qArm(0.99).as("b99"))
      .select(col("event_type"),
        timestamp_micros(col("win_start_us")).as("win_start"), col("n_vals"),
        expr(ddRepExpr("b50")).as("q50"), expr(ddRepExpr("b95")).as("q95"),
        expr(ddRepExpr("b99")).as("q99"))
  }

  /** PANE plan: raw rows aggregate once into per-pane sketch cells; only
    * the cells replicate into the k covering windows. */
  def slidingDdQuantilesPane(ev: DataFrame,
      p: PaneParams = PaneParams.default): DataFrame = {
    val cells = ev.filter(col("value").isNotNull)
      .select(col("event_type"), expr(p.paneExpr()).as("pane"),
        expr(ddBucketExpr(s"least(value, 999999999999999.0d)")).as("bk"))
      .groupBy("event_type", "pane", "bk")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("event_type", "win_start_us", "bk")
      .agg(sum(col("cnt")).as("cnt"))
    quantilesFromCells(cells)
  }

  /** NAIVE plan (the A/B receipt's baseline, not registered): every raw
    * row replicates into its k windows before any aggregation. Same
    * output bit-for-bit — merge-order invariance. */
  def slidingDdQuantilesNaive(ev: DataFrame,
      p: PaneParams = PaneParams.default): DataFrame = {
    val cells = ev.filter(col("value").isNotNull)
      .select(col("event_type"), expr(p.paneExpr()).as("pane"),
        expr(ddBucketExpr(s"least(value, 999999999999999.0d)")).as("bk"))
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("event_type", "win_start_us", "bk")
      .agg(count(lit(1)).as("cnt"))
    quantilesFromCells(cells)
  }

  private val w2b = GQuery(
    "w2b_sliding_dd_pane",
    (s, dir) => slidingDdQuantilesPane(events(s, dir)),
    Some {
      def rep(b: String) =
        s"CASE WHEN $b = 0 THEN 0.5 ELSE (CAST($b % 100 AS DOUBLE) + 0.5) * pow(10, ($b // 100) - 2) END"
      s"""WITH v AS (SELECT event_type, epoch_us(ts) AS us, least(value, 999999999999999.0) AS x
           FROM events WHERE value IS NOT NULL),
wv AS (SELECT event_type, (us // $slideUs) * $slideUs - i * $slideUs AS win_start_us, x
       FROM v, (SELECT unnest(range($paneK)) AS i)),
b AS (SELECT event_type, win_start_us,
             CASE WHEN x < 1 THEN 0 ELSE
               len(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR)) * 100 +
               CASE WHEN floor(x) < 10 THEN CAST(floor(x) AS INTEGER) * 10
                    ELSE CAST(substr(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR), 1, 2) AS INTEGER) END
             END AS bk
      FROM wv),
c AS (SELECT event_type, win_start_us, bk, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
w AS (SELECT event_type, win_start_us, bk,
             CAST(sum(cnt) OVER (PARTITION BY event_type, win_start_us ORDER BY bk) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type, win_start_us) AS BIGINT) AS n FROM c),
q AS (SELECT event_type, win_start_us, max(n) AS n_vals,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN bk END) AS b50,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN bk END) AS b95,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN bk END) AS b99
      FROM w GROUP BY 1, 2)
SELECT event_type, make_timestamp(win_start_us) AS win_start, n_vals,
       ${rep("b50")} AS q50, ${rep("b95")} AS q95, ${rep("b99")} AS q99
FROM q"""
    },
    "Sliding-window DDSketch quantiles via pane decomposition: raw rows aggregate once per pane; only sketch cells replicate into windows.")

  /** PANE plan for sliding distinct-user estimates: per-pane HLL
    * registers (max rho per bucket) merge into windows by max — the
    * register rows, never the raw rows, replicate k×. Same hash-
    * deterministic m=64 sketch as q_hll_sketch, so the oracle recomputes
    * the estimate bit-for-bit in its naive row-replicating form. */
  def slidingHllDistinctPane(ev: DataFrame,
      p: PaneParams = PaneParams.default): DataFrame = {
    val m = RelationalOps.hllM
    ev.select(col("event_type"), expr(p.paneExpr()).as("pane"),
        graft.functions.GraftFunctions
          .md5Hash48(col("user_id").cast("string")).as("h"))
      .selectExpr("event_type", "pane", s"h % $m AS bucket",
        s"${RelationalOps.hllRho("(h div 64)")} AS rho")
      .groupBy("event_type", "pane", "bucket")
      .agg(max(col("rho")).as("rho"))
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("event_type", "win_start_us", "bucket")
      .agg(max(col("rho")).as("rho"))
      .groupBy("event_type", "win_start_us")
      .agg((sum(expr("1.0 / cast(shiftleft(1L, rho) AS double)"))
        + (lit(m) - count(lit(1)))).as("sum_inv"))
      .select(col("event_type"),
        timestamp_micros(col("win_start_us")).as("win_start"),
        round(expr(s"0.709 * $m * $m") / col("sum_inv") + lit(1e-9), 2).as("hll_est"))
  }

  /** NAIVE baseline for the HLL A/B receipt (not registered). */
  def slidingHllDistinctNaive(ev: DataFrame,
      p: PaneParams = PaneParams.default): DataFrame = {
    val m = RelationalOps.hllM
    ev.select(col("event_type"), expr(p.paneExpr()).as("pane"),
        graft.functions.GraftFunctions
          .md5Hash48(col("user_id").cast("string")).as("h"))
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .selectExpr("event_type", "win_start_us", s"h % $m AS bucket",
        s"${RelationalOps.hllRho("(h div 64)")} AS rho")
      .groupBy("event_type", "win_start_us", "bucket")
      .agg(max(col("rho")).as("rho"))
      .groupBy("event_type", "win_start_us")
      .agg((sum(expr("1.0 / cast(shiftleft(1L, rho) AS double)"))
        + (lit(m) - count(lit(1)))).as("sum_inv"))
      .select(col("event_type"),
        timestamp_micros(col("win_start_us")).as("win_start"),
        round(expr(s"0.709 * $m * $m") / col("sum_inv") + lit(1e-9), 2).as("hll_est"))
  }

  private val w2c = GQuery(
    "w2c_sliding_hll_pane",
    (s, dir) => slidingHllDistinctPane(events(s, dir)),
    Some {
      val m = RelationalOps.hllM
      s"""WITH v AS (SELECT event_type, epoch_us(ts) AS us,
                  (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT) AS h
           FROM events),
wv AS (SELECT event_type, (us // $slideUs) * $slideUs - i * $slideUs AS win_start_us, h
       FROM v, (SELECT unnest(range($paneK)) AS i)),
r AS (SELECT event_type, win_start_us, h % $m AS bucket,
             max(${RelationalOps.hllRho("(h // 64)")}) AS rho
      FROM wv GROUP BY 1, 2, 3),
e AS (SELECT event_type, win_start_us,
             sum(1.0 / (1::BIGINT << rho)::DOUBLE) + ($m - count(*)) AS sum_inv
      FROM r GROUP BY 1, 2)
SELECT event_type, make_timestamp(win_start_us) AS win_start,
       round(0.709 * $m * $m / sum_inv + 1e-9, 2) AS hll_est
FROM e"""
    },
    "Sliding-window HLL distinct users via pane decomposition: per-pane registers max-merge into windows; raw rows never replicate.")

  /** PANE plan for EXACT sliding-window top-k (heaviest users per 2-h
    * window): per-key counts merge by addition — losslessly — so the
    * pane trick needs no sketch at all. Raw rows aggregate once per
    * (pane, user); only the per-pane count cells replicate into the k
    * windows. The top-k itself is the native bounded aggregate
    * [[org.apache.spark.sql.graftext.TopKByScore]] (`graft_topk`): each
    * map task collapses to a ≤ k-entry heap BEFORE the per-window
    * shuffle, so a window covering 10^8 active users ships heaps, not
    * keys — no rank window ever sorts a whole window's key set, and the
    * final stage runs in constant memory per window. All three final
    * stages were measured at organic x100 (warm): single-phase rank
    * window 6.8 s, sharded two-phase rank 10.7 s, this heap aggregate
    * 9.8 s. The rank window wins at THIS shape (many windows, moderate
    * per-window cardinality — its sort is codegen'd, the heap update is
    * interpreted); the heap is registered because its memory is bounded
    * by construction where the rank's per-window sort grows with the
    * window's key set — the failure mode that matters at 100 TB is a
    * spilling/straggling giant sort, not 1.4x on a 10 s cell.
    * Deterministic: count-desc with a user_id tiebreak, the heap's own
    * total order. */
  def slidingTopkPane(ev: DataFrame, k: Int = 5,
      p: PaneParams = PaneParams.default): DataFrame =
    ev.select(expr(p.paneExpr()).as("pane"), col("user_id"))
      .groupBy("pane", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("win_start_us", "user_id")
      .agg(sum(col("cnt")).as("cnt"))
      .groupBy("win_start_us")
      .agg(graft.functions.GraftFunctions
        .topK(col("cnt"), col("user_id"), k).as("top"))
      .select(timestamp_micros(col("win_start_us")).as("win_start"),
        explode(col("top")).as("t"))
      .select(col("win_start"), col("t.id").as("user_id"),
        col("t.score").as("cnt"), col("t.rnk").as("rnk"))

  /** NAIVE baseline for the top-k A/B (not registered). */
  def slidingTopkNaive(ev: DataFrame, k: Int = 5,
      p: PaneParams = PaneParams.default): DataFrame = {
    val w = Window.partitionBy("win_start_us")
      .orderBy(col("cnt").desc, col("user_id"))
    ev.select(expr(p.paneExpr()).as("pane"), col("user_id"))
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("win_start_us", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(timestamp_micros(col("win_start_us")).as("win_start"),
        col("user_id"), col("cnt"), col("rnk").cast("long").as("rnk"))
  }

  private val w2d = GQuery(
    "w2d_sliding_topk_pane",
    (s, dir) => slidingTopkPane(events(s, dir)),
    Some(s"""WITH v AS (SELECT epoch_us(ts) AS us, user_id FROM events),
wv AS (SELECT (us // $slideUs) * $slideUs - i * $slideUs AS win_start_us, user_id
       FROM v, (SELECT unnest(range($paneK)) AS i)),
c AS (SELECT win_start_us, user_id, count(*) AS cnt FROM wv GROUP BY 1, 2),
r AS (SELECT win_start_us, user_id, cnt,
             row_number() OVER (PARTITION BY win_start_us ORDER BY cnt DESC, user_id) AS rnk
      FROM c)
SELECT make_timestamp(win_start_us) AS win_start, user_id, cnt, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5"""),
    "Exact sliding-window top-5 users via pane decomposition — per-key counts add losslessly, no sketch needed.")

  /** APPROXIMATE pane plan for sliding-window top-k — the KEY-FREE
    * window stage the exact w2d cannot have. The w2d soak showed the
    * honest bound of exact top-k: its per-(pane, user) count cells are
    * key-proportional, so the window merge shuffles (and a streaming
    * stage-2/3 holds) one cell per active user per window. This variant
    * caps everything that leaves a pane at m + depth×width CELLS
    * regardless of user cardinality: per pane it keeps (a) the exact
    * top-`m` candidate ids (graft_topk — map tasks collapse to m-entry
    * heaps) and (b) a depth×width Count-Min sketch of ALL users (the
    * same md5-salted CMS as q_cms_topk, so the oracle recomputes it
    * bit-for-bit); windows then union candidate ids and SUM sketch
    * cells (CMS is mergeable), estimate each candidate's window count
    * from the merged sketch (min over depth rows), and rank top-k.
    * Approximation surface, stated: a window's true heavy hitter is
    * missed only if it cracks no pane's top-m (m = 3k default), and
    * estimates carry CMS collision inflation — the classic
    * panes+candidates trade for dropping per-key state; the DuckDB
    * oracle recomputes the identical algorithm, so the gate checks the
    * estimator bit-for-bit, collisions included.
    *
    * Choosing m (measured, PaneSkewPropertySpec): a window's top-k key
    * is covered iff it cracks top-m in AT LEAST ONE covering pane, so
    * the minimal sufficient m for a workload is the max over window
    * winners of their best per-pane rank. Under Zipf skew s in
    * {1, 1.5, 2} with 3 pane-confined hot-key bursts the boundary
    * measured m* = 5-6 at k = 5 — heavy hitters are pane-heavy, and
    * each pane-confined burst displaces at most one candidate slot, so
    * budget m ~ k + expected bursts per pane; the 3k default carries
    * ~2k slots of burst headroom. Two caveats the spec pins: (1) NO
    * fixed m survives a spread-thin adversary (a key persistently
    * ranked just below m in every pane while per-pane bursts hold the
    * top slots wins the window unseen — the inherent limit of
    * panes+candidates; the spec constructs it and locates the failure
    * at exactly m = its pane rank); (2) near-ties at the window rank-k
    * boundary are split by estimate order, not true-count order, so
    * tie groups straddling rank k come back in estimator order —
    * approximate top-k cannot preserve an exact tiebreak. */
  def slidingTopkCmsPane(ev: DataFrame, k: Int = 5, m: Int = 15,
      p: PaneParams = PaneParams.default): DataFrame = {
    val base = ev.select(expr(p.paneExpr()).as("pane"), col("user_id"))
    // per-(pane, user) exact counts — shared prefix of BOTH pane stages,
    // PINNED so the raw scan + (pane, user) exchange run once instead of
    // once per consumer (candidates + CMS cells). The pin holds one row
    // per active (pane, user) — the same cardinality the exact w2d
    // shuffles per window, distributed across executors, and it is
    // dropped when the query ends.
    val pc = graft.Checkpoints.pin(
      base.groupBy("pane", "user_id").agg(count(lit(1)).as("cnt")))
    // (a) exact per-pane candidates, collapsed to <= m rows per pane
    val cand = pc
      .groupBy("pane")
      .agg(graft.functions.GraftFunctions.topK(col("cnt"), col("user_id"), m).as("top"))
      .select(col("pane"), explode(col("top.id")).as("user_id"))
    // (b) per-pane CMS cells: depth rows x width buckets, <= 2048/pane.
    // Round-19 per-task fix (guide §1.2 step 2): the cell counts are
    // SUMS of the per-(pane, user) counts — bit-identical to counting
    // raw rows, since every event of one (pane, user) lands in the same
    // 4 buckets — so the depth salted md5 hashes run once per DISTINCT
    // (pane, user) instead of once per raw event row (4x|events| md5
    // calls collapsed to 4x|pane-user pairs|; the oracle keeps its
    // naive per-row form, an independent derivation of the same cells).
    val cells = pc
      .select(col("pane"), col("cnt"), posexplode(array(
        (0 until SketchOps.cmsDepth).map(SketchOps.cmsBucketS): _*)).as(Seq("j", "bucket")))
      .groupBy("pane", "j", "bucket").agg(sum(col("cnt")).as("c"))
    // window union of candidates / sum of sketch cells — bounded cells only
    val wCand = cand
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .select("win_start_us", "user_id").distinct()
    val wCells = cells
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("win_start_us", "j", "bucket").agg(sum(col("c")).as("c"))
    // estimate candidates from the merged window sketch: min over rows
    val est = wCand
      .select(col("win_start_us"), col("user_id"), posexplode(array(
        (0 until SketchOps.cmsDepth).map(SketchOps.cmsBucketS): _*)).as(Seq("j", "bucket")))
      .join(wCells, Seq("win_start_us", "j", "bucket"))
      .groupBy("win_start_us", "user_id").agg(min(col("c")).as("est"))
    val w = Window.partitionBy("win_start_us").orderBy(col("est").desc, col("user_id"))
    est.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(timestamp_micros(col("win_start_us")).as("win_start"),
        col("user_id"), col("est"), col("rnk").cast("long").as("rnk"))
  }

  private val w2e = GQuery(
    "w2e_sliding_cms_topk",
    (s, dir) => slidingTopkCmsPane(events(s, dir)),
    Some {
      val d = SketchOps.cmsDepth
      def bucketRows(src: String) = (0 until d).map(j =>
        s"SELECT *, $j AS j, ${SketchOps.cmsBucketD(j)} AS bucket FROM $src")
        .mkString("\n  UNION ALL ")
      s"""WITH p AS (SELECT (epoch_us(ts) // $slideUs) * $slideUs AS pane, user_id FROM events),
pc AS (SELECT pane, user_id, count(*) AS cnt FROM p GROUP BY 1, 2),
cand AS (SELECT pane, user_id FROM (
  SELECT pane, user_id, row_number() OVER (PARTITION BY pane ORDER BY cnt DESC, user_id) AS r
  FROM pc) WHERE r <= 15),
cells AS (SELECT pane, j, bucket, count(*) AS c FROM (
  ${bucketRows("p")}) GROUP BY 1, 2, 3),
wins AS (SELECT unnest(range(${paneK})) AS i),
wcand AS (SELECT DISTINCT pane - i * $slideUs AS win_start_us, user_id FROM cand, wins),
wcells AS (SELECT pane - i * $slideUs AS win_start_us, j, bucket, CAST(sum(c) AS BIGINT) AS c
           FROM cells, wins GROUP BY 1, 2, 3),
cb AS (${bucketRows("wcand")}),
est AS (SELECT win_start_us, user_id, min(c) AS est
        FROM cb JOIN wcells USING (win_start_us, j, bucket) GROUP BY 1, 2),
r AS (SELECT win_start_us, user_id, est,
             row_number() OVER (PARTITION BY win_start_us ORDER BY est DESC, user_id) AS rnk
      FROM est)
SELECT make_timestamp(win_start_us) AS win_start, user_id, est, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5"""
    },
    "Approximate sliding top-k via pane-shared CMS + candidate union: everything leaving a pane is m + depth*width cells, key-count-free.")

  val all: Seq[GQuery] = Seq(w2b, w2c, w2d, w2e)
}
