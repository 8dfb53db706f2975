package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** w2e recall under adversarial skew (verdict r11 task 7). The fixture
  * pin ("every exact winner appears in the approximate top-5") says
  * nothing about WHEN the panes+candidates scheme fails; this spec maps
  * the boundary.
  *
  * The scheme misses a window's true top-k key u iff u cracks no
  * covering pane's top-m. So the minimal sufficient m for a dataset is
  * computable WITHOUT sweeping:
  *
  *   m* = max over (window W, u in exactTopK(W)) of
  *          min over panes p in W of rankInPane(p, u)
  *
  * (min over panes: u needs to be a candidate in at least ONE pane;
  * rank by cnt desc / user_id asc, the graft_topk order). The spec
  * derives m* for seeded Zipf traffic (s in {1, 1.5, 2}) with hot-key
  * bursts confined to single panes, asserts the default m = 3k covers
  * it, and re-runs the real operator end-to-end at both m* and the
  * default to confirm the boundary is real in both directions. A
  * deterministic spread-thin construction then shows NO fixed m
  * survives an adversary: a key persistently ranked just below m in
  * every pane while burst decoys (each confined to one pane) hold the
  * top slots is invisible to candidates yet wins the window — the
  * documented theoretical limit of panes+candidates, pinned at its
  * exact m boundary. */
class PaneSkewPropertySpec extends SparkSpec {

  private val p = PaneOps.PaneParams.default
  private val slideMs = p.slideUs / 1000L
  // pane-aligned base: 2024-01-01 00:00 UTC (multiple of the 30-min slide)
  private val t0 = 1704067200000L
  private val nPanes = 8

  private def toDf(rows: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (ms, uid) => (new Timestamp(ms), uid) }.toDF("ts", "user_id")
  }

  /** Zipf(s) over ranks 1..universe via inverse CDF, plus `bursts`
    * hot keys per pane, each confined to its pane (ids disjoint from
    * the Zipf universe), each heavy enough to own a top pane slot.
    * Burst counts are pairwise DISTINCT: an earlier revision gave all
    * bursts one count and produced a 12-way tie straddling the window
    * top-5 boundary, which an approximate estimator cannot split the
    * way the exact tiebreak does — tie instability at the k boundary
    * is inherent to approximate top-k and is not the recall property
    * under test here. */
  private def zipfBurstFixture(s: Double, seed: Long): DataFrame = {
    val universe = 2000
    val nZipf = 24000
    val burstsPerPane = 3
    val rnd = new scala.util.Random(seed)
    val cum = new Array[Double](universe)
    var acc = 0.0
    var r = 0
    while (r < universe) { acc += 1.0 / math.pow(r + 1, s); cum(r) = acc; r += 1 }
    def draw(): Long = {
      val x = rnd.nextDouble() * acc
      var lo = 0; var hi = universe - 1
      while (lo < hi) { val mid = (lo + hi) / 2; if (cum(mid) < x) lo = mid + 1 else hi = mid }
      lo + 1L
    }
    val zipf = Seq.fill(nZipf)((t0 + (rnd.nextLong(nPanes * slideMs).abs % (nPanes * slideMs)), draw()))
    val bursts = for {
      pane <- 0 until nPanes
      j <- 0 until burstsPerPane
      id = 10000000L + pane * 100L + j // unique to this pane
      _ <- 0 until (450 + 37 * (pane * burstsPerPane + j))
    } yield (t0 + pane * slideMs + rnd.nextLong(slideMs).abs % slideMs, id)
    toDf(zipf ++ bursts)
  }

  /** Exact sliding top-5 as (win_start_us, user_id) pairs. */
  private def exactTop5(df: DataFrame): DataFrame =
    PaneOps.slidingTopkPane(df, 5, p)
      .selectExpr("unix_micros(win_start) AS win_start_us", "user_id")

  /** m* as derived above — independent of the operator under test
    * (plain pane ranks + covering-window explosion). */
  private def requiredM(df: DataFrame): Int = {
    val paneRank = df
      .selectExpr(s"${p.paneExpr()} AS pane", "user_id")
      .groupBy("pane", "user_id").agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(
        Window.partitionBy("pane").orderBy(col("cnt").desc, col("user_id"))))
    val minPaneRank = paneRank
      .withColumn("win_start_us", explode(expr(p.coveringWindowsExpr)))
      .groupBy("win_start_us", "user_id").agg(min(col("r")).as("min_r"))
    exactTop5(df).join(minPaneRank, Seq("win_start_us", "user_id"))
      .agg(max(col("min_r"))).head().getInt(0)
  }

  /** (win, id) pairs of the exact top-5 missing from the approximate
    * top-5 at candidate budget m. */
  private def misses(df: DataFrame, m: Int): Set[(Long, Long)] = {
    val approx = PaneOps.slidingTopkCmsPane(df, 5, m, p)
      .selectExpr("unix_micros(win_start) AS win_start_us", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exactTop5(df).collect().map(r => (r.getLong(0), r.getLong(1))).toSet -- approx
  }

  test("Zipf s in {1, 1.5, 2} with pane-confined bursts: m* <= default 3k, end-to-end recall 1.0") {
    val boundaries = Seq(1.0 -> 7L, 1.5 -> 11L, 2.0 -> 13L).map { case (s, seed) =>
      val df = zipfBurstFixture(s, seed).cache()
      try {
        val mStar = requiredM(df)
        assert(mStar <= 15,
          s"Zipf s=$s: pane-rank boundary m*=$mStar exceeds the m=3k default")
        // end-to-end at the default: full recall (also guards the
        // estimator side — a CMS-collision re-rank would surface here)
        val missDefault = misses(df, 15)
        assert(missDefault.isEmpty,
          s"Zipf s=$s: exact winners missing at default m=15: ${missDefault.take(3)}")
        // the boundary is real end-to-end: recall holds AT m*
        assert(misses(df, mStar).isEmpty,
          s"Zipf s=$s: m*=$mStar derived as sufficient but operator missed winners")
        s -> mStar
      } finally df.unpersist()
    }
    info(s"empirical m boundaries (vs default m=15): " +
      boundaries.map { case (s, m) => s"Zipf(s=$s) m*=$m" }.mkString(", "))
  }

  test("spread-thin adversary: persistent key below every pane's top-m defeats any fixed m") {
    // One window's 4 panes. Key X: count 3 in EVERY pane (window total
    // 12). Per pane, 10 unique decoys with count 6 — each a hot-key
    // burst confined to its pane (window total 6 < 12). X is the exact
    // window winner but ranks 11th in every pane: candidates miss it
    // for m <= 10 and must find it for m >= 11. Pins the exact boundary
    // both directions, end-to-end.
    val rows = (for {
      pane <- 0 until p.k
      paneT0 = t0 + pane * slideMs
      burst = (0 until 10).flatMap(d =>
        Seq.fill(6)((paneT0 + (d + 1) * 60000L, 2000000L + pane * 100L + d)))
      x = Seq.fill(3)((paneT0 + 60000L, 1L))
    } yield burst ++ x).flatten
    val df = toDf(rows)
    val winStart = t0 * 1000L // µs — the window covering exactly panes 0..3
    def xInTop5(m: Int): Boolean =
      PaneOps.slidingTopkCmsPane(df, 5, m, p)
        .filter(col("user_id") === 1L)
        .selectExpr("unix_micros(win_start)")
        .collect().map(_.getLong(0)).contains(winStart)
    val exact = exactTop5(df).filter(col("win_start_us") === winStart)
      .orderBy("user_id").collect().map(_.getLong(1))
    assert(exact.contains(1L), "construction broken: X is not an exact winner")
    assert(requiredM(df) === 11, "construction broken: X's min pane rank is not 11")
    assert(!xInTop5(10), "m=10 should miss the spread-thin winner — candidate union leak?")
    assert(xInTop5(11), "m=11 covers X's pane rank yet the operator missed it")
  }
}
