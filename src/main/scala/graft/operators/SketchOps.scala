package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}
import graft.functions.GraftFunctions

/** Sketch- and sampling-based operators: the fixed-memory summaries a
  * 100 TB pipeline uses where exact per-key state would not fit. Beyond
  * the reference surface (its aggregations are exact, SURVEY.md §2.5);
  * these follow the same cross-engine-determinism discipline as
  * [[TextOps]] / `q_hll_sketch`: every hash derives from md5, so the
  * DuckDB oracle recomputes the identical sketch bit-for-bit.
  *
  * Scale theme: each sketch is a constant-size, mergeable aggregate —
  * partial aggregation collapses it map-side, the merged summary
  * broadcasts, and the big side is never shuffled on a per-key basis.
  */
object SketchOps {

  private def t(name: String)(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, name)

  /** 48-bit md5 base hash, DuckDB side (== GraftFunctions.md5Hash48). */
  private[operators] def hD48(x: String) = s"(('0x'||substr(md5($x),1,12))::BIGINT)"

  // ---------------------------------------------------------------------
  // Count-Min-Sketch heavy hitters. depth 4 x width 512 counters — 2 KiB
  // of state regardless of input size. Each row uses its own md5-derived
  // base hash, salted with the row index ("j:key"), so the four rows are
  // genuinely independent. (An earlier revision used affine transforms
  // (a*h + b) mod P of ONE shared hash — but with a <= 11 and h < 2^48
  // the product never wraps P, so the mod was a no-op and odd `a` made
  // every row's bucket a bijection of h mod 512: keys collided in all
  // four rows or none, and the depth gave zero protection over depth 1.)
  private[graft] val cmsW = 512
  private[graft] val cmsDepth = 4
  /** Row-j bucket, Spark side: md5_48("j:" + key) % W. */
  private[graft] def cmsBucketS(j: Int): Column =
    GraftFunctions.md5Hash48(expr(s"concat('$j:', cast(user_id AS string))")) % cmsW
  /** Row-j bucket, DuckDB side — same value bit-for-bit. */
  private[graft] def cmsBucketD(j: Int): String =
    s"${hD48(s"'$j:' || CAST(user_id AS VARCHAR)")} % $cmsW"

  /** The sketch update stream is a posexplode into (row, bucket) cells,
    * aggregated to <= depth*width rows by partial+final hash agg — the
    * shuffle moves at most 4*512 cells per map task, NOT the input. The
    * merged 2 KiB sketch is collected (bounded: depth*width counters
    * regardless of input size) and broadcast as an array. Candidates then
    * come from PER-PARTITION top-k heaps: each input partition dedups its
    * users locally, probes the broadcast sketch (min over rows, pure JVM
    * kernel — the same `TextHashUtil.hash48` the Catalyst expression
    * compiles to), and emits only its k strongest (est desc, user asc)
    * candidates. Because a user's estimate is a pure function of the
    * GLOBAL sketch, the true top-k each appear in some partition's local
    * top-k, so the k*P merge is exact — and, unlike the previous global
    * `(user, j, bucket)` distinct, NOTHING key-proportional ever crosses
    * a shuffle: the only wide stages move <= 2048 sketch cells and
    * <= k*P candidate rows. The trailing tiny groupBy dedups users that
    * were local winners in several partitions. The oracle recomputes the
    * identical sketch in SQL, so the comparison covers the estimator
    * itself, collisions included. */
  private val qCmsTopk = GQuery(
    "q_cms_topk",
    (s, dir) => {
      import s.implicits._
      val k = 20
      val base = t("events")(s, dir).select(col("user_id"))
      val cells = array((0 until cmsDepth).map(cmsBucketS): _*)
      val sk = Array.ofDim[Long](cmsDepth, cmsW)
      base.select(posexplode(cells).as(Seq("j", "bucket")))
        .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))
        .collect() // bounded: <= depth*width = 2048 rows, input-size-independent
        .foreach(r => sk(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
      val skB = s.sparkContext.broadcast(sk)
      val candidates = base.as[Long].mapPartitions { it =>
        val sketch = skB.value
        val seen = new java.util.HashSet[Long]()
        // Max-heap whose root is the WEAKEST candidate (smallest est,
        // then largest user), so replacement keeps the local top-k.
        val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
          Ordering.by { (t: (Long, Long)) => (-t._1, t._2) })
        def est(uid: Long): Long = {
          var m = Long.MaxValue
          var j = 0
          while (j < cmsDepth) {
            val h = graft.functions.TextHashUtil.hash48(
              (j.toString + ":" + uid.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val c = sketch(j)(((h % cmsW) + cmsW).toInt % cmsW)
            if (c < m) m = c
            j += 1
          }
          m
        }
        it.foreach { uid =>
          if (seen.add(uid)) {
            val e = est(uid)
            if (heap.size < k) heap.enqueue((e, uid))
            else {
              val (re, ru) = heap.head
              if (e > re || (e == re && uid < ru)) { heap.dequeue(); heap.enqueue((e, uid)) }
            }
          }
        }
        heap.iterator.map { case (e, uid) => (uid, e) }
      }.toDF("user_id", "est")
      candidates
        .groupBy(col("user_id")).agg(min(col("est")).as("est")) // est identical per user; dedup cross-partition winners
        .orderBy(col("est").desc, col("user_id")).limit(k)
    },
    Some {
      val unions = (0 until cmsDepth).map(j =>
        s"SELECT $j AS j, ${cmsBucketD(j)} AS bucket, user_id FROM events").mkString("\n  UNION ALL ")
      s"""WITH cells AS (
  $unions),
sk AS (SELECT j, bucket, count(*) AS c FROM cells GROUP BY 1, 2),
k AS (SELECT DISTINCT j, bucket, user_id FROM cells),
est AS (SELECT user_id, min(c) AS est FROM k JOIN sk USING (j, bucket) GROUP BY 1)
SELECT user_id, est FROM est ORDER BY est DESC, user_id LIMIT 20"""
    },
    "Count-Min-Sketch heavy hitters, oracle recomputes the sketch bit-for-bit.")

  // ---------------------------------------------------------------------
  // Bloom-prefiltered semi join. The 1024-bucket x 64-bit bloom bitmap of
  // the dim-side keys (8 KiB) is built with one tiny aggregation and
  // broadcast; the fact side tests membership BEFORE its semi-join
  // shuffle, so at 100 TB the shuffle carries only probable matches
  // (false-positive rate ~ |keys|/65536 here). The trailing exact semi
  // join removes false positives, which is why the oracle is the plain
  // semi join: the bloom stage is performance-transparent by construction
  // — the manual version of Spark's runtime row-level filtering, usable
  // where that rule does not fire (non-equi pre-aggregations, DSv2
  // sources without runtime-filter support).
  private val qBloomSemi = GQuery(
    "q_bloom_semi",
    (s, dir) => {
      val cust = t("customer")(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ch = cust.select(col("c_custkey"),
        GraftFunctions.md5Hash48(expr("cast(c_custkey AS string)")).as("h"))
      val bloom = ch
        .selectExpr("h % 1024 AS bucket", "shiftleft(1L, cast((h div 1024) % 64 AS int)) AS bit")
        .groupBy(col("bucket")).agg(bit_or(col("bit")).as("mask"))
      val orders = t("orders")(s, dir)
        .withColumn("h", GraftFunctions.md5Hash48(expr("cast(o_custkey AS string)")))
        .withColumn("bucket", expr("h % 1024"))
      orders.join(broadcast(bloom), Seq("bucket"), "left")
        .filter(expr("(mask & shiftleft(1L, cast((h div 1024) % 64 AS int))) != 0"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")) + lit(1e-9), 2).as("total"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice) + 1e-9, 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY 1"""),
    "Broadcast bloom-bitmap prefilter ahead of the exact semi join.")

  // ---------------------------------------------------------------------
  // Weighted sample without replacement (Efraimidis–Spirakis): priority
  // ln(u)/w with u = (md5_48(doc_id) + 0.5) / 2^48, take the k largest.
  // Deterministic u makes the sample reproducible AND oracle-checkable;
  // only (doc_id, n_chars) are emitted so the float priority never enters
  // the cross-engine hash — and the SORT KEY itself is the priority
  // rounded to 9 decimals (+1e-9 pin) with a doc_id tiebreak, because
  // ln() is not bit-reproducible across engines and an unpinned 1-ulp
  // difference at the k-th boundary would select different members. TakeOrdered keeps it one pass, no global sort;
  // at 100 TB the same plan holds — per-partition k-heaps then a k*P
  // driver merge, the standard distributed weighted-reservoir shape.
  private val dWeightedSample = GQuery(
    "d_weighted_sample",
    (s, dir) =>
      t("documents")(s, dir)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          round(log((GraftFunctions.md5Hash48(expr("cast(doc_id AS string)")) + lit(0.5))
            / lit(281474976710656.0)) / col("n_chars") + lit(1e-9), 9).as("p"))
        .orderBy(col("p").desc, col("doc_id")).limit(100)
        .select(col("doc_id"), col("n_chars")),
    Some(s"""SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         round(ln((${hD48("CAST(doc_id AS VARCHAR)")} + 0.5) / 281474976710656.0) / n_chars + 1e-9, 9) AS p
  FROM documents WHERE n_chars > 0
  ORDER BY p DESC, doc_id LIMIT 100) t"""),
    "Deterministic Efraimidis–Spirakis weighted sample (weight = n_chars).")

  // ---------------------------------------------------------------------
  // Mergeable quantile sketch — [[org.apache.spark.sql.graftext.DecimalDDSketch]],
  // a custom TypedImperativeAggregate (the DDSketch idea on integer-exact
  // decimal buckets: bucket = (#digits, first two digits) of ⌊x⌋, ≤5%
  // relative error, constant ~1.4k-counter state). The 100 TB quantile
  // path: ONE pass, partial aggregation collapses each map task to a
  // fixed-size histogram before the shuffle — vs the exact two-phase rank
  // selection in q_percentiles which must shuffle value buckets. Because
  // the sketch merges by count addition it is merge-order-invariant, so
  // the DuckDB oracle recomputes the IDENTICAL estimates with plain
  // integer/string SQL — the estimates hash-match, no contract gate.
  private val qDdQuantiles = GQuery(
    "q_dd_quantiles",
    (s, dir) =>
      t("lineitem")(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.GraftFunctions.ddSketch(col("l_extendedprice")).as("sk"))
        .select(col("l_returnflag"), col("sk.n_vals").as("n_vals"),
          col("sk.q50").as("q50"), col("sk.q95").as("q95"), col("sk.q99").as("q99")),
    Some("""WITH v AS (SELECT l_returnflag AS flag,
                  least(l_extendedprice, 999999999999999.0) AS x
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
b AS (SELECT flag,
             CASE WHEN x < 1 THEN 0 ELSE
               len(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR)) * 100 +
               CASE WHEN floor(x) < 10 THEN CAST(floor(x) AS INTEGER) * 10
                    ELSE CAST(substr(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR), 1, 2) AS INTEGER) END
             END AS bk
      FROM v),
c AS (SELECT flag, bk, count(*) AS cnt FROM b GROUP BY 1, 2),
w AS (SELECT flag, bk,
             CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bk) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n FROM c),
q AS (SELECT flag, max(n) AS n_vals,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN bk END) AS b50,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN bk END) AS b95,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN bk END) AS b99
      FROM w GROUP BY 1)
SELECT flag AS l_returnflag, n_vals,
       CASE WHEN b50 = 0 THEN 0.5 ELSE ((b50 % 100) + 0.5) * pow(10, (b50 // 100) - 2) END AS q50,
       CASE WHEN b95 = 0 THEN 0.5 ELSE ((b95 % 100) + 0.5) * pow(10, (b95 // 100) - 2) END AS q95,
       CASE WHEN b99 = 0 THEN 0.5 ELSE ((b99 % 100) + 0.5) * pow(10, (b99 // 100) - 2) END AS q99
FROM q"""),
    "Mergeable decimal-DDSketch quantiles (custom TypedImperativeAggregate, ≤5% relative error, one pass).")

  // ---------------------------------------------------------------------
  // Parameterized quantiles from the same sketch — the q-list is an
  // ARGUMENT (`graft_dd_sketch_q(x, array(0.25D, 0.9D, 0.999D))`), not a
  // bake-in, so tail quantiles at 100 TB cost the identical constant
  // state as the median. Output is one row per (group, quantile index)
  // so every column stays scalar for the oracle hash; the estimates are
  // recomputed by DuckDB bit-for-bit exactly like q_dd_quantiles.
  private val ddqList = Seq(0.25, 0.9, 0.999)
  private val qDdQuantilesParam = GQuery(
    "q_dd_quantiles_param",
    (s, dir) =>
      t("lineitem")(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.GraftFunctions
          .ddSketchQ(col("l_extendedprice"), ddqList).as("sk"))
        .select(col("l_returnflag"), col("sk.n_vals").as("n_vals"),
          posexplode(col("sk.qs")))
        .select(col("l_returnflag"), col("n_vals"),
          col("pos").cast("long").as("q_idx"), col("col").as("est")),
    Some {
      val arms = ddqList.zipWithIndex.map { case (q, i) =>
        s"min(CASE WHEN cum >= greatest(1, CAST(ceil($q * n) AS BIGINT)) THEN bk END) AS bq$i"
      }.mkString(",\n             ")
      def rep(b: String) =
        s"CASE WHEN $b = 0 THEN 0.5 ELSE (($b % 100) + 0.5) * pow(10, ($b // 100) - 2) END"
      val caseArms = ddqList.indices.map(i => s"WHEN $i THEN ${rep(s"bq$i")}").mkString(" ")
      s"""WITH v AS (SELECT l_returnflag AS flag,
                  least(l_extendedprice, 999999999999999.0) AS x
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
b AS (SELECT flag,
             CASE WHEN x < 1 THEN 0 ELSE
               len(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR)) * 100 +
               CASE WHEN floor(x) < 10 THEN CAST(floor(x) AS INTEGER) * 10
                    ELSE CAST(substr(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR), 1, 2) AS INTEGER) END
             END AS bk
      FROM v),
c AS (SELECT flag, bk, count(*) AS cnt FROM b GROUP BY 1, 2),
w AS (SELECT flag, bk,
             CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bk) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n FROM c),
q AS (SELECT flag, max(n) AS n_vals,
             $arms
      FROM w GROUP BY 1)
SELECT flag AS l_returnflag, n_vals, i AS q_idx,
       CASE i $caseArms END AS est
FROM q, (SELECT unnest(range(${ddqList.length})) AS i) idx"""
    },
    "Parameterized DDSketch quantiles: arbitrary q-list argument, same constant-state one-pass sketch.")

  // ---------------------------------------------------------------------
  // WEIGHTED quantiles from the same constant-state sketch
  // ([[org.apache.spark.sql.graftext.DecimalDDSketchW]]): each value
  // counts its LONG weight times — the importance-weighted quantile a
  // curation pipeline needs (price weighted by quantity here; document
  // quality weighted by token count in a corpus). Integer weights keep
  // the histogram exact and merge-order-invariant, so the oracle
  // recomputes the estimates from sum(weight) bit-for-bit, exactly like
  // the unweighted variant.
  private val qDdQuantilesW = GQuery(
    "q_dd_quantiles_w",
    (s, dir) =>
      t("lineitem")(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.GraftFunctions
          .ddSketchW(col("l_extendedprice"), col("l_quantity").cast("long")).as("sk"))
        .select(col("l_returnflag"), col("sk.n_weight").as("n_weight"),
          col("sk.q50").as("q50"), col("sk.q95").as("q95"), col("sk.q99").as("q99")),
    Some("""WITH v AS (SELECT l_returnflag AS flag,
                  least(l_extendedprice, 999999999999999.0) AS x,
                  CAST(l_quantity AS BIGINT) AS w
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
             AND CAST(l_quantity AS BIGINT) > 0),
b AS (SELECT flag, w,
             CASE WHEN x < 1 THEN 0 ELSE
               len(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR)) * 100 +
               CASE WHEN floor(x) < 10 THEN CAST(floor(x) AS INTEGER) * 10
                    ELSE CAST(substr(CAST(CAST(floor(x) AS BIGINT) AS VARCHAR), 1, 2) AS INTEGER) END
             END AS bk
      FROM v),
c AS (SELECT flag, bk, CAST(sum(w) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
w AS (SELECT flag, bk,
             CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bk) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n FROM c),
q AS (SELECT flag, max(n) AS n_weight,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.50 * n) AS BIGINT)) THEN bk END) AS b50,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.95 * n) AS BIGINT)) THEN bk END) AS b95,
             min(CASE WHEN cum >= greatest(1, CAST(ceil(0.99 * n) AS BIGINT)) THEN bk END) AS b99
      FROM w GROUP BY 1)
SELECT flag AS l_returnflag, n_weight,
       CASE WHEN b50 = 0 THEN 0.5 ELSE ((b50 % 100) + 0.5) * pow(10, (b50 // 100) - 2) END AS q50,
       CASE WHEN b95 = 0 THEN 0.5 ELSE ((b95 % 100) + 0.5) * pow(10, (b95 // 100) - 2) END AS q95,
       CASE WHEN b99 = 0 THEN 0.5 ELSE ((b99 % 100) + 0.5) * pow(10, (b99 // 100) - 2) END AS q99
FROM q"""),
    "Weighted DDSketch quantiles (long weights, price-by-quantity): same one-pass constant state, oracle-recomputed bit-for-bit.")

  // ---------------------------------------------------------------------
  // HLL SET ALGEBRA — the sketch-union property q_hll_sketch's registers
  // buy beyond plain cardinality: registers of A ∪ B are the bucket-wise
  // MAX of A's and B's registers (no rescan of either side), and
  // |A ∩ B| ≈ |A| + |B| − |A ∪ B| by inclusion–exclusion. Audience
  // overlap between event types from ONE corpus pass: per-(type, bucket)
  // max-rho registers (map-side collapse to ≤ types×64 cells), densified
  // to 64-length arrays (absent bucket = empty register = rho 0), then
  // every type pair is a constant-size zip — nothing pair-proportional
  // ever touches the corpus. Same hash-deterministic m=64 sketch as
  // q_hll_sketch, so DuckDB recomputes every estimate bit-for-bit (each
  // 2^-rho term is an exact power of two; the ≤64-term sums are
  // order-exact in IEEE754, so engine sum order cannot matter).
  // Inclusion–exclusion can go slightly negative on disjoint sets (both
  // raw estimates carry +bias); reported raw, not clamped — the oracle
  // computes the identical value.
  private val hllM = RelationalOps.hllM
  private val qHllSetAlgebra = GQuery(
    "q_hll_set_algebra",
    (s, dir) => {
      val est = (si: Column) =>
        round(expr(s"0.709 * $hllM * $hllM") / si + lit(1e-9), 2)
      val sumInv = (regs: String) => expr(
        s"aggregate($regs, 0.0d, (acc, x) -> acc + 1.0 / cast(shiftleft(1L, x) AS double))")
      val regs = t("events")(s, dir)
        .select(col("event_type"),
          GraftFunctions.md5Hash48(col("user_id").cast("string")).as("h"))
        .selectExpr("event_type", s"h % $hllM AS bucket",
          s"${RelationalOps.hllRho("(h div 64)")} AS rho")
        .groupBy("event_type", "bucket")
        .agg(max(col("rho")).as("m"))
        .groupBy("event_type")
        .agg(map_from_entries(collect_list(struct(col("bucket"), col("m")))).as("mm"))
        .withColumn("regs", expr(
          s"transform(sequence(0, ${hllM - 1}), j -> coalesce(element_at(mm, j), 0L))"))
        .select(col("event_type"), col("regs"))
      val a = regs.select(col("event_type").as("type_a"), col("regs").as("ra"))
      val b = regs.select(col("event_type").as("type_b"), col("regs").as("rb"))
      a.join(b, col("type_a") < col("type_b"))
        .withColumn("ru", expr("zip_with(ra, rb, (x, y) -> greatest(x, y))"))
        .withColumn("sa", sumInv("ra")).withColumn("sb", sumInv("rb"))
        .withColumn("su", sumInv("ru"))
        .select(col("type_a"), col("type_b"),
          est(col("sa")).as("est_a"), est(col("sb")).as("est_b"),
          est(col("su")).as("est_union"),
          round(est(col("sa")) + est(col("sb")) - est(col("su")) + lit(1e-9), 2)
            .as("est_intersect"))
    },
    Some(s"""WITH h AS (SELECT event_type, (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT) AS h FROM events),
r AS (SELECT event_type, h % $hllM AS bucket, max(${RelationalOps.hllRho("(h // 64)")}) AS m
      FROM h GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type FROM events),
d AS (SELECT ty.event_type, x.j, coalesce(r.m, 0) AS m
      FROM ty CROSS JOIN (SELECT unnest(range($hllM)) AS j) x
      LEFT JOIN r ON r.event_type = ty.event_type AND r.bucket = x.j),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             sum(1.0 / (1::BIGINT << a.m)::DOUBLE) AS sa,
             sum(1.0 / (1::BIGINT << b.m)::DOUBLE) AS sb,
             sum(1.0 / (1::BIGINT << greatest(a.m, b.m))::DOUBLE) AS su
      FROM d a JOIN d b ON a.j = b.j AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT type_a, type_b,
       round(0.709 * $hllM * $hllM / sa + 1e-9, 2) AS est_a,
       round(0.709 * $hllM * $hllM / sb + 1e-9, 2) AS est_b,
       round(0.709 * $hllM * $hllM / su + 1e-9, 2) AS est_union,
       round(round(0.709 * $hllM * $hllM / sa + 1e-9, 2)
           + round(0.709 * $hllM * $hllM / sb + 1e-9, 2)
           - round(0.709 * $hllM * $hllM / su + 1e-9, 2) + 1e-9, 2) AS est_intersect
FROM p"""),
    "HLL set algebra: pairwise audience union (register max) + inclusion-exclusion intersection from one corpus pass.")

  val all: Seq[GQuery] = Seq(qCmsTopk, qBloomSemi, dWeightedSample,
    qDdQuantiles, qDdQuantilesParam, qDdQuantilesW, qHllSetAlgebra)
}
