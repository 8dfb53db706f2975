package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GQuery, Tables}

/** The remaining TPC-H query shapes, adapted to the fixture schema (no
  * partsupp / l_shipmode / l_commitdate / c_phone / p_container columns —
  * each query keeps the ORIGINAL engine-stressing shape and swaps the
  * missing column for an available one). Together with q1/q3/q5/q6/q8/
  * q10/q14 in [[RelationalOps]] this covers every TPC-H plan family that
  * the fixture schema can express: exists/not-exists semi joins, nation
  * cross-pair volume, multi-dim profit, CASE-sum over join, outer-join
  * histogram, max-of-agg selection, distinct-count grouping, correlated
  * per-group average, group-HAVING-into-join, disjunctive scan predicates,
  * and scalar-average anti-join.
  *
  * Determinism discipline (see SURVEY.md + BASELINE.md): every money sum is
  * integer-scaled (x100 for 2-dp columns, x10000 for price*(1-disc)
  * products) into exact BIGINT sums on BOTH engines before any division,
  * every ranking rounds its float key first and carries a unique-key
  * tiebreak, and correlated-average comparisons are cross-multiplied into
  * pure integer arithmetic so no engine ever compares float quotients.
  */
object TpchOps {

  private def t(name: String)(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, name)

  // TPC-H Q4-style: order-priority checking. The original counts orders
  // with a late lineitem (commit < receipt); the fixture has no commit/
  // receipt dates, so the EXISTS predicate becomes "has a returned item"
  // (l_returnflag = 'R') — the same shape: date-windowed orders scan,
  // EXISTS-semi-join against the big fact, tiny grouped count. Scale: the
  // semi join shuffles on orderkey once; the date filter pushes to the
  // orders scan; LEFT SEMI keeps the build side at one bit per match.
  private val q4 = GQuery(
    "q4_priority_count",
    (s, dir) => {
      val o = t("orders")(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = t("lineitem")(s, dir).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority"""))

  // TPC-H Q7-style: volume shipping between two nations, both directions,
  // per ship year. Scale shape: lineitem->orders shuffles on orderkey,
  // orders->customer on custkey, supplier joins on suppkey; both nation
  // dims broadcast, and the pair filter prunes to 2 of N^2 nation pairs
  // BEFORE the aggregate. Volumes integer-scale x10000 -> exact long sums.
  private val q7 = GQuery(
    "q7_volume_shipping",
    (s, dir) => {
      val l = t("lineitem")(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = t("orders")(s, dir)
      val c = t("customer")(s, dir)
      val su = t("supplier")(s, dir)
      val sn = t("nation")(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val cn = t("nation")(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7")
          || (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .select(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          expr("CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT)").as("v"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(round(expr("CAST(sum(v) AS DOUBLE) / 10000e0") + lit(1e-9), 2).as("revenue"))
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
             / 10000e0 + 1e-9, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY 1, 2, 3"""))

  // TPC-H Q9-style: product-type profit per supplier nation per year. The
  // original's cost term ps_supplycost * l_quantity has no partsupp here;
  // p_retailprice * l_quantity keeps the same two-term profit shape.
  // Exactness: revenue scales x10000; the cost term is a 2-dp price x an
  // integer quantity, so round(p_retailprice*100)*100*qty is the SAME
  // x10000 integer — the whole profit stays in exact BIGINT until the one
  // final division. Scale: the name-filtered part dim broadcasts into the
  // lineitem scan; supplier joins on suppkey; nation broadcasts.
  private val q9 = GQuery(
    "q9_product_profit",
    (s, dir) => {
      val p = t("part")(s, dir).filter(col("p_name").contains("gear"))
        .select(col("p_partkey"), col("p_retailprice"))
      val l = t("lineitem")(s, dir)
      val su = t("supplier")(s, dir)
      val n = t("nation")(s, dir)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"),
          (expr("CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT)")
            - expr("CAST(round(p_retailprice * 100e0) AS BIGINT) * 100 * CAST(l_quantity AS BIGINT)"))
            .as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(round(expr("CAST(sum(amount) AS DOUBLE) / 10000e0") + lit(1e-9), 2).as("sum_profit"))
    },
    Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                      - CAST(round(p_retailprice * 100) AS BIGINT) * 100 * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 10000e0 + 1e-9, 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2"""))

  // TPC-H Q12-style: shipping-priority audit. The original splits line
  // counts by l_shipmode; the fixture has no shipmode, so the split key
  // becomes l_linestatus — the same CASE-sum-over-join shape: a date-
  // windowed fact scan joined to orders on orderkey, counting high-
  // priority (URGENT/HIGH) vs lower-priority orders per group. Counts
  // only — exact by construction.
  private val q12 = GQuery(
    "q12_priority_lines",
    (s, dir) => {
      val l = t("lineitem")(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val o = t("orders")(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT"
            || col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
    },
    Some("""SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus"""))

  // TPC-H Q13-style: customer order-count distribution. Left outer join
  // so zero-order customers land in the c_count=0 bucket, then a second
  // aggregation histograms the counts. Scale shape: two shuffles (custkey,
  // then c_count) over row counts that shrink at each step — the classic
  // two-level aggregate. Counts only — exact.
  private val q13 = GQuery(
    "q13_cust_order_dist",
    (s, dir) => {
      val c = t("customer")(s, dir).select(col("c_custkey"))
      val o = t("orders")(s, dir).filter(col("o_orderstatus") =!= "F")
        .select(col("o_orderkey"), col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""WITH co AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist FROM co GROUP BY c_count"""))

  // TPC-H Q15-style: top supplier(s) by quarterly revenue. Revenue per
  // supplier integer-scales x10000 so the max-selection compares exact
  // longs (float revenue ties could otherwise differ across engines); the
  // 1-row max broadcasts back against the per-supplier aggregate (a
  // constant-size nested-loop build — whitelisted in PlanHygieneSpec).
  // Scale: the aggregate shrinks lineitem to one row per supplier before
  // anything global happens; supplier names arrive by broadcast join.
  private val q15 = GQuery(
    "q15_top_supplier",
    (s, dir) => {
      val rev = t("lineitem")(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"),
          expr("CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT)").as("v"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("v")).as("total_v"))
        // pinned: rev feeds both the max and the winner join (twice the
        // date-pruned scan + aggregation otherwise)
        .transform(graft.Checkpoints.pin(_))
      val mx = rev.agg(max(col("total_v")).as("max_v"))
      val su = t("supplier")(s, dir).select(col("s_suppkey"), col("s_name"))
      rev.join(broadcast(mx), col("total_v") === col("max_v"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(expr("CAST(total_v AS DOUBLE) / 10000e0") + lit(1e-9), 2).as("total_revenue"))
    },
    Some("""WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_v
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       round(CAST(total_v AS DOUBLE) / 10000e0 + 1e-9, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_v = (SELECT max(total_v) FROM rev)"""))

  // TPC-H Q16-style: supplier variety per part group. The original counts
  // distinct suppliers per (brand, type, size) through partsupp; the link
  // here is the lineitem fact itself. Scale shape: the filtered part dim
  // broadcasts into the fact scan, then a two-phase distinct aggregate
  // (partial dedup of (group, suppkey) pairs before the final count) —
  // Spark plans exactly that for countDistinct. Counts only — exact.
  private val q16 = GQuery(
    "q16_supplier_variety",
    (s, dir) => {
      val p = t("part")(s, dir)
        .filter(col("p_type") =!= "PROMO" && col("p_brand") =!= "Brand#5"
          && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      t("lineitem")(s, dir).select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_brand <> 'Brand#5' AND p_size <= 10
GROUP BY 1, 2"""))

  // TPC-H Q17-style: small-quantity-order revenue. The correlated
  // "quantity < 0.2 * avg(quantity for this part)" cross-multiplies into
  // pure integers: qty*5*cnt < sum_qty (l_quantity is integer-valued) —
  // no float quotient on either engine, so the cut line is exact. The
  // brand filter replaces the missing container predicate. Scale shape:
  // the brand-filtered part dim broadcasts into the fact scan TWICE (once
  // for the per-part stats, once for the probe); the stats join is
  // per-partkey and arrives by broadcast at this dim size (shuffle at
  // 100 TB — the partkey co-partitioning holds either way).
  private val q17 = GQuery(
    "q17_small_qty_revenue",
    (s, dir) => {
      val p = t("part")(s, dir).filter(col("p_brand") === "Brand#12")
        .select(col("p_partkey"))
      val li = t("lineitem")(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey").as("k"), col("l_quantity"), col("l_extendedprice"))
        // pinned: li feeds both the per-part stats and the final filter
        // join; the frame is one brand's lineitems (narrow 3 columns),
        // orders of magnitude under the fact scan it saves re-running
        .transform(graft.Checkpoints.pin(_))
      val stats = li.groupBy(col("k")).agg(
        sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_q"),
        count(lit(1)).as("cnt_q"))
      li.join(stats.withColumnRenamed("k", "sk"), col("k") === col("sk"))
        .filter(expr("CAST(l_quantity AS BIGINT) * 5 * cnt_q < sum_q"))
        .select(expr("CAST(round(l_extendedprice * 100e0) AS BIGINT)").as("v"))
        .agg(count(lit(1)).as("n_items"),
          round(expr("CAST(sum(v) AS DOUBLE) / 100e0 / 7e0") + lit(1e-9), 2)
            .as("avg_yearly"))
    },
    Some("""WITH li AS (
  SELECT p_partkey AS k, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'),
stats AS (
  SELECT k, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
         count(*) AS cnt_q
  FROM li GROUP BY k)
SELECT count(*) AS n_items,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 100e0 / 7e0 + 1e-9, 2) AS avg_yearly
FROM li JOIN stats USING (k)
WHERE CAST(l_quantity AS BIGINT) * 5 * cnt_q < sum_q"""))

  // TPC-H Q18-style: large-volume orders (sum of quantities over a
  // threshold), top-100 by order value. The HAVING aggregate feeds a join
  // back against orders+customer; quantities are integer-exact, the
  // ranking key rounds o_totalprice to its 2-dp storage precision first
  // and breaks ties on o_orderkey, and the date is emitted as a string so
  // both engines hash identical values. Scale: the qty aggregate shrinks
  // lineitem to one row per qualifying order BEFORE the 3-way join.
  private val q18 = GQuery(
    "q18_large_volume",
    (s, dir) => {
      val big = t("lineitem")(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
        .filter(col("sum_qty") > 190L)
      val o = t("orders")(s, dir)
      val c = t("customer")(s, dir).select(col("c_custkey"), col("c_name"))
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          round(col("o_totalprice"), 2).as("total"),
          col("sum_qty"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 190)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       round(o_totalprice, 2) AS total, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total DESC, o_orderkey
LIMIT 100"""))

  // TPC-H Q19-style: discounted revenue under a disjunction of
  // (brand, size-band, quantity-band) conjunctions — the predicate-
  // pushdown stress test. The whole filter evaluates inside the joined
  // scan (part broadcasts); revenue integer-scales x10000. The three arms
  // OR at the row level exactly as the original.
  private val q19 = GQuery(
    "q19_disjunctive_revenue",
    (s, dir) => {
      val p = t("part")(s, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = t("lineitem")(s, dir)
      val arm1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)
      val arm2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)
      val arm3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(arm1 || arm2 || arm3)
        .select(expr("CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT)").as("v"))
        .agg(count(lit(1)).as("n_items"),
          round(expr("CAST(sum(v) AS DOUBLE) / 10000e0") + lit(1e-9), 2).as("revenue"))
    },
    Some("""SELECT count(*) AS n_items,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
             / 10000e0 + 1e-9, 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""))

  // TPC-H Q22-style: idle wealthy customers. The original's phone-prefix
  // filter becomes a nation-key filter, and "has no orders" becomes
  // "never placed a LARGE order" (o_totalprice > 400k — in this fixture
  // every customer has orders, so the unfiltered anti join is vacuously
  // empty at every SF; the filtered form keeps Q22's exact plan shape
  // with a non-trivial result). Customers above the average positive
  // balance, anti-joined, grouped by nation. The average comparison
  // cross-multiplies into exact integers: bal_c * cnt > sum_c over
  // x100-scaled balances — no float quotient. The 1-row (sum, count)
  // scalar broadcasts (whitelisted); the anti join shuffles on custkey
  // once, and the totalprice filter pushes to the orders scan.
  private val q22 = GQuery(
    "q22_idle_balance",
    (s, dir) => {
      val c = t("customer")(s, dir)
        .filter(col("c_nationkey") <= 4)
        .select(col("c_custkey"), col("c_nationkey"),
          expr("CAST(round(c_acctbal * 100e0) AS BIGINT)").as("bal_c"))
        // pinned: c feeds both the average stats and the anti-join probe
        .transform(graft.Checkpoints.pin(_))
      val avgStats = c.filter(col("bal_c") > 0L)
        .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("cnt_c"))
      val o = t("orders")(s, dir)
        .filter(col("o_totalprice") > 400000e0).select(col("o_custkey"))
      c.join(broadcast(avgStats))
        .filter(col("bal_c") * col("cnt_c") > col("sum_c"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(expr("CAST(sum(bal_c) AS DOUBLE) / 100e0") + lit(1e-9), 2).as("totacctbal"))
    },
    Some("""WITH c AS (
  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey <= 4),
avg_stats AS (
  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS cnt_c
  FROM c WHERE bal_c > 0)
SELECT c_nationkey, count(*) AS numcust,
       round(CAST(sum(bal_c) AS DOUBLE) / 100e0 + 1e-9, 2) AS totacctbal
FROM c, avg_stats
WHERE bal_c * cnt_c > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_nationkey"""))

  // TPC-H Q2-style: minimum-cost supplier per part. The original's
  // ps_supplycost has no partsupp table here; the per-(part, supplier)
  // unit cost derives from the fact table instead — total scaled price
  // integer-DIVIDED by total quantity (both exact longs, so the quotient
  // is the same integer on both engines; no float division anywhere).
  // The min-selection joins back on (partkey, cost) — ties keep ALL
  // minimal suppliers (no ranking cut, so no tiebreak is needed; the
  // hash compare is order-insensitive). Scale: per-(part,supp) aggregate
  // shrinks the fact first; the min re-aggregates per part; both joins
  // are equi joins on partkey.
  private val q2 = GQuery(
    "q2_min_cost_supplier",
    (s, dir) => {
      val p = t("part")(s, dir).filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_name"))
      // pinned: `pl` feeds BOTH the per-part minimum and the final join,
      // and unpinned Catalyst re-ran the lineitem scan + broadcast join
      // + aggregation for each consumer (round-19; the frame is one row
      // per (filtered part, supplier) — orders of magnitude smaller
      // than lineitem at any scale)
      val pl = t("lineitem")(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
        .agg(expr("CAST(sum(CAST(round(l_extendedprice * 100e0) AS BIGINT)) * 1000 div sum(CAST(l_quantity AS BIGINT)) AS BIGINT)")
          .as("unit_cost_scaled"))
        .transform(graft.Checkpoints.pin(_))
      val mn = pl.groupBy(col("p_partkey").as("mk"))
        .agg(min(col("unit_cost_scaled")).as("min_cost"))
      val su = t("supplier")(s, dir).select(col("s_suppkey"), col("s_name"))
      pl.join(mn, col("p_partkey") === col("mk") && col("unit_cost_scaled") === col("min_cost"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
          round(expr("CAST(unit_cost_scaled AS DOUBLE) / 100000e0") + lit(1e-9), 4)
            .as("unit_cost"))
    },
    Some("""WITH pl AS (
  SELECT p_partkey, p_name, l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 1000
              // sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS unit_cost_scaled
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 15 AND p_type = 'LARGE'
  GROUP BY 1, 2, 3),
mn AS (SELECT p_partkey AS mk, min(unit_cost_scaled) AS min_cost FROM pl GROUP BY 1)
SELECT p_partkey, p_name, s_suppkey, s_name,
       round(CAST(unit_cost_scaled AS DOUBLE) / 100000e0 + 1e-9, 4) AS unit_cost
FROM pl
JOIN mn ON p_partkey = mk AND unit_cost_scaled = min_cost
JOIN supplier ON l_suppkey = s_suppkey"""))

  // TPC-H Q11-style: important-part value concentration. The original
  // filters partsupp stock value above a fraction of the national total;
  // here each part's total lineitem value plays that role: parts whose
  // value exceeds 0.07% of the grand total. The share compare cross-
  // multiplies into exact longs (v * 10000 > total * 7) — no float
  // threshold. The 1-row grand total broadcasts (whitelisted constant
  // build side). Scale: one partkey aggregate + one scalar.
  private val q11 = GQuery(
    "q11_important_parts",
    (s, dir) => {
      val pv = t("lineitem")(s, dir)
        .select(col("l_partkey"),
          expr("CAST(round(l_extendedprice * 100e0) AS BIGINT)").as("v"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("v")).as("pv"))
        // pinned: pv feeds both the grand total and the filter join —
        // unpinned, the full lineitem scan + part aggregation ran twice
        .transform(graft.Checkpoints.pin(_))
      val tot = pv.agg(sum(col("pv")).as("total_v"))
      pv.join(broadcast(tot))
        .filter(col("pv") * 10000L > col("total_v") * 7L)
        .select(col("l_partkey"),
          round(expr("CAST(pv AS DOUBLE) / 100e0") + lit(1e-9), 2).as("part_value"))
    },
    Some("""WITH pv AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS pv
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(pv) AS BIGINT) AS total_v FROM pv)
SELECT l_partkey, round(CAST(pv AS DOUBLE) / 100e0 + 1e-9, 2) AS part_value
FROM pv, tot
WHERE pv * 10000 > total_v * 7"""))

  // TPC-H Q20-style: suppliers with excess shipments. The original finds
  // suppliers whose stock of name-matched parts exceeds half a year's
  // shipments; without partsupp the shape inverts to "suppliers who
  // shipped more than a threshold of name-matched parts in the year" —
  // the same broadcast-dim + supplier-keyed HAVING aggregate feeding a
  // dim join. Quantities are integer-exact. Scale: part broadcasts into
  // the date-pruned fact scan; one suppkey aggregate; nation broadcasts.
  private val q20 = GQuery(
    "q20_excess_shippers",
    (s, dir) => {
      val p = t("part")(s, dir).filter(col("p_name").contains("gear"))
        .select(col("p_partkey"))
      val qty = t("lineitem")(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("total_qty"))
        .filter(col("total_qty") > 400L)
      val su = t("supplier")(s, dir)
      val n = t("nation")(s, dir)
      qty.join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("total_qty"))
    },
    Some("""WITH qty AS (
  SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%gear%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1
  HAVING sum(CAST(l_quantity AS BIGINT)) > 400)
SELECT s_suppkey, s_name, n_name, total_qty
FROM qty JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey"""))

  // TPC-H Q21-style: the supplier who kept the order waiting. The
  // original finds lineitems late from exactly one supplier in multi-
  // supplier orders; without receipt dates the "at fault" marker becomes
  // the return flag: orders touched by >1 supplier where EXACTLY ONE
  // supplier had returned items, attributed to that supplier. Two
  // aggregate levels replace the EXISTS/NOT-EXISTS pair — the
  // (order, supplier) rollup computes the per-supplier flag, the order
  // rollup counts suppliers and flags and extracts the sole culprit via
  // max(CASE) (well-defined because the filter pins the count to one).
  // All counts — exact. Scale: two shuffles over shrinking keys.
  private val q21 = GQuery(
    "q21_waiting_supplier",
    (s, dir) => {
      val os = t("lineitem")(s, dir)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      val culprit = os.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("r")).as("n_r"),
          max(when(col("r") === 1L, col("l_suppkey"))).as("culprit_key"))
        .filter(col("n_supp") > 1L && col("n_r") === 1L)
      val su = t("supplier")(s, dir).select(col("s_suppkey"), col("s_name"))
      culprit.join(broadcast(su), col("culprit_key") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    },
    Some("""WITH os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem GROUP BY 1, 2),
culprit AS (
  SELECT l_orderkey, max(CASE WHEN r = 1 THEN l_suppkey END) AS culprit_key
  FROM os GROUP BY 1
  HAVING count(*) > 1 AND CAST(sum(r) AS BIGINT) = 1)
SELECT s_name, count(*) AS numwait
FROM culprit JOIN supplier ON culprit_key = s_suppkey
GROUP BY s_name"""))

  val all: Seq[GQuery] =
    Seq(q2, q4, q7, q9, q11, q12, q13, q15, q16, q17, q18, q19, q20, q21, q22)
}
