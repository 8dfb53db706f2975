package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the TPC-H completion batch and the curation
  * operators added after it — cross-query consistency and range
  * properties the per-query DuckDB equality cannot express.
  */
class TpchInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q13 distribution sums to the customer count and bucket 0 matches the anti join") {
    val dist = q("q13_cust_order_dist").cache()
    val nCust = Tables.t(spark, sfDir, "customer").count()
    assert(dist.agg(sum("custdist")).head().getLong(0) === nCust)
    // zero-bucket = customers with no non-F orders, cross-checked directly
    val c = Tables.t(spark, sfDir, "customer").select(col("c_custkey"))
    val o = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderstatus") =!= "F").select(col("o_custkey"))
    val zero = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
    val bucket0 = dist.filter(col("c_count") === 0L)
      .agg(coalesce(sum("custdist"), lit(0L))).head().getLong(0)
    assert(bucket0 === zero)
    dist.unpersist()
  }

  test("q15 winners all carry the same maximal revenue") {
    val w = q("q15_top_supplier").cache()
    assert(w.count() >= 1)
    assert(w.select(countDistinct("total_revenue")).head().getLong(0) === 1L)
    w.unpersist()
  }

  test("q2 min-cost rows are minimal within their part") {
    // re-derive every (part, supplier) unit cost and check no cheaper
    // supplier exists for any emitted (part, cost) row
    val li = Tables.t(spark, sfDir, "lineitem")
    val p = Tables.t(spark, sfDir, "part")
      .filter(col("p_size") === 15 && col("p_type") === "LARGE")
      .select(col("p_partkey"))
    val costs = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey").as("k"), col("l_suppkey"))
      .agg(expr("CAST(sum(CAST(round(l_extendedprice * 100e0) AS BIGINT)) * 1000 div sum(CAST(l_quantity AS BIGINT)) AS BIGINT)").as("c"))
    val winners = q("q2_min_cost_supplier")
      .select(col("p_partkey").as("k"),
        expr("CAST(round(unit_cost * 100000e0) AS BIGINT)").as("wc"))
    val cheaper = winners.join(costs, "k").filter(col("c") < col("wc"))
    assert(cheaper.isEmpty)
  }

  test("q21 culprit counts sum to the qualifying-order count") {
    val byName = q("q21_waiting_supplier").agg(coalesce(sum("numwait"), lit(0L)))
      .head().getLong(0)
    val li = Tables.t(spark, sfDir, "lineitem")
    val orders = li.groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum("r").as("nr"))
      .filter(col("ns") > 1L && col("nr") === 1L).count()
    assert(byName === orders)
  }

  test("q4 counts bound above by the window's order count") {
    val counted = q("q4_priority_count").agg(coalesce(sum("order_count"), lit(0L)))
      .head().getLong(0)
    val windowOrders = Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp")).count()
    assert(counted <= windowOrders)
  }

  test("q22 idle customers really have no orders and sit above the average balance") {
    val out = q("q22_idle_balance").cache()
    assert(out.filter(col("numcust") < 1).isEmpty)
    // every group's total balance is positive (members are above the
    // positive-balance average by construction)
    assert(out.filter(col("totacctbal") <= 0).isEmpty)
    out.unpersist()
  }

  test("d_quality_prune keeps between half and all docs per language, cutoff in [0,1]") {
    val r = q("d_quality_prune").cache()
    assert(r.filter(col("n_kept") > col("n_total")).isEmpty)
    // p25 cutoff keeps the cutoff bucket itself, so kept >= 1/2 is a
    // safe lower bound even under heavy ties; exact bound is >= 3/4 - tie mass
    assert(r.filter(col("n_kept") * 2 < col("n_total")).isEmpty)
    assert(r.filter(col("cutoff_q") < 0 || col("cutoff_q") > 1).isEmpty)
    r.unpersist()
  }

  test("a17 outliers all clear the scaled MAD threshold against a re-derived median") {
    val out = q("a17_mad_outliers").cache()
    assert(out.filter(col("abs_dev") < 0).isEmpty)
    // the flagged deviation must equal |value - median| at 2-dp precision
    val bad = out.filter(
      abs(round(abs(col("value") - col("median")) - col("abs_dev"), 2)) > 0.011)
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("e_hard_negatives margins match their pivoted similarities and sims lie in [-1,1]") {
    val m = q("e_hard_negatives").cache()
    assert(m.filter(col("pos_sim") < -1.000001 || col("pos_sim") > 1.000001).isEmpty)
    assert(m.filter(col("neg_sim") < -1.000001 || col("neg_sim") > 1.000001).isEmpty)
    assert(m.filter(
      abs(col("margin") - round(col("pos_sim") - col("neg_sim") + lit(1e-9), 6)) > 1e-9).isEmpty)
    // positives and negatives are distinct vectors
    assert(m.filter(col("pos_id") === col("neg_id")).isEmpty)
    m.unpersist()
  }

  test("m_media_dedup duplicate sets partition consistently with d_exact_dedup survivors") {
    val dup = q("m_media_dedup").cache()
    assert(dup.filter(col("n_copies") < 2).isEmpty)
    // keeper is a member of its own duplicate set: its LEADING-CHUNK
    // digest matches the group key
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        md5(substring(col("text"), 1, 64).cast("binary")).as("d2"),
        md5(col("text").cast("binary")).as("full_d"))
    val bad = dup.join(docs, dup("keeper_id") === docs("doc_id"))
      .filter(col("chunk_digest") =!= col("d2"))
    assert(bad.isEmpty)
    // the chunk digest COARSENS the full-content digest: documents with
    // identical full text can never land in different chunk groups
    val split = docs.groupBy(col("full_d"))
      .agg(countDistinct(col("d2")).as("nchunk"))
      .filter(col("nchunk") > 1)
    assert(split.isEmpty)
    dup.unpersist()
  }

  test("band-tuning combinatorics bound the materialized pair listing") {
    val tuning = q("d_lsh_band_tuning").cache()
    // recall ordering: more, shorter bands can only ADD candidates
    val byCfg = tuning.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byCfg("b8_r2") >= byCfg("b4_r4") && byCfg("b4_r4") >= byCfg("b2_r8"))
    // b4_r4 is d_minhash_lsh_pairs' layout: the combinatoric count (with
    // band multiplicity, no bucket cap) can never be BELOW the capped,
    // deduplicated pair listing
    val listed = q("d_minhash_lsh_pairs").count()
    assert(byCfg("b4_r4") >= listed)
    tuning.unpersist()
  }
}
