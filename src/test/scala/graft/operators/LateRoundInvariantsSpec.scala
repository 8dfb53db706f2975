package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the late-round-6 queries — properties the
  * DuckDB oracle equality cannot express (it only proves both engines
  * agree, not that the shared semantics are right).
  */
class LateRoundInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("d_split_leakage pairs straddle the boundary and carry the assignment's labels") {
    val leak = q("d_split_leakage").cache()
    assert(leak.filter(col("split_a") === col("split_b")).isEmpty)
    assert(leak.filter(col("est_sim") < 0.5).isEmpty)
    // endpoint labels must agree with d_split_assign (same hash, same doc)
    val assign = q("d_split_assign").select(col("doc_id"), col("split"))
    val mismatches = leak
      .join(assign.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
      .join(assign.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("split_a") =!= col("sa") || col("split_b") =!= col("sb"))
    assert(mismatches.isEmpty)
    leak.unpersist()
  }

  test("t_token_entropy lies in [0, ln(n_tokens)] and is 0 for constant docs") {
    val e = q("t_token_entropy").cache()
    assert(e.filter(col("entropy") < -1e-9).isEmpty)
    // max entropy is ln(n) (uniform over n distinct tokens); allow the
    // rounding pin's slack
    assert(e.filter(col("entropy") > expr("ln(cast(n_tokens AS double)) + 1e-3")).isEmpty)
    e.unpersist()
  }

  test("q8/q14 shares stay inside their ranges") {
    assert(q("q8_market_share").filter(col("mkt_share") < 0 || col("mkt_share") > 1).isEmpty)
    assert(q("q14_promo_share").filter(col("promo_share") < 0 || col("promo_share") > 100).isEmpty)
  }

  test("a16 gaps are non-negative and mean <= max") {
    val g = q("a16_inter_event_gap").cache()
    assert(g.filter(col("n_gaps") < 1).isEmpty)
    assert(g.filter(col("avg_gap_us") < 0).isEmpty)
    assert(g.filter(col("avg_gap_us") > col("max_gap_us") + 1).isEmpty)
    g.unpersist()
  }

  test("e_kmeans_step emits a full 64-dim model row set per cluster") {
    val m = q("e_kmeans_step").cache()
    val perCluster = m.groupBy("cluster").agg(countDistinct("pos").as("dims"))
    assert(perCluster.filter(col("dims") =!= 64).isEmpty)
    // every vector contributes to exactly 64 (cluster, pos) rows
    assert(m.agg(sum("cnt")).head().getLong(0) % 64 === 0L)
    m.unpersist()
  }

  test("d_ngram_novelty ratios are consistent with their counts") {
    val n = q("d_ngram_novelty").cache()
    assert(n.filter(col("n_exclusive") > col("n_grams")).isEmpty)
    assert(n.filter(col("novelty") < 0 || col("novelty") > 1).isEmpty)
    n.unpersist()
  }

  test("e_cluster_inertia sizes sum to the assigned corpus") {
    val total = q("e_cluster_inertia").agg(sum("n")).head().getLong(0)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(total === vecs)
  }
}
