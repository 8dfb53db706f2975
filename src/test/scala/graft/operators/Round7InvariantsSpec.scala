package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-7 queries — properties the DuckDB
  * oracle equality cannot express (it proves both engines agree, not
  * that the shared semantics are right).
  */
class Round7InvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("e_knn_ivf_mp recall@3 dominates e_knn_ivf per query") {
    // nprobe=2's candidate set is a superset of nprobe=1's, and any true
    // top-3 member present among candidates must survive to the top-3
    // (only other true top-3 members can outrank it) — so per-query
    // recall against the brute-force truth cannot decrease.
    val truth = q("e_knn_brute").select(col("qid"), col("vec_id")).cache()
    def recallByQ(name: String) = q(name)
      .select(col("qid"), col("vec_id"))
      .join(truth, Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    val r1 = recallByQ("e_knn_ivf").withColumnRenamed("hits", "h1")
    val r2 = recallByQ("e_knn_ivf_mp").withColumnRenamed("hits", "h2")
    val regressions = r1.join(r2, Seq("qid"), "outer")
      .filter(coalesce(col("h2"), lit(0L)) < coalesce(col("h1"), lit(0L)))
    assert(regressions.isEmpty, "multi-probe lost a true neighbor nprobe=1 had")
    truth.unpersist()
  }

  test("j4 nearest join stays inside tolerance and picks the true argmin") {
    val j = q("j4_nearest_join").cache()
    assert(j.filter(abs(col("dt_us")) > 900000000L).isEmpty)
    // one row per matched click
    assert(j.groupBy(col("event_id")).count().filter(col("count") > 1).isEmpty)
    // the chosen neighbor is the closest: no purchase by the same user is
    // strictly nearer (tie allowed only at the chosen |dt| itself)
    val e = graft.Tables.t(spark, sfDir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p2_ts"))
    val closer = j.join(p, Seq("user_id"))
      .filter(abs(unix_micros(col("click_ts")) - unix_micros(col("p2_ts")))
        < abs(col("dt_us")))
    assert(closer.isEmpty, "a strictly closer purchase existed")
    j.unpersist()
  }

  test("d_perplexity_band keeps a middle band of the scored corpus") {
    val scored = q("t_lm_score").cache()
    val band = q("d_perplexity_band").cache()
    val n = scored.count()
    val k = band.count()
    // exact-quantile cuts keep at least ~half minus bucket granularity,
    // and the band can never exceed the scored corpus
    assert(k <= n)
    assert(k >= n / 4, s"band kept $k of $n — cuts degenerate")
    // band members' scores lie between the min and max of the band — and
    // both tails exist outside it unless the distribution is degenerate
    val lo = band.agg(min(col("lm_score"))).head().getDouble(0)
    val hi = band.agg(max(col("lm_score"))).head().getDouble(0)
    assert(scored.filter(col("lm_score") < lo).count() > 0, "no low tail was cut")
    assert(scored.filter(col("lm_score") > hi).count() > 0, "no high tail was cut")
    scored.unpersist(); band.unpersist()
  }

  test("d_cluster_size_profile accounts for every clustered document") {
    val prof = q("d_cluster_size_profile")
    val docsInClusters = prof
      .selectExpr("sum(cluster_size * n_clusters)").head().getLong(0)
    val labeled = q("d_dedup_groups").count()
    assert(docsInClusters === labeled,
      "size histogram must partition exactly the labeled documents")
    // a cluster needs at least 2 members (labels only exist for docs in pairs)
    assert(prof.filter(col("cluster_size") < 2).isEmpty)
  }

  test("d_containment_pairs dominates Jaccard on shared pairs") {
    // C = inter/min(na,nb) >= J = inter/(na+nb-inter) always; every
    // Jaccard pair >= 0.5 must therefore appear with containment >= its
    // jaccard value.
    val cont = q("d_containment_pairs")
    val jac = q("d_ngram_jaccard").filter(col("jac") >= 0.5)
    val missing = jac.join(cont, Seq("doc_a", "doc_b"), "left_anti")
    assert(missing.isEmpty, "a high-Jaccard pair is missing from containment")
    val violated = jac.join(cont, Seq("doc_a", "doc_b"))
      .filter(col("containment") < col("jac") - lit(1e-4))
    assert(violated.isEmpty, "containment must dominate jaccard")
  }

  test("q_pareto_frontier members are mutually non-dominating and dominate the rest") {
    val pts = q("q_pareto_frontier")
      .select(col("total_qty").as("x"), col("unit_price_cents").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // pairwise non-dominance within the frontier
    for (a <- pts; b <- pts if a != b)
      assert(!((b._1 > a._1 && b._2 >= a._2) || (b._1 >= a._1 && b._2 > a._2)),
        s"$b dominates frontier member $a")
    assert(pts.nonEmpty)
  }

  test("t_zipf_fit slope is negative on Zipf-shaped data") {
    val row = q("t_zipf_fit").head()
    // the head is min(vocab, 100): sf0.001's synthetic vocab is only ~31
    val nTok = row.getAs[Long]("n_tokens")
    assert(nTok > 1 && nTok <= 100)
    val slope = row.getAs[Double]("slope")
    assert(slope < 0.0, s"token frequencies must decay with rank (slope=$slope)")
  }

  test("e_centroid_drift is finite, non-negative, and covers every cluster") {
    val d = q("e_centroid_drift").cache()
    assert(d.count() === 10L) // one row per label cluster
    assert(d.filter(col("drift") < 0.0 || col("drift").isNull).isEmpty)
    // members must sum to the corpus (every vector assigned exactly once)
    val members = d.agg(sum(col("n_members"))).head().getLong(0)
    val corpus = graft.Tables.t(spark, sfDir, "embeddings").count()
    assert(members === corpus)
    d.unpersist()
  }
}
