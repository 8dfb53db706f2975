package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan-quality regression guard: the registry must stay free of
  * accidentally-quadratic join plans, and pushdown must keep reaching the
  * scans. A query that legitimately needs a nested-loop join (tiny
  * broadcast build side by design) must be whitelisted here WITH its
  * justification — everything else failing this spec is a plan
  * regression, not a style issue.
  */
class PlanHygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Non-equi joins whose build side is constant-size by construction:
    * e_knn_* broadcast the <=10-row query set (brute/quant) or the 16-row
    * coarse codebook (ivf) against one corpus scan — the intended
    * "broadcast the tiny side, never shuffle the corpus" kNN plan.
    * e_knn_rerank's coarse stage shares the same shape. t_tfidf,
    * t_bm25_rank and d_temperature_mix cross-join a 1-row broadcast
    * scalar (corpus count / doc-length stats / sum of language weights);
    * e_assign_confusion cross-joins the 10-row centroid model. */
  private val nestedLoopByDesign =
    Set("e_knn_brute", "e_knn_l2", "e_knn_quant", "e_knn_ivf", "e_knn_rerank",
      "e_knn_matryoshka", "e_knn_pq", "t_tfidf", "e_assign_confusion",
      "t_bm25_rank", "d_temperature_mix",
      // composes the brute + ivf pipelines verbatim, so it inherits their
      // constant-build-side nested loops
      "e_recall_eval",
      // cross-joins the 10-row broadcast centroid model, like e_assign
      "e_ood_score",
      // same shared centroid-model cross join (constant 10x64 build side)
      "e_cluster_inertia",
      // the Lloyd-iteration E-step: the identical centroid-model cross join
      "e_kmeans_step",
      // q15 joins the 1-row max-revenue scalar back against the
      // per-supplier aggregate; q22 cross-joins the 1-row (sum, count)
      // average-balance scalar — both constant-size build sides by design
      "q15_top_supplier", "q22_idle_balance",
      // q11 cross-joins the 1-row grand-total scalar — constant build side
      "q11_important_parts",
      // triplet mining broadcasts the <=10-row query set, like e_knn_brute
      "e_hard_negatives",
      // multi-probe IVF: the identical 16-row coarse-codebook cross join
      // as e_knn_ivf (only the probe count differs)
      "e_knn_ivf_mp",
      // pairwise register algebra over the per-event-type HLL sketches:
      // both join sides are the <= |event-type-domain|-row register
      // table (5 rows of 64 longs here) — constant-size by construction,
      // nothing corpus-proportional crosses the nested loop
      "q_hll_set_algebra",
      // the Lloyd step's centroid-model cross join (constant 10x64 build
      // side), shared with e_kmeans_step; the drift join itself is an
      // equi BroadcastHashJoin on (cluster, pos)
      "e_centroid_drift",
      // cross-joins the 1-row (lo, hi) band-cut scalar — constant build
      // side, the t_tfidf scalar-broadcast pattern
      "d_perplexity_band",
      // cross-joins the 1-row (total, sum-of-weights) scalar
      "d_epoch_plan",
      // cross-joins the 1-row node-count scalar into the rank seed
      "q_pagerank",
      // cross-joins the 1-row (max ts − 7d) cutoff scalar — constant
      // build side, the t_tfidf scalar-broadcast pattern
      "q_upsert_latest",
      // four 1-row broadcast merge winners against one documents scan —
      // the zero-shuffle BPE application plan
      "t_bpe_tokenize",
      // IVF+PQ composition: the identical 16-row coarse-codebook cross
      // join as e_knn_ivf/e_knn_ivf_mp (assignment stage); the candidate
      // join itself is an equi BroadcastHashJoin on cell
      "e_knn_ivfpq",
      // cross-joins the 1-row (max date − 30d) cutoff scalar — the
      // q_upsert_latest scalar-broadcast pattern
      "q_mv_merge",
      // composes bpeTokenizeFrom verbatim, inheriting t_bpe_tokenize's
      // four 1-row broadcast merge-winner joins
      "t_tokenizer_fertility",
      // same <=10-row broadcast query-set join as e_knn_pq; the Lloyd
      // training joins are equi (on j) and hash-broadcast
      "e_knn_pq_trained",
      // runs the e_knn_pq_trained trajectory verbatim on the rotated
      // frame, inheriting its <=10-row broadcast query-set join; the
      // rotation itself is a pure map (no join)
      "e_knn_opq",
      // inherits e_knn_ivfpq's 16-row coarse-codebook cross join
      // (assignment stage); residual Lloyd training joins are equi on j,
      // the candidate join is an equi BroadcastHashJoin on cell
      "e_knn_ivfpq_trained",
      // the same <=10-row broadcast query-set join as e_knn_brute, on
      // packed sign bits
      "e_knn_hamming",
      // persisted-index probe: the query side ranks <=10 query vectors
      // against the 16-row PERSISTED coarse-centroid table (the
      // e_knn_ivf cross-join shape, constant build side); the coded-
      // corpus candidate join is an equi BroadcastHashJoin on cell
      "e_knn_ivfpq_indexed",
      // the OPQ flavor of the same persisted-index probe: identical
      // constant-size model joins (16-row persisted centroids), plus a
      // pure-map rotation; the candidate join stays cell-equi
      "e_knn_opq_indexed",
      // model-sized full-domain frame: #sources x range(1024) cross
      // join plus the 1-row corpus-total scalar — both constant build
      // sides (the corpus is only touched by the one gram agg upstream)
      "t_source_kl",
      // the e_knn_ivf assignment's identical 16-row coarse-codebook
      // cross join; everything downstream of the map-side count agg is
      // the 16-row cell frame
      "e_ivf_balance",
      // runs the e_knn_pq_trained trajectory on the rank-3-rotated
      // frame — the same <=10-row broadcast query-set join as
      // e_knn_opq; the extra reflections are pure maps
      "e_knn_opq3",
      // e_knn_ivfpq_trained's constant-size model joins (16-row coarse
      // cross join in assignment), plus pure-map residual rotations;
      // the candidate join stays cell-equi (the persisted sibling
      // e_knn_opqres_indexed needs NO exemption: its probe side reads
      // the stored 16-row centroid table through a hash join)
      "e_knn_opq_residual")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plan has no accidental nested-loop or cartesian join") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!nestedLoopByDesign(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — whitelist it only if the build side is constant-size by design")
    }
  }

  test("q_scd2_intervals runs in ONE user_id exchange (the scaladoc's claim, pinned)") {
    // The SCD2 derivation chains two ordered windows, a groupBy, and a
    // lead() window — all keyed by user_id. The scale contract is that
    // Catalyst satisfies every downstream clustering from the FIRST
    // hashpartitioning(user_id) exchange: the groupBy(user_id, grp) is
    // clustered by the user_id subset and the lead() repartitions on the
    // same key, so the whole query is one shuffle of the events table.
    val plan = SparkEntry.queries("q_scd2_intervals")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"q_scd2_intervals must shuffle events exactly once on user_id; plan has $exchanges exchanges:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"the single exchange must key on user_id:\n$plan")
    // and the exchange count is the TOTAL — no broadcast/range exchange hides elsewhere
    assert("Exchange ".r.findAllIn(plan).size === 1,
      s"unexpected additional exchange in q_scd2_intervals:\n$plan")
  }

  test("filters and projection reach the parquet scan (s1_source_project)") {
    val plan = SparkEntry.queries("s1_source_project")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      "filter pushdown regressed on the source-projection query")
  }

  test("the 2-column projection prunes the documents scan (d_stratified_sample)") {
    val plan = SparkEntry.queries("d_stratified_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "column pruning regressed — the scan reads more than doc_id/lang")
  }

  test("the gram family prunes the documents scan to (doc_id, text) (d_dup_span_coverage)") {
    // the gram frame projects doc_id + window hashes only; the scan must
    // not drag lang/source/n_chars through the corpus-wide explode
    val plan = SparkEntry.queries("d_dup_span_coverage")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"column pruning regressed — the gram scan reads more than doc_id/text:\n" +
        plan.split("\n").filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("the 3-column projection prunes the documents scan (d_hash_sample)") {
    val plan = SparkEntry.queries("d_hash_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:"),
      "column pruning regressed — the scan reads more than doc_id/lang/n_chars")
  }
}
