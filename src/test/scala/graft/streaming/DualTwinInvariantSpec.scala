package graft.streaming

import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The correctness gate (Verify + DuckDB oracle) can only execute BATCH
  * queries — a streaming dual is oracle-covered exactly when its shared
  * core also ships as a registered batch twin. This spec makes that an
  * INVARIANT instead of a convention: every public streaming transform
  * (any method on the pipeline/processor objects returning a Dataset or
  * a two-sided Dataset split) must either name its batch twin here —
  * and that twin must exist in the registry — or be explicitly listed
  * as non-query infrastructure. A new dual landing without a twin fails
  * this spec until its author registers one (or consciously declares it
  * infra), so CORRECTNESS_r{N} keeps covering the shared logic. */
class DualTwinInvariantSpec extends AnyFunSuite {

  /** dual ("Object.method") -> its batch twin in SparkEntry.queries. */
  private val twinOf: Map[String, String] = Map(
    "StreamingPipelines.parseCsvLines" -> "p1_parse_props",
    "StreamingPipelines.parseCsvQuarantine" -> "p1_parse_props",
    "StreamingPipelines.windowCount" -> "a1_window_count_5m",
    "StreamingPipelines.slidingCount" -> "w2_sliding_count",
    "StreamingPipelines.ddQuantilesStream" -> "q_dd_quantiles",
    "StreamingPipelines.hllDistinctStream" -> "q_hll_distinct",
    "StreamingPipelines.sessionCount" -> "w3_session_window",
    "StreamingPipelines.runningSum" -> "a2_running_sum",
    "StreamingPipelines.multiAgg" -> "a3_multi_agg",
    "StreamingPipelines.userActionWindowCount" -> "a4_user_action_window",
    "StreamingPipelines.dedupWithinWatermark" -> "d_exact_dedup",
    "StreamingPipelines.curateDocs" -> "d_curate_corpus",
    "StreamingPipelines.gopherRules" -> "t_gopher_rules",
    "StreamingPipelines.rollingActives" -> "a14_rolling_dau",
    "StreamingPipelines.streamingKnn" -> "e_knn_brute",
    "StreamingPipelines.decontaminate" -> "d_decontaminate",
    "StreamingPipelines.perplexityBand" -> "d_perplexity_band",
    "StreamingPipelines.bpeTokenizeStream" -> "t_bpe_tokenize",
    "StreamingPipelines.splitMain" -> "m1_split_main",
    "StreamingPipelines.splitSide" -> "m1_split_side",
    "StreamingPipelines.tagAndMerge" -> "m2_merge_union",
    "StreamingPipelines.staticEnrich" -> "q_broadcast_star",
    "StreamingPipelines.windowJoin" -> "j1_window_join",
    "StreamingPipelines.intervalJoin" -> "j3_interval_join",
    "StreamingPipelines.windowJoinOuter" -> "q_outer_join",
    "StatefulProcessors.doubleEventAlerts" -> "x1_double_event_alert",
    "StatefulProcessors.sessionizeActions" -> "x2_sessionize",
    "StatefulProcessors.funnelAdvances" -> "a9_funnel",
    "StatefulProcessors.sessionSummaries" -> "w3_session_window",
    "StatefulProcessors.heavyHitters" -> "q_cms_topk",
    "StatefulProcessors.topKPerKey" -> "q_topk_per_brand",
    "StatefulProcessors.packStream" -> "d_pack_sequences",
    "StatefulProcessors.sourceQuotaStream" -> "d_source_quota",
    "StatefulProcessors.quotaRouteStream" -> "d_source_quota",
    "StatefulProcessors.reservoirStream" -> "d_reservoir_sample",
    "StatefulProcessors.staircaseWindows" -> "w4_hour_window",
    "StatefulProcessors.staircaseWindowsByPartition" -> "w4_hour_window",
    "StatefulProcessors.nearestJoin" -> "j4_nearest_join",
    "StatefulProcessors.cepSequence" -> "x3_cep_sequence",
    "StatefulProcessors.cepNegation" -> "x4_cep_negation",
    "StatefulProcessors.cepTimes" -> "x5_cep_times",
    "StatefulProcessors.cepTimesRange" -> "x6_cep_times_range",
    "StatefulProcessors.cepOneOrMore" -> "x7_cep_one_or_more",
    "StatefulProcessors.cepSkipPast" -> "x8_cep_skip_past",
    "StreamingPipelines.slidingDdQuantilesPaneStream" -> "w2b_sliding_dd_pane",
    "StreamingPipelines.ivfIngestAssign" -> "e_assign_confusion",
    "StreamingPipelines.ivfIngestDrift" -> "e_centroid_drift",
    "StatefulOps.doubleEventAlerts" -> "x1_double_event_alert",
    "StatefulOps.sessionizeActions" -> "x2_sessionize")

  /** Streaming-side plumbing with no query semantics of its own: sources
    * (wire adapters), conf/metrics wrappers, and driver-side calibration
    * helpers whose outputs feed a mapped dual. Additions here should be
    * rare and need the same scrutiny as a twin mapping. */
  private val infra: Set[String] = Set(
    "StreamingPipelines.csvFileSource",
    "StreamingPipelines.textFileSource",
    "StreamingPipelines.kafkaSource",
    "StreamingPipelines.withObservedMetrics",
    "StreamingPipelines.watermarked")

  private def streamingTransforms(obj: AnyRef, name: String): Seq[String] = {
    val ds = classOf[Dataset[_]]
    val t2 = classOf[Tuple2[_, _]]
    obj.getClass.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filterNot(m => m.isSynthetic || m.getName.contains("$"))
      .filter(m => ds.isAssignableFrom(m.getReturnType) || m.getReturnType == t2)
      .map(m => s"$name.${m.getName}").distinct
  }

  test("every streaming dual has a registered batch twin (or is declared infra)") {
    val duals =
      streamingTransforms(StreamingPipelines, "StreamingPipelines") ++
        streamingTransforms(StatefulProcessors, "StatefulProcessors") ++
        streamingTransforms(StatefulOps, "StatefulOps")
    assert(duals.size >= 40, s"reflection found only ${duals.size} transforms — filter broke?")

    val unmapped = duals.filterNot(d => twinOf.contains(d) || infra.contains(d))
    assert(unmapped.isEmpty,
      s"streaming transforms without a batch twin (map them in DualTwinInvariantSpec " +
        s"or declare infra): ${unmapped.mkString(", ")}")

    val registry = SparkEntry.queries.keySet
    val danglingTwins = twinOf.filterNot { case (_, q) => registry.contains(q) }
    assert(danglingTwins.isEmpty, s"twins not in the registry: $danglingTwins")

    // keep the maps honest: no stale entries for removed duals
    val known = duals.toSet
    val stale = (twinOf.keySet ++ infra).diff(known)
    assert(stale.isEmpty, s"stale twin/infra entries for removed duals: $stale")
  }
}
