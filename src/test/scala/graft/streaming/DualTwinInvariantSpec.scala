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

  /** Single source of truth lives in [[graft.OperatorIndex]] (the
    * generated OPERATORS.md renders the inverse mapping); this spec
    * enforces it stays total over the reflected streaming surface. */
  private val twinOf: Map[String, String] = graft.OperatorIndex.streamingTwinOf

  private val infra: Set[String] = graft.OperatorIndex.streamingInfra

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
