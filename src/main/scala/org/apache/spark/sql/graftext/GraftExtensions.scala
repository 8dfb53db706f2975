package org.apache.spark.sql.graftext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SparkSessionExtensions entry point: registers the graft native
  * functions so plain-SQL users can call them —
  *
  *   spark.sql.extensions=org.apache.spark.sql.graftext.GraftExtensions
  *
  *   SELECT graft_simhash32(split(text, ' ')) FROM documents
  *   SELECT graft_minhash_sig(split(text, ' ')) FROM documents
  *   SELECT graft_trigram_hashes(split(text, ' ')) FROM documents
  *   SELECT graft_sorted_intersect_count(a, b)
  *
  * graft_minhash_sig uses the library's standard 16 permutations
  * ([[graft.operators.TextOps]] constants) when called from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => SimplifySelfIntersect)
  }
}

/** Catalyst optimizer rule for the graft expressions: the intersection of
  * a sorted-distinct array with itself is its own length, so
  * `graft_sorted_intersect_count(x, x)` folds to `size(x)` — the linear
  * merge (and any duplicated evaluation of `x`) disappears from the plan.
  * Deliberately small: it exists to exercise the injectOptimizerRule SPI
  * end-to-end next to the injected functions.
  */
object SimplifySelfIntersect extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SortedIntersectCount(a, b) if a.deterministic && a.semanticEquals(b) =>
        Size(a)
    }
}

object GraftExtensions {

  private val MP = 4294967311L
  private val perms: Seq[(Long, Long)] =
    (0 until 16).map(i => (2L * i + 3L, 1000003L * i + 12345L))

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("org.apache.spark.sql.graftext", name)

  /** (identifier, info, builder) triples shared by the extensions hook and
    * runtime registration. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash32"), info("graft_simhash32"),
      (args: Seq[Expression]) => SimHash32(args.head)),
    (FunctionIdentifier("graft_minhash_sig"), info("graft_minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args.head, perms.map(_._1), perms.map(_._2), MP)),
    (FunctionIdentifier("graft_trigram_hashes"), info("graft_trigram_hashes"),
      (args: Seq[Expression]) => TrigramHashes(args.head)),
    (FunctionIdentifier("graft_sorted_intersect_count"), info("graft_sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    (FunctionIdentifier("graft_md5_hash48"), info("graft_md5_hash48"),
      (args: Seq[Expression]) => Md5Hash48(args.head)),
    (FunctionIdentifier("graft_vec_dot"), info("graft_vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("graft_vec_l2sq"), info("graft_vec_l2sq"),
      (args: Seq[Expression]) => VecL2Sq(args(0), args(1))))

  /** Register into an already-built session (the extensions config only
    * applies at session build time). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
