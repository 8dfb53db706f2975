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
        // legacySizeOfNull pinned false: the replaced expression propagates
        // null, and Size's companion apply would inherit the legacy conf
        // (size(NULL) = -1) — an optimizer rule must never change results
        Size(a, legacySizeOfNull = false)
    }
}

object GraftExtensions {

  // the ONE set of MinHash constants, shared with the Scala pipelines
  private val MP = graft.functions.TextHashUtil.MP
  private val perms = graft.functions.TextHashUtil.perms

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("org.apache.spark.sql.graftext", name)

  /** Arity guard: extra args must not be silently dropped, missing ones
    * must read as a usage error, not an IndexOutOfBoundsException. */
  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name expects $n argument(s), got ${args.length}")
      f(args)
    }

  /** (identifier, info, builder) triples shared by the extensions hook and
    * runtime registration. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash32"), info("graft_simhash32"),
      arity("graft_simhash32", 1)(args => SimHash32(args.head))),
    (FunctionIdentifier("graft_minhash_sig"), info("graft_minhash_sig"),
      arity("graft_minhash_sig", 1)(args =>
        MinHashSig(args.head, perms.map(_._1), perms.map(_._2), MP))),
    (FunctionIdentifier("graft_trigram_hashes"), info("graft_trigram_hashes"),
      arity("graft_trigram_hashes", 1)(args => TrigramHashes(args.head))),
    (FunctionIdentifier("graft_media_ahash"), info("graft_media_ahash"),
      arity("graft_media_ahash", 1)(args => MediaAHash(args.head))),
    (FunctionIdentifier("graft_ngram_hashes"), info("graft_ngram_hashes"),
      arity("graft_ngram_hashes", 2)(args => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          NgramHashes(args(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_ngram_hashes: n must be an integer literal, got $other")
      })),
    (FunctionIdentifier("graft_sorted_intersect_count"), info("graft_sorted_intersect_count"),
      arity("graft_sorted_intersect_count", 2)(args => SortedIntersectCount(args(0), args(1)))),
    (FunctionIdentifier("graft_md5_hash48"), info("graft_md5_hash48"),
      arity("graft_md5_hash48", 1)(args => Md5Hash48(args.head))),
    (FunctionIdentifier("graft_vec_dot"), info("graft_vec_dot"),
      arity("graft_vec_dot", 2)(args => VecDot(args(0), args(1)))),
    (FunctionIdentifier("graft_vec_l2sq"), info("graft_vec_l2sq"),
      arity("graft_vec_l2sq", 2)(args => VecL2Sq(args(0), args(1)))),
    (FunctionIdentifier("graft_sign_pack"), info("graft_sign_pack"),
      arity("graft_sign_pack", 2)(args => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(off: Int, _) =>
          SignPack(args(0), off)
        case other => throw new IllegalArgumentException(
          s"graft_sign_pack: off must be an integer literal, got $other")
      })),
    // aggregate function: the analyzer wraps a bare AggregateFunction
    // into an AggregateExpression during resolution, so registering the
    // function itself is enough for SQL `SELECT graft_dd_sketch(x) ...`
    (FunctionIdentifier("graft_dd_sketch"), info("graft_dd_sketch"),
      arity("graft_dd_sketch", 1)(args => DecimalDDSketch(args.head))),
    (FunctionIdentifier("graft_dd_sketch_q"), info("graft_dd_sketch_q"),
      arity("graft_dd_sketch_q", 2)(args => DecimalDDSketchQ(args(0), args(1)))),
    (FunctionIdentifier("graft_topk"), info("graft_topk"),
      arity("graft_topk", 3)(args => TopKByScore(args(0), args(1), args(2)))),
    (FunctionIdentifier("graft_dd_sketch_w"), info("graft_dd_sketch_w"),
      arity("graft_dd_sketch_w", 2)(args => DecimalDDSketchW(args(0), args(1)))))

  /** Register into an already-built session (the extensions config only
    * applies at session build time). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
