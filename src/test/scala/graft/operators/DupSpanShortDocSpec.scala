package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** ADVICE r16 regression pins for the duplicated-span family on docs
  * with FEWER than 8 tokens — a population the parquet fixtures do not
  * contain (every generated doc is long), so the DuckDB cross-engine
  * gate was structurally blind to it:
  *
  *  - `d_dup_span_rewrite` must pass short docs through VERBATIM
  *    (new_text = text, kept_tokens = n_tokens): a doc that cannot
  *    contain a duplicated 8-token window has nothing to remove, and
  *    dropping it from the rewritten corpus is silent data loss.
  *  - `d_dup_span_coverage` must REPORT short docs (dup_frac 0,
  *    n_grams 0) so corpus-level roll-ups computed from the report
  *    (total tokens, corpus dup fraction) count them and doc-level
  *    "drop if > X% duplicated" consumers see them.
  *
  * The fixture mixes short docs with a genuine cross-doc duplicated
  * span so the long-doc semantics (first occurrence survives, later
  * copies cut) are re-asserted beside the pass-through.
  */
class DupSpanShortDocSpec extends SparkSpec {

  // doc 1 and doc 2 share the same 10-token text: every 8-token window
  // is duplicated, doc 1 (first in (doc_id, p) order) survives intact,
  // doc 2 loses all tokens under the duplicated windows (= all 10).
  // docs 3-5 are short (1, 4, 7 tokens) and unique; doc 6 is short but
  // REPEATS doc 3's text — still untouched: a 1-token overlap can never
  // form an 8-token window.
  private val longDup = "a b c d e f g h i j"
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dupspan").toString
    val rows = Seq(
      (1L, longDup, "en", "web", longDup.length.toLong),
      (2L, longDup, "en", "web", longDup.length.toLong),
      (3L, "solo", "en", "web", 4L),
      (4L, "w x y z", "en", "web", 7L),
      (5L, "p q r s t u v", "en", "web", 13L),
      (6L, "solo", "en", "web", 4L))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d_dup_span_rewrite passes n<8-token docs through verbatim") {
    val out = SparkEntry.queries("d_dup_span_rewrite")(spark, fixtureDir)
      .select("doc_id", "n_tokens", "kept_tokens", "new_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L),
      "every corpus doc must appear in the rewritten corpus")
    // short docs: verbatim
    assert(out(3L) === ((1L, 1L, "solo")))
    assert(out(4L) === ((4L, 4L, "w x y z")))
    assert(out(5L) === ((7L, 7L, "p q r s t u v")))
    assert(out(6L) === ((1L, 1L, "solo")),
      "a short doc repeating another short doc has no 8-token window and stays intact")
    // long-dup semantics unchanged: first occurrence survives, the
    // later copy is fully cut
    assert(out(1L) === ((10L, 10L, longDup)))
    assert(out(2L) === ((10L, 0L, "")))
  }

  test("d_dup_span_coverage reports n<8-token docs with dup_frac 0") {
    val out = SparkEntry.queries("d_dup_span_coverage")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L),
      "every corpus doc must appear in the coverage report")
    Seq(3L -> 1L, 4L -> 4L, 5L -> 7L, 6L -> 1L).foreach { case (id, n) =>
      assert(out(id) === ((n, 0L, 0L, 0L, 0.0)),
        s"doc $id (n=$n) must report zero grams and dup_frac 0")
    }
    // both long copies are 100% covered (within-corpus duplication is
    // symmetric in the coverage METRIC; only the rewrite is asymmetric)
    assert(out(1L) === ((10L, 3L, 3L, 10L, 1.0)))
    assert(out(2L) === ((10L, 3L, 3L, 10L, 1.0)))
  }

  test("corpus roll-up from the coverage report counts every token") {
    val total = SparkEntry.queries("d_dup_span_coverage")(spark, fixtureDir)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(total === 10L + 10L + 1L + 4L + 7L + 1L,
      "report-derived corpus token total must include short docs")
  }
}
