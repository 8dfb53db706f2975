package graft.operators

import graft.{SparkSpec, SparkEntry}

/** Every registered query must run against the smallest fixture and
  * produce a schema-stable, non-degenerate result — the local guard that
  * the driver's sf0.01 oracle gate never sees a broken plan. Queries that
  * legitimately return zero rows at sf0.001 are listed explicitly.
  */
class BatchOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Candidate-pair / threshold queries can be empty at tiny scale. */
  private val mayBeEmpty = Set(
    "d_ngram_jaccard", "d_minhash_lsh_pairs", "d_edit_distance_pairs",
    "e_neardup_cosine", "x1_double_event_alert", "q_anti_join",
    "q_except_users")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a stable schema") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(df.schema.fields.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
