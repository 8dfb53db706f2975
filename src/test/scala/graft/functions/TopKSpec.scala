package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k aggregate must select EXACTLY what a rank window
  * selects — (score desc, id asc), k-capped — and do so regardless of
  * how rows split across partial aggregates (merge-order invariance is
  * what licenses the map-side k-heap collapse). */
class TopKSpec extends SparkSpec {

  private def rows = {
    val s = spark
    import s.implicits._
    // deliberate score ties (i % 7) across groups, ids unique per group
    (1 to 200).map(i => (i % 3, i.toLong, (i % 7).toLong))
      .toDF("g", "id", "score")
  }

  private def viaTopk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(GraftFunctions.topK(col("score"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.id"), col("t.score"), col("t.rnk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def viaRank(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("g"), col("id"), col("score"), col("rnk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("topK equals the rank window, ties broken by id asc") {
    for (k <- Seq(1, 5, 17)) {
      assert(viaTopk(rows, k) === viaRank(rows, k), s"k=$k")
    }
  }

  test("topK is invariant to partitioning (merge order)") {
    val base = rows
    val k = 6
    val expect = viaTopk(base.coalesce(1), k)
    for (p <- Seq(2, 7, 32)) {
      assert(viaTopk(base.repartition(p), k) === expect, s"partitions=$p")
    }
  }

  test("k larger than the group emits the whole group, ranked") {
    val s = spark
    import s.implicits._
    val tiny = Seq((0, 10L, 5L), (0, 11L, 5L), (0, 12L, 9L)).toDF("g", "id", "score")
    assert(viaTopk(tiny, 100) ===
      Set((0, 12L, 9L, 1L), (0, 10L, 5L, 2L), (0, 11L, 5L, 3L)))
  }

  test("extreme scores (Long.MinValue / Long.MaxValue) rank correctly") {
    // ADVICE r10: an Ordering built with -score overflows at
    // Long.MinValue (-Long.MinValue == Long.MinValue), ranking the
    // weakest possible score as strongest and corrupting eviction.
    val s = spark
    import s.implicits._
    val extremes = Seq(
      (0, 1L, Long.MinValue), (0, 2L, -5L), (0, 3L, 0L),
      (0, 4L, 7L), (0, 5L, Long.MaxValue), (0, 6L, Long.MinValue + 1))
      .toDF("g", "id", "score")
    for (k <- Seq(1, 2, 3, 6)) {
      assert(viaTopk(extremes, k) === viaRank(extremes, k), s"k=$k")
      assert(viaTopk(extremes.repartition(3), k) === viaRank(extremes, k),
        s"k=$k partitioned")
    }
  }

  test("graft_topk is SQL-callable via the extensions registry") {
    val s = spark
    org.apache.spark.sql.graftext.GraftExtensions.registerAll(s)
    import s.implicits._
    rows.createOrReplaceTempView("topk_in")
    val out = s.sql(
      "SELECT g, t.id, t.rnk FROM (SELECT g, explode(graft_topk(score, id, 3)) AS t FROM topk_in GROUP BY g)")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === viaRank(rows, 3).map(t => (t._1, t._2, t._4)))
  }
}
