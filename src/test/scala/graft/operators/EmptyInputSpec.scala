package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}

/** Degradation guard: every registered query must return an EMPTY
  * result on empty input tables, never throw. This is the class of bug
  * the a14_rolling_dau fix closed (a scalar collect read with getLong
  * throws on the null an empty aggregate produces) — this spec makes
  * the whole registry immune to it. The empty fixture preserves the
  * real schemas (limit(0) of the sf0.001 tables), so schema-dependent
  * paths still exercise.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.all.foreach { t =>
      Tables.t(spark, "/root/testdata/sf0.001", t)
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** Queries whose result is a fixed-shape global-aggregate report:
    * on empty input they return their full row set with zero counts —
    * exactly what their DuckDB oracles return — not an empty frame.
    * Value = (expected rows, count column that must be all-zero). */
  private val fixedShapeOnEmpty: Map[String, (Long, String)] =
    Map("a9_funnel" -> (4L, "n_users"), "d_filter_funnel" -> (5L, "n_pass"),
      "q6_forecast_revenue" -> (1L, "n_items"),
      "q17_small_qty_revenue" -> (1L, "n_items"),
      "q19_disjunctive_revenue" -> (1L, "n_items"),
      "t_zipf_fit" -> (1L, "n_tokens"))

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    fixedShapeOnEmpty.get(name) match {
      case Some((rows, countCol)) =>
        test(s"$name reports zero counts on empty tables") {
          val out = fn(spark, emptyDir)
          assert(out.count() === rows)
          assert(out.selectExpr(s"max($countCol)").head().getLong(0) === 0L)
        }
      case None =>
        test(s"$name degrades to an empty result on empty tables") {
          assert(fn(spark, emptyDir).isEmpty, s"$name returned rows from empty input")
        }
    }
  }
}
