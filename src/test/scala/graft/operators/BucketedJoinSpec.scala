package graft.operators

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** Receipt for the co-located-join design claim: fact-fact joins at
  * 100 TB should be bucketed on the join key so the join reads
  * pre-partitioned data and plans NO shuffle exchange. This spec writes
  * lineitem/orders bucketed by order key, joins them under
  * sort-merge-join conditions (broadcast disabled — at real scale
  * neither side broadcasts), and asserts the plan contains no
  * hash-partitioning Exchange, plus value parity with the plain
  * parquet join.
  */
class BucketedJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join plans no shuffle exchange and matches the plain join") {
    val s = spark
    val li = Tables.t(s, sfDir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val od = Tables.t(s, sfDir, "orders").select(col("o_orderkey"), col("o_totalprice"))
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("bkt_lineitem")
    od.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("bkt_orders")
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val j = s.table("bkt_lineitem")
          .join(s.table("bkt_orders"), col("l_orderkey") === col("o_orderkey"))
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        val plain = li.join(od, col("l_orderkey") === col("o_orderkey"))
        assert(j.count() === plain.count())
      }
    } finally {
      s.sql("DROP TABLE IF EXISTS bkt_lineitem")
      s.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }
}
