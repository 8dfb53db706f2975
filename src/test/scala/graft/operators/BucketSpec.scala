package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed layout must deliver its one promise: a key-equi-join
  * between two tables bucketed on that key runs with ZERO exchanges
  * (the write-time clustering replaces every read-time shuffle), while
  * the identical join over plain parquet pays an exchange per side.
  * Results must match exactly either way. */
class BucketSpec extends SparkSpec {

  private def shuffles(df: DataFrame): Int = {
    df.collect() // drive THIS QueryExecution (see LayoutSpec.rowsScanned)
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
  }

  test("same-key bucketed join drops both exchanges; plain join keeps them") {
    val s = spark
    val sfDir = "/root/testdata/sf0.001"
    val orders = graft.Tables.t(s, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = graft.Tables.t(s, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")

    val dirO = java.nio.file.Files.createTempDirectory("bkt-orders").toString
    val dirL = java.nio.file.Files.createTempDirectory("bkt-lineitem").toString
    Layout.writeBucketed(orders, "bkt_orders", "o_orderkey", 8, dirO)
    Layout.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bkt_lineitem", "o_orderkey", 8, dirL)

    val aqe = s.conf.get("spark.sql.adaptive.enabled")
    val bjt = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ: the shuffle question
    try {
      def agg(j: DataFrame): DataFrame =
        j.groupBy("o_orderkey")
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))

      val bucketed = agg(s.table("bkt_orders").join(s.table("bkt_lineitem"), "o_orderkey"))
      val plain = agg(orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"))

      val nb = shuffles(bucketed)
      val np = shuffles(plain)
      info(s"exchanges: bucketed=$nb plain=$np")
      // bucketed: join AND the downstream key-aggregation reuse the
      // write-time clustering — the whole pipeline is exchange-free
      assert(nb === 0, s"bucketed join still shuffles ($nb exchanges)")
      assert(np >= 2, s"plain twin lost its exchanges ($np) — receipt is vacuous")

      // identical results either way
      val a = bucketed.orderBy("o_orderkey").collect().toSeq
      val b = plain.orderBy("o_orderkey").collect().toSeq
      assert(a === b && a.nonEmpty)
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", aqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", bjt)
      s.sql("DROP TABLE IF EXISTS bkt_orders")
      s.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
