package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** The 100 TB techniques that don't show up in single-query plans:
  * bucketed co-located joins (no shuffle on either side), AQE skew-join
  * splitting, and partitioned data layout. Each asserts on the executed
  * plan, not just the result.
  */
class ScaleFeaturesSpec extends SparkSpec {

  test("bucketed tables join with ZERO exchanges (co-located join)") {
    val s = spark
    // clear both catalog entries AND any stale managed location left by a
    // previously-interrupted run (DROP alone won't remove an orphan dir)
    Seq("li_b", "ord_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) scala.reflect.io.Directory(loc).deleteRecursively()
    }
    val li = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    // disable broadcast so the join would OTHERWISE shuffle both sides
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("li_b")
        .join(s.table("ord_b"), s.table("li_b")("l_orderkey") === s.table("ord_b")("o_orderkey"))
      val n = joined.count()
      assert(n === li.count()) // every lineitem has its order
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffled:\n$plan")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val s = spark
    import s.implicits._
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> s.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> s.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> s.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // key 0 carries 100k rows; the other 99 keys carry ~100 each
      val left = s.range(0, 110000)
        .selectExpr("IF(id < 100000, 0L, id % 100) AS k", "id AS v",
          "repeat('x', 64) AS pad")
      val right = s.range(0, 100).selectExpr("id AS k", "id AS w")
      val joined = left.join(right, "k")
      joined.collect() // finalize THIS QueryExecution's adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n${plan.take(2000)}")
    } finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }

  test("partitioned write prunes to one partition directory on read") {
    val s = spark
    val out = Files.createTempDirectory("part-out").toString
    s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val one = s.read.parquet(out).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    // partition filter must reach the scan (no full-table read)
    assert(scanned.contains("PartitionFilters: [isnotnull(lang"),
      s"partition pruning missing:\n${scanned.take(1500)}")
  }
}
