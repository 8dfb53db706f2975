package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout writers — the actionable half of the clustering keys the
  * query registry reports on. `q_zorder_key` (RelationalOps) measures
  * clustering quality; this actually LAYS OUT a table that way, which is
  * where the 100 TB win lives: parquet keeps min/max statistics per row
  * group, and a scan filtered on either clustered dimension skips every
  * row group whose box misses the predicate. A Z-ordered write makes
  * those boxes tight in BOTH dimensions at once — the standard lakehouse
  * OPTIMIZE ZORDER BY primitive, expressed as plain Spark: one
  * range exchange on the Morton code + a partition-local sort, nothing
  * engine-specific. */
object Layout {

  /** Write `df` Z-order-clustered on two non-negative integer key
    * columns (low 16 bits of each are interleaved — the same Morton code
    * as `q_zorder_key`). `numFiles` range-partitions on the code, so
    * each output file owns a contiguous Z-range whose (x, y) bounding
    * box is small in both dimensions; the within-partition sort keeps
    * every ROW GROUP inside the file tight too. Scale shape: ONE range
    * exchange (range boundaries from a sampled sketch — skew-tolerant by
    * construction) + local sort; no other shuffle, no driver
    * materialization at any input size. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int = 32): Unit = {
    val keyed = df.withColumn("__zx", expr(s"$xCol & 65535"))
      .withColumn("__zy", expr(s"$yCol & 65535"))
      .withColumn("__z", expr(RelationalOps.zInterleave(spark = true, "__zx", "__zy")))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__zx", "__zy", "__z")
      .write.mode("overwrite").parquet(path)
  }
}
