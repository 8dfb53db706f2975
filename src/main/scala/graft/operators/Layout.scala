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

  /** Write `df` Z-order-clustered on two integer key columns: each key
    * is RESCALED from its actual [min, max] into the 16-bit interleave
    * domain (equal-width buckets — integer division by the bucket width,
    * overflow-free at any key magnitude), then the two 16-bit values are
    * interleaved into the same Morton code as `q_zorder_key`. An earlier
    * revision masked with `& 65535`, which silently WRAPPED keys above
    * 65535 (organic-fixture part/supplier keys reach millions) so files
    * spanned the full key range again; the rescale is monotone in each
    * raw key, so per-file boxes stay contiguous in the raw domain no
    * matter its magnitude. The min/max probe is ONE bounded 1-row
    * aggregate — input-size-independent driver work. `numFiles`
    * range-partitions on the code, so each output file owns a contiguous
    * Z-range whose (x, y) bounding box is small in both dimensions; the
    * within-partition sort keeps every ROW GROUP inside the file tight
    * too. Scale shape: ONE range exchange (range boundaries from a
    * sampled sketch — skew-tolerant by construction) + local sort; no
    * other shuffle, no driver materialization at any input size. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int = 32): Unit = {
    val b = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"writeZOrdered: $xCol and $yCol must have at least one non-null value")
    // Always STRETCH to the full 16-bit domain, never just clamp into
    // it: a narrow key range left at exact values (e.g. suppkey 1..10)
    // occupies only the LOW bits of the interleave, so every range cut
    // lands on the other dimension's high bits and that key gets zero
    // file-level discrimination — the scan-receipt test caught exactly
    // this (suppkey probe: 1.0x skipped). Bit-balanced dimensions are
    // what make Morton cuts pay in BOTH predicates.
    def scaled(c: String, lo: Long, hi: Long): String =
      if (hi <= lo) "0L"
      else if (hi - lo < 65536L)
        // narrow range: multiply first (no overflow — both factors
        // < 2^16 after the shift), stretching [lo, hi] over 0..65535
        s"((($c - ${lo}L) * 65535L) div ${hi - lo}L)"
      else {
        // wide range: bucket width ⌈(hi-lo+1)/65536⌉ via (hi-lo)/65535
        // + 1 — divide FIRST so no product can overflow at any key
        // magnitude
        val width = (hi - lo) / 65535L + 1L
        s"(($c - ${lo}L) div ${width}L)"
      }
    val keyed = df
      .withColumn("__zx", expr(scaled(xCol, b.getLong(0), b.getLong(1))))
      .withColumn("__zy", expr(scaled(yCol, b.getLong(2), b.getLong(3))))
      .withColumn("__z", expr(RelationalOps.zInterleave(spark = true, "__zx", "__zy")))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__zx", "__zy", "__z")
      .write.mode("overwrite").parquet(path)
  }
}
