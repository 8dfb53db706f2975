package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Z-order layout must deliver what the clustering key promises:
  * per-file (x, y) bounding boxes that are small in BOTH dimensions —
  * the property parquet min/max skipping monetizes. The spec writes
  * lineitem twice, hash-spread vs Z-ordered, and compares the summed
  * box areas file by file: a measured layout receipt, not a prose
  * claim. */
class LayoutSpec extends SparkSpec {

  private def boxArea(dir: String): Double = {
    val fs = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(fs.length >= 4, s"expected several part files in $dir")
    fs.map { f =>
      val r = spark.read.parquet(f)
        .selectExpr("min(l_partkey & 65535) AS x0", "max(l_partkey & 65535) AS x1",
          "min(l_suppkey & 65535) AS y0", "max(l_suppkey & 65535) AS y1")
        .head()
      (r.getLong(1) - r.getLong(0) + 1).toDouble * (r.getLong(3) - r.getLong(2) + 1)
    }.sum
  }

  test("z-ordered write shrinks per-file min/max boxes in both dimensions") {
    val src = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val plainDir = java.nio.file.Files.createTempDirectory("layout-plain").toString
    val zDir = java.nio.file.Files.createTempDirectory("layout-z").toString

    // hash spread: every file sees the whole key range (the default
    // layout a 100 TB ingest produces without clustering)
    src.repartition(8).write.mode("overwrite").parquet(plainDir)
    Layout.writeZOrdered(src, "l_partkey", "l_suppkey", zDir, numFiles = 8)

    // same rows either way
    val n0 = spark.read.parquet(plainDir).count()
    val nz = spark.read.parquet(zDir).count()
    assert(n0 === src.count() && nz === n0, "layout must not drop rows")

    val plainArea = boxArea(plainDir)
    val zArea = boxArea(zDir)
    // Z-ordering must cut the summed box area by at least 2x on this
    // fixture (measured ~4-10x; 2x keeps the gate robust to fixture
    // regeneration). Smaller boxes = more row groups skipped by a
    // min/max-pruned scan on EITHER key.
    assert(zArea * 2 <= plainArea,
      f"z-order layout not selective: z=$zArea%.0f plain=$plainArea%.0f")
  }
}
