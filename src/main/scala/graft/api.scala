package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named query: the Spark implementation plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables. Queries with
  * `oracle = None` get the driver's weaker rows-only check.
  */
final case class GQuery(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Loaders for the driver's deterministic parquet fixtures (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects outright. Read it as a long
    * (legacy conf) and rebuild a TimestampType column at microsecond
    * precision — lossless for this data (no sub-µs components) and
    * required for `window()`/`date_format`/watermarks downstream.
    * Schema-gated: a re-exported events table (e.g. ScaleSmoke's scaled
    * copy) already carries a true timestamp and passes through unchanged.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
