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
      normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** Driver fixtures are written as parquet timestamp[us] with no UTC
    * adjustment, which Spark 4 infers as TIMESTAMP_NTZ — a type
    * `unix_micros`/`window()`/watermarks all reject. Cast every NTZ
    * column (o_orderdate, l_shipdate, ...) back to TimestampType;
    * lossless under the engine's pinned UTC session timezone. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  /** Normalize the `events` fixture's `ts` to TimestampType regardless of
    * how the driver generated the parquet that round:
    *   - TIMESTAMP(NANOS) (early rounds): Spark's vectorized reader rejects
    *     it outright, so read as long (legacy conf) and rebuild at
    *     microsecond precision — lossless, no sub-µs components exist.
    *   - timestamp[us] without UTC adjustment (current rounds): Spark 4
    *     infers TIMESTAMP_NTZ, which `unix_micros`/`window()`/watermarks
    *     reject; cast to TimestampType — lossless under the engine's
    *     pinned UTC session timezone (Sessions.scala:38).
    *   - true TimestampType (e.g. ScaleSmoke's re-exported copy): pass
    *     through unchanged.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType => normalizeNtz(df)
      case _ => df
    }
  }
}
