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
    * lossless under the engine's pinned UTC session timezone. The swap
    * recurses into struct/array/map types (a nested NTZ would otherwise
    * pass through and still break downstream), and the source column is
    * read backtick-quoted so a dotted column name resolves literally
    * (matching withColumn's literal-name semantics). */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def swap(dt: DataType): DataType = dt match {
      case TimestampNTZType => TimestampType
      case s: StructType   => StructType(s.fields.map(f => f.copy(dataType = swap(f.dataType))))
      case a: ArrayType    => a.copy(elementType = swap(a.elementType))
      case m: MapType      => m.copy(keyType = swap(m.keyType), valueType = swap(m.valueType))
      case other           => other
    }
    df.schema.fields.foldLeft(df) { (d, f) =>
      val swapped = swap(f.dataType)
      if (swapped == f.dataType) d
      else d.withColumn(f.name, d.col(s"`${f.name}`").cast(swapped))
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
