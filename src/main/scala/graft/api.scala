package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")
}
