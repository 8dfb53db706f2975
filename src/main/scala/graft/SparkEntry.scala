package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator family into the driver's
  * `queries` / `oracleSql` maps:
  *   - [[operators.EventOps]]       — batch analogs of the reference's
  *     streaming-dataflow operators (SURVEY.md §2).
  *   - [[operators.AnalyticsOps]]   — product analytics over the event
  *     stream (retention, funnel, outliers, mode).
  *   - [[operators.RelationalOps]]  — relational generalizations
  *     (joins/aggs/top-k/rollup over the TPC-H-ish tables).
  *   - [[operators.TextOps]]        — LLM-pipeline text analysis + dedup.
  *   - [[operators.EmbeddingOps]]   — similarity search / ANN / near-dup.
  */
object SparkEntry {

  /** The full typed registry — [[OperatorIndex]] renders the user-facing
    * OPERATORS.md from it so the index cannot drift from the code. */
  private[graft] def registryAll: Seq[GQuery] = registry

  private def registry: Seq[GQuery] =
    operators.EventOps.all ++
      operators.AnalyticsOps.all ++
      operators.RelationalOps.all ++
      operators.TpchOps.all ++
      operators.TextOps.all ++
      operators.EmbeddingOps.all ++
      operators.MultimodalOps.all ++
      operators.SketchOps.all ++
      operators.PaneOps.all ++
      operators.LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-style 6-way join with broadcast dims — the showcase plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
