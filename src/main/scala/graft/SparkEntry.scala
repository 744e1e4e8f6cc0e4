package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY §2 (one
  * entry per row) plus the training-data pipeline ops; `oracleSql` holds
  * the DuckDB-equivalent SQL for each SQL-expressible entry.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Relational,
    EventWindows,
    TextAnalytics,
    Dedup,
    Similarity,
    Behavioral,
    graft.multimodal.MediaQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
