package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by category packs under [[graft.queries]];
  * each pack pairs Spark implementations with DuckDB oracle SQL
  * (SURVEY.md §2-B inventory).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Aggregations, Filters, Joins, SortsSets, Scalars, Windows,
    ArraysJson, TextOps, SimOps, ScansSinks, Streaming, Udfs,
    MultimodalPack, Subqueries, Reshape, Warehouse, Composites,
    CompositesB, EventsAnalytics, Curation, Governance, Learned,
    Matching, Preflight, Inference
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
