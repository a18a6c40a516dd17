package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.Tables.dec

/** Aggregation operators (SURVEY.md §2-B "Aggregations").
  *
  * Determinism notes (SURVEY.md §7.4 + session findings):
  *  - Measures are cast to DECIMAL(18,2) *before* aggregation; sums are
  *    cast to DECIMAL(38,s) on BOTH engines (DuckDB's SUM(DECIMAL) is
  *    already DECIMAL(38,s); Spark's is DECIMAL(p+10,s)) so output
  *    schemas align exactly.
  *  - Never downscale-cast a computed decimal: DuckDB's decimal cast
  *    TRUNCATES while Spark's rounds HALF_UP (verified: DuckDB
  *    CAST(1.005 DECIMAL(18,3) AS DECIMAL(18,2)) = 1.00).
  *  - Averages/divisions: cast the exact decimal numerator to double and
  *    divide by the count on both engines — one IEEE-754 division of
  *    identical operands is bit-deterministic.
  */
object Aggregations extends QueryPack {

  private val D382 = DecimalType(38, 2)
  private val D384 = DecimalType(38, 4)

  override def queries: Map[String, Query] = Map(
    // TPC-H Q1 shape: scan → filter → project → hash agg (partial+final
    // from AggUtils) → sort. Reference analogue: the per-table row
    // aggregation BigQuery would run post-load (SURVEY.md §2-B).
    "q_agg_hash" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(D382).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(D382).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast(D384).as("sum_disc_price"),
          min(dec(col("l_quantity"))).as("min_qty"),
          max(dec(col("l_quantity"))).as("max_qty"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  MIN(CAST(l_quantity AS DECIMAL(18,2))) AS min_qty,
        |  MAX(CAST(l_quantity AS DECIMAL(18,2))) AS max_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
