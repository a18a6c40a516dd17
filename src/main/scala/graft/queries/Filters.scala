package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec

/** Projection / filter / predicate operators (SURVEY.md §2-B).
  * Catalyst pushes all of these to the Parquet scan (PushedFilters) —
  * asserted in PlanSpec. */
object Filters extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q_project_compute" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double").as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_filter_compound" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .filter(
          col("l_quantity").between(10, 30) &&
          (col("l_discount") >= 0.03 || col("l_returnflag") === "R") &&
          !(col("l_linestatus") === "O") &&
          col("l_linenumber").isin(1, 2, 3))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        // ORDER BY every output column: the synthetic fixture carries
        // duplicate (orderkey, linenumber) pairs, so the two-column
        // sort was not a total order — engines tied differently at
        // sf0.1 (round-13 cert caught two swapped rows)
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
    }),

    "q_filter_like" -> ((spark, sfDir) => {
      Tables.part(spark, sfDir)
        .filter((col("p_name").like("%ring%") || col("p_type").like("ECO%")) &&
          col("p_brand").startsWith("Brand#1"))
        .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_brand"))
        .orderBy(col("p_partkey"))
    }),

    "q_filter_null" -> ((spark, sfDir) => {
      val st = nullif(col("o_orderstatus"), lit("F"))
      Tables.orders(spark, sfDir)
        .select(
          col("o_orderkey"),
          st.as("st"),
          st.isNull.as("is_null"),
          st.eqNullSafe(lit("O")).as("eq_o"))
        .orderBy(col("o_orderkey"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 30
        |  AND (l_discount >= 0.03 OR l_returnflag = 'R')
        |  AND NOT (l_linestatus = 'O')
        |  AND l_linenumber IN (1, 2, 3)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag"""
        .stripMargin,

    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_type, p_brand
        |FROM part
        |WHERE (p_name LIKE '%ring%' OR p_type LIKE 'ECO%')
        |  AND p_brand LIKE 'Brand#1%'
        |ORDER BY p_partkey""".stripMargin,

    "q_filter_null" ->
      """SELECT o_orderkey,
        |  NULLIF(o_orderstatus, 'F') AS st,
        |  (NULLIF(o_orderstatus, 'F') IS NULL) AS is_null,
        |  (NULLIF(o_orderstatus, 'F') IS NOT DISTINCT FROM 'O') AS eq_o
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
