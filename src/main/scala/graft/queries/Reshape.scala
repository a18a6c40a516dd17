package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).
  * Pivot values are declared explicitly — letting Spark collect them
  * first is an extra distinct pass over the data at scale.
  */
object Reshape extends QueryPack {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  override def queries: Map[String, Query] = Map(
    "q_pivot" -> ((spark, sfDir) => {
      // Spark's PivotFirst leaves NULL for empty (status, priority)
      // cells where the oracle's COUNT(*) FILTER yields 0 — coalesce
      // so sparse combinations match on both engines.
      val pivoted = Tables.orders(spark, sfDir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
      pivoted
        .select(col("o_orderstatus") +:
          priorities.map(p => coalesce(pivoted(s"`$p`"), lit(0L)).as(p)): _*)
        .orderBy(col("o_orderstatus"))
    }),

    "q_unpivot" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_pivot" -> {
      val cols = priorities.map(p =>
        s"""COUNT(*) FILTER (WHERE o_orderpriority = '$p') AS "$p"""")
        .mkString(",\n  ")
      s"""SELECT o_orderstatus,
         |  $cols
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin
  )
}
