package graft.queries

import graft.Tables

/** Subquery operators: correlated scalar, IN, and correlated EXISTS
  * with an inequality — exercising Catalyst's decorrelation rewrites
  * (RewriteCorrelatedScalarSubquery, semi/anti conversion; SURVEY.md
  * §4.2 "subquery decorrelation: rely"). Both engines run the same SQL
  * text, so the oracle checks the rewrite's semantics, not just the
  * join result.
  */
object Subqueries extends QueryPack {

  private def run(viewPrefix: String, sql: String): Query = (spark, sfDir) => {
    Seq("customer", "orders", "part", "lineitem").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(s"${viewPrefix}_$t")
    }
    spark.sql(sql)
  }

  override def queries: Map[String, Query] = Map(
    // Correlated scalar subquery → decorrelated to a left outer
    // aggregate join by Catalyst.
    "q_subquery_scalar" -> run("sq1",
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM sq1_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM sq1_customer c
        |ORDER BY c_custkey""".stripMargin),

    // IN subquery → left semi join.
    "q_subquery_in" -> run("sq2",
      """SELECT o_orderkey, o_custkey
        |FROM sq2_orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM sq2_customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin),

    // Correlated EXISTS with a non-equi predicate.
    "q_subquery_exists" -> run("sq3",
      """SELECT p_partkey, p_size
        |FROM sq3_part p
        |WHERE EXISTS (
        |  SELECT 1 FROM sq3_lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size + 40)
        |ORDER BY p_partkey""".stripMargin),

    // Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 orders
    // per customer). Catalyst decorrelates it into a per-key window
    // rank + join — the same scale-safe plan q_topk_group declares by
    // hand, reached from the SQL a user actually writes.
    "q_subquery_lateral" -> run("sq4",
      """SELECT c.c_custkey, o.o_orderkey, o.price
        |FROM sq4_customer c, LATERAL (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |  FROM sq4_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)
  )

  override def oracleSql: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_in" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin,

    "q_subquery_exists" ->
      """SELECT p_partkey, p_size
        |FROM part p
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size + 40)
        |ORDER BY p_partkey""".stripMargin,

    "q_subquery_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |  FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin
  )
}
