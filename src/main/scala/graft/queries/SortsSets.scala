package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec

/** Sorts / limits / top-k + set operations (SURVEY.md §2-B).
  *
  * q_topk_global plans as TakeOrderedAndProject (per-partition top-k +
  * driver merge — no full sort, the scalable global-top-k shape; the
  * reference's find_previous_job_id is the k=1 case). Null-ordering
  * defaults differ between engines (Spark ASC = NULLS FIRST, DuckDB
  * ASC = NULLS LAST) so q_sort_nulls spells the ordering explicitly on
  * both sides.
  */
object SortsSets extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q_sort_multi" -> ((spark, sfDir) => {
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("c_name"))
        .orderBy(col("c_nationkey").asc, col("c_acctbal").desc, col("c_name").asc, col("c_custkey").asc)
    }),

    "q_sort_nulls" -> ((spark, sfDir) => {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), nullif(col("o_orderpriority"), lit("5-LOW")).as("prio"))
        .orderBy(col("prio").asc_nulls_last, col("o_orderkey").asc)
    }),

    "q_topk_global" -> ((spark, sfDir) => {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    "q_union_all" -> ((spark, sfDir) => {
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nk"))
        .unionAll(Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    "q_union_distinct" -> ((spark, sfDir) => {
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy(col("nk"))
    }),

    "q_intersect" -> ((spark, sfDir) => {
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    // SCHEMA-EVOLUTION union: two batches of the same logical table
    // with different column sets (an old and a new export format)
    // align by NAME with null fill — `unionByName(allowMissing)` is
    // what an ingest run uses when the schema grew between drops;
    // positional union would silently misalign or reject.
    "q_union_evolve" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      val oldBatch = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val newBatch = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderpriority"))
      oldBatch.unionByName(newBatch, allowMissingColumns = true)
        .select(col("o_orderkey"),
          dec(col("o_totalprice")).cast("double").as("price"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // Filtered right side (first 20 suppliers span only ~half the
    // nations) so the difference is non-empty.
    "q_except" -> ((spark, sfDir) => {
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(spark, sfDir)
          .filter(col("s_suppkey") <= 20).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    // MULTISET set-ops (EXCEPT ALL / INTERSECT ALL): multiplicity
    // matters — a part returned 3 times and accepted once keeps 2
    // copies, which the distinct-semantics q_except would collapse.
    // Spark plans both as a single count-propagating aggregate (sum of
    // ±1 tags), not a join — one shuffle on the value. Output is
    // re-grouped to (value, multiplicity) so the unordered multiset
    // compares deterministically.
    "q_except_all" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
        .exceptAll(
          li.filter(col("l_returnflag") === "A").select(col("l_partkey")))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("mult"))
        .orderBy(col("l_partkey"))
    }),

    "q_intersect_all" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
        .intersectAll(
          li.filter(col("l_returnflag") === "A").select(col("l_partkey")))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("mult"))
        .orderBy(col("l_partkey"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT c_custkey, c_nationkey, c_acctbal, c_name
        |FROM customer
        |ORDER BY c_nationkey ASC, c_acctbal DESC, c_name ASC, c_custkey ASC""".stripMargin,

    "q_sort_nulls" ->
      """SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS prio
        |FROM orders
        |ORDER BY prio ASC NULLS LAST, o_orderkey ASC""".stripMargin,

    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_union_all" ->
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,

    "q_union_distinct" ->
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,

    "q_union_evolve" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |  o_orderpriority
        |FROM (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |ORDER BY o_orderkey""".stripMargin,

    "q_intersect" ->
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,

    "q_except" ->
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS nk FROM supplier WHERE s_suppkey <= 20)
        |ORDER BY nk""".stripMargin,

    "q_except_all" ->
      """SELECT l_partkey, COUNT(*) AS mult FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT l_partkey, COUNT(*) AS mult FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
        |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin
  )
}
