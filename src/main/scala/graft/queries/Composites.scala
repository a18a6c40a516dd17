package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec

/** Composite analytics queries — the TPC-H Q3/Q5/Q10/Q18 shapes a real
  * user runs first: 3–6 table joins + selective filters + aggregation +
  * top-N, all in ONE plan. The single-operator inventory never
  * exercises join ordering, AQE broadcast promotion, and partial
  * aggregation together; these do.
  *
  * Scale notes (100 TB):
  *  - `nation`/`region` are BOUNDED dimensions (25/5 rows at any SF) —
  *    broadcast explicitly. `customer`/`supplier`/`orders` grow with
  *    the data, so they are never forced broadcast: the joins are
  *    declared in selectivity order and AQE promotes a side to
  *    broadcast only when its runtime size allows, falling back to
  *    shuffled hash/sort-merge on a real cluster.
  *  - Filters sit directly on the scans (pushed to Parquet; plan shows
  *    PushedFilters for the date/flag/segment predicates), so the fact
  *    table is pruned before any shuffle.
  *  - Money math follows SURVEY §7.4.2: cast each per-row measure to a
  *    decimal BEFORE the sum (order-independent), one final cast to
  *    double for output — raw columns at the 2-scale money type,
  *    computed products at scale 6 (see [[dec6]]).
  */
object Composites extends QueryPack {

  private def tsLit(d: String) = lit(d).cast("timestamp_ntz")

  /** Money PRODUCTS cast to DECIMAL(18,6), not the 2-scale money type:
    * the fixture's prices/rates are exact 2-decimal values, so a
    * product has at most 6 true decimals — at scale 6 the double→
    * decimal rounding is unambiguous on BOTH engines, whereas rounding
    * the product to 2 decimals lands on .xx5 ties that Spark (HALF_UP)
    * and DuckDB resolve differently (measured: 6/6 q1 groups off by
    * pennies). */
  private def dec6(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 6))

  override def queries: Map[String, Query] = Map(
    // Q3 shape — shipping priority: unshipped high-revenue orders for
    // one market segment. lineitem⋈orders shuffles on orderkey once;
    // the filtered customer side joins on custkey (AQE-broadcastable
    // at small SF, shuffled at scale); top-10 via TakeOrderedAndProject.
    "q_composite_q3" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") < tsLit("1998-03-15"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") > tsLit("1998-03-15"))
        .select(col("l_orderkey"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .select(col("l_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Q1 shape — pricing summary: the canonical multi-measure grouped
    // scan. One pass, partial map-side aggregation into 6 groups; all
    // money math decimal-cast per row (order-independent sums), the
    // average closed by ONE double division of exact operands.
    "q_composite_q1" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= tsLit("2000-09-02"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax"))))
            .cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q5 shape — local-supplier volume: revenue by nation where the
    // customer and the supplier share a nation inside one region for
    // one order year. Six tables, one plan: the bounded nation/region
    // dims broadcast; customer⋈orders⋈lineitem⋈supplier chain lets
    // AQE size each side. The c_nationkey = s_nationkey equality rides
    // the supplier join as an extra equi-key — no residual filter.
    "q_composite_q5" -> ((spark, sfDir) => {
      val n = broadcast(Tables.nation(spark, sfDir))
      val r = broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA"))
      val c = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val s = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(s, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // Q10 shape — returned-item reporting: customers who returned the
    // most revenue in one quarter. Fact filtered on returnflag + the
    // order-date window before the orderkey shuffle; nation broadcast;
    // top-20 via global TakeOrderedAndProject after the groupBy.
    "q_composite_q10" -> ((spark, sfDir) => {
      val n = broadcast(Tables.nation(spark, sfDir))
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= tsLit("1997-10-01") &&
          col("o_orderdate") < tsLit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Q7 shape — volume shipping between nation pairs by year: the
    // SAME bounded dimension joined TWICE under different roles
    // (supplier nation vs customer nation), both broadcast; the
    // asymmetric n1 < n2 pair filter rides the joined row. Year
    // extraction groups the fact once; all pair/year groups are
    // bounded (25² × years), so the final aggregate is tiny.
    "q_composite_q7" -> ((spark, sfDir) => {
      val n1 = broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
      val l = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1998-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("bigint").as("l_year"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val s = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"))
      l.join(s, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q14 shape — promo revenue share: conditional aggregation over a
    // fact⋈dim join, finishing in one scalar. The month filter prunes
    // the fact scan BEFORE the partkey join; both sums ride the same
    // decimal-cast measure, and the percentage closes with double
    // multiply/divide of exact operands (identical op order in the
    // oracle).
    "q_composite_q14" -> ((spark, sfDir) => {
      val l = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= tsLit("1997-09-01") &&
          col("l_shipdate") < tsLit("1997-10-01"))
        .select(col("l_partkey"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val p = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
            sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(dec6(lit(0)))).cast("double") /
            sum(col("rev")).cast("double")).as("promo_pct"))
    }),

    // Q17 shape — small-quantity-order revenue: the correlated
    // per-part average DECORRELATED into a partition window over the
    // (brand-restricted) fact — ONE fact scan, one partkey
    // shuffle+sort. The textbook agg-then-self-join form scans the
    // fact twice (measured: no exchange reuse across the aggregated
    // and raw branches); the window computes the same per-part
    // threshold in place.
    "q_composite_q17" -> ((spark, sfDir) => {
      val pb = Tables.part(spark, sfDir)
        .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
      val byPart = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(spark, sfDir)
        .join(pb, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .withColumn("thr", lit(0.2) *
          (sum(dec(col("l_quantity"))).over(byPart).cast("double") /
            count(lit(1)).over(byPart)))
        .filter(col("l_quantity").cast("double") < col("thr"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"))
    }),

    // Q19 shape — disjunctive bracket predicates: three OR'd
    // brand/size/quantity brackets over one equi join. The partkey
    // equality keeps the join hashed; the disjunction stays a residual
    // filter on the joined row (never a nested loop), with the
    // per-side conjuncts (p_size >= 1, quantity ranges) pushable.
    "q_composite_q19" -> ((spark, sfDir) => {
      val p = Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_quantity"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("rev")).cast("double").as("revenue"))
    }),

    // Q22 shape — dormant high-balance customers: scalar-average
    // subquery (1-row broadcast cross join — the lazy in-plan form) +
    // anti join against recent orders, grouped by segment. The phone-
    // prefix grouping of textbook Q22 has no fixture column; segment
    // plays that role, and "no orders at all" (empty at any SF — every
    // customer orders) becomes "no orders since 2000-01-01".
    "q_composite_q22" -> ((spark, sfDir) => {
      val cust = Tables.customer(spark, sfDir)
      val ab = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("v"))
      val c = cust
        .select(col("c_custkey"), col("c_mktsegment"),
          dec(col("c_acctbal")).as("bal"))
        .crossJoin(broadcast(ab))
        .filter(col("bal").cast("double") > col("v"))
      val recent = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= tsLit("2000-01-01"))
        .select(col("o_custkey"))
      c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal")).cast("double").as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // Q18 shape — large-volume customers: orders whose total quantity
    // clears a threshold, joined back to customer. The per-order
    // quantity aggregate is computed ONCE (partial map-side sums, one
    // orderkey shuffle) and reused as both the filter and the output
    // measure — no IN-subquery re-scan of lineitem.
    "q_composite_q18" -> ((spark, sfDir) => {
      val qty = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 300)
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      o.join(qty, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          dec(col("o_totalprice")).cast("double").as("o_totalprice"),
          col("qty").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .limit(100)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_composite_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_composite_q3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_composite_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "q_composite_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q_composite_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name < n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_composite_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    "q_composite_q17" ->
      """WITH pb AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
        |li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN pb ON l_partkey = p_partkey),
        |a AS (
        |  SELECT l_partkey AS pk,
        |    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*)) AS thr
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM li JOIN a ON l_partkey = pk
        |WHERE CAST(l_quantity AS DOUBLE) < thr""".stripMargin,

    "q_composite_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_composite_q22" ->
      """WITH ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS v
        |  FROM customer WHERE c_acctbal > 0.0),
        |c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer CROSS JOIN ab
        |  WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > v)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM c WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_composite_q18" ->
      """WITH qty AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(qty AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN qty ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 100""".stripMargin
  )
}
