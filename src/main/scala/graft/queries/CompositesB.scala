package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec

/** Second batch of composite analytics queries — completes the 22
  * TPC-H query *shapes* over the driver fixtures (Q1/Q3/Q5/Q7/Q10/Q14/
  * Q17/Q18/Q19/Q22 live in [[Composites]]). The fixture has no
  * `partsupp` table and no `l_shipmode`/`l_commitdate`/`l_receiptdate`
  * columns, so the queries that need them are ADAPTED: each keeps the
  * reference query's plan shape (the joins, correlation structure, and
  * aggregation pattern that make it a benchmark) and substitutes the
  * nearest fixture column, documented per query.
  *
  * Scale notes (100 TB) follow [[Composites]]: bounded dims
  * (nation 25 / region 5 rows at any SF) broadcast explicitly; every
  * growing side stays hinted-free so AQE sizes it; money math is
  * decimal-cast per row BEFORE any sum (order-independent, hash-stable
  * vs DuckDB) with one final double cast on output.
  */
object CompositesB extends QueryPack {

  private def tsLit(d: String) = lit(d).cast("timestamp_ntz")

  /** DECIMAL(18,6) for money products — see [[Composites.dec6]]. */
  private def dec6(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 6))

  override def queries: Map[String, Query] = Map(
    // Q2 shape — min-cost regional supplier per part. partsupp is
    // adapted to the DISTINCT (l_partkey, l_suppkey) pairs actually
    // observed in lineitem, and ps_supplycost to s_acctbal; the
    // correlated MIN subquery is decorrelated into a per-part aggregate
    // joined back on decimal equality (exact — no arithmetic on the
    // compared value). Pair extraction is one lineitem shuffle; the
    // dims broadcast.
    "q_composite_q2" -> ((spark, sfDir) => {
      val pairs = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val eur = Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          dec(col("s_acctbal")).as("bal"))
      val p = Tables.part(spark, sfDir)
        .filter(col("p_type") === "SMALL" && col("p_size") < 15)
        .select(col("p_partkey"), col("p_type"))
      val cand = p
        .join(pairs, col("p_partkey") === col("l_partkey"))
        .join(eur, col("l_suppkey") === col("s_suppkey"))
      val minb = cand.groupBy(col("p_partkey").as("mk"))
        .agg(min(col("bal")).as("min_bal"))
      cand.join(minb,
          col("p_partkey") === col("mk") && col("bal") === col("min_bal"))
        .select(col("bal").cast("double").as("s_acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"), col("p_type"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q4 shape — order-priority checking via EXISTS. The reference's
    // l_commitdate < l_receiptdate lateness has no fixture column;
    // lateness is adapted to "some line shipped more than 90 days after
    // the order date". The EXISTS stays a LEFT SEMI hash join on
    // orderkey with the date comparison as a residual — one fact
    // shuffle, never a per-order subquery.
    "q_composite_q4" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= tsLit("1997-07-01") &&
          col("o_orderdate") < tsLit("1997-10-01"))
      val l = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q6 shape — forecast revenue change: the pure pushed-filter scan.
    // All three predicates (date range, discount band, quantity cap)
    // reach the Parquet reader; one global decimal sum closes the plan.
    // The discount band uses 0.045/0.075 bounds so the comparison never
    // lands on a non-representable 0.05/0.07 double edge.
    "q_composite_q6" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
          col("l_shipdate") < tsLit("1998-01-01") &&
          col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
          col("l_quantity") < 24)
        .agg(sum(dec6(col("l_extendedprice") * col("l_discount")))
          .cast("double").as("revenue"))
    }),

    // Q8 shape — national market share: the 7-table join. Customers in
    // one region (dims broadcast), parts of one type, two order years;
    // share = conditional sum over the supplier-nation flag / total,
    // per year. Both sums ride one decimal measure; the share closes
    // with a single double division in identical op order on both
    // engines.
    "q_composite_q8" -> ((spark, sfDir) => {
      val n1 = broadcast(Tables.nation(spark, sfDir))
      val r = broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA"))
      val n2 = broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation")))
      val p = Tables.part(spark, sfDir)
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val l = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_orderkey"), col("l_suppkey"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
          col("o_orderdate") < tsLit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("bigint").as("o_year"))
      val c = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"))
      val s = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n1, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .join(s, col("l_suppkey") === col("s_suppkey"))
        .join(n2, col("s_nationkey") === col("n2_key"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_18", col("volume"))
              .otherwise(dec6(lit(0)))).cast("double") /
            sum(col("volume")).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9 shape — product-type profit by nation and year. ps_supplycost
    // is adapted to a 0.6 × p_retailprice unit cost; the part filter
    // keeps the reference's p_name LIKE pattern. One fact scan feeds
    // the part/supplier/orders joins; nation broadcasts; profit is one
    // decimal-cast expression summed per (nation, year).
    "q_composite_q9" -> ((spark, sfDir) => {
      val n = broadcast(Tables.nation(spark, sfDir))
      val p = Tables.part(spark, sfDir)
        .filter(col("p_name").like("%rod%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val s = Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("bigint").as("o_year"))
      Tables.lineitem(spark, sfDir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(s, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_year"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11 shape — important-part value concentration. partsupp value is
    // adapted to per-part revenue from EUROPE-region suppliers; the
    // HAVING-vs-global-scalar correlation keeps Q11's structure with a
    // scale-free threshold (1.5 × the mean per-part value, not a fixed
    // fraction of the total, so the row count survives any SF). The
    // scalar is a 1-row broadcast cross join — lazy, in-plan.
    "q_composite_q11" -> ((spark, sfDir) => {
      val eur = Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"))
      // threshold stays DECIMAL-exact end to end: value > 1.5 × mean is
      // compared as value·2·n > 3·total with precisions narrowed so no
      // engine's multiply exceeds width 38 — a double-cast threshold
      // double-rounds in DuckDB (int128 → double → /10^scale) once the
      // unscaled total passes 2^53, flipping rows sitting exactly on
      // the boundary. The narrowing casts themselves must fail LOUDLY:
      // non-ANSI Spark yields null on decimal overflow, which the
      // threshold filter would silently drop while DuckDB raises — the
      // raise_error guards below make both engines loud (a per-part
      // value ≥ 1e18 aborts instead of vanishing from the answer).
      // Null-from-EMPTY stays legitimate: tot_v is only guarded when
      // n_v > 0, so a fixture with no EUROPE lineitems still returns
      // zero rows on both engines rather than raising.
      val d246 = org.apache.spark.sql.types.DecimalType(24, 6)
      val d306 = org.apache.spark.sql.types.DecimalType(30, 6)
      val d10 = org.apache.spark.sql.types.DecimalType(10, 0)
      def loud(c: org.apache.spark.sql.Column, guard: org.apache.spark.sql.Column,
          what: String): org.apache.spark.sql.Column =
        when(c.isNull && guard,
          raise_error(lit(s"q11 decimal overflow: $what exceeded its cast " +
            "width — widen the narrowing cast")))
          .otherwise(c)
      val v = Tables.lineitem(spark, sfDir)
        .join(eur, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("val"))
        .groupBy(col("l_partkey"))
        .agg(loud(sum(col("val")).cast(d246), lit(true), "per-part value")
          .as("value"))
      val thr = v.agg(sum(col("value")).cast(d306).as("tot_v"),
          count(lit(1)).cast(d10).as("n_v"))
        .select(loud(col("tot_v"), col("n_v") > 0, "total value").as("tot_v"),
          col("n_v"))
      v.crossJoin(broadcast(thr))
        .filter(col("value") * lit(2) * col("n_v") > lit(3) * col("tot_v"))
        .select(col("l_partkey"), col("value").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // Q12 shape — ship-mode line counts. l_shipmode has no fixture
    // column; the two-group split is adapted to a derived ship-speed
    // bucket (shipped within 30 days of the order vs later), keeping
    // Q12's join + CASE'd conditional counts + two-row output. The
    // datediff operands are midnight-aligned timestamps, so the day
    // arithmetic is exact on both engines.
    "q_composite_q12" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
          col("l_shipdate") < tsLit("1998-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("ship_bucket",
          when(datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")) <= 30, "FAST").otherwise("SLOW"))
        .groupBy(col("ship_bucket"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy(col("ship_bucket"))
    }),

    // Q13 shape — customer order-count distribution: the double
    // aggregation. LEFT join keeps zero-order customers (the o_comment
    // NOT LIKE filter is adapted to an order-priority exclusion riding
    // the join condition, as in the reference); first groupBy counts
    // per customer, second builds the histogram.
    "q_composite_q13" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
      Tables.customer(spark, sfDir).select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "5-LOW", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15 shape — top supplier by quarterly revenue: the revenue view
    // is computed ONCE (one suppkey shuffle over the date-pruned fact),
    // its max becomes a 1-row broadcast, and the equality back-join is
    // on the EXACT decimal revenue — a hash join, not a nested loop,
    // and deterministic because no arithmetic touches the compared
    // value.
    "q_composite_q15" -> ((spark, sfDir) => {
      val rev = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
          col("l_shipdate") < tsLit("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(Tables.supplier(spark, sfDir),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16 shape — supplier diversity per part attribute. partsupp is
    // the observed DISTINCT lineitem pairs; the complaints NOT IN
    // subquery is adapted to a low-balance supplier exclusion (an anti
    // join — never a per-row subquery); COUNT(DISTINCT supplier) per
    // (brand, type, size) closes with the reference's ordering.
    "q_composite_q16" -> ((spark, sfDir) => {
      val pairs = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val bad = Tables.supplier(spark, sfDir)
        .filter(col("s_acctbal") < 1000.0).select(col("s_suppkey"))
      val p = Tables.part(spark, sfDir)
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      pairs.join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q20 shape — suppliers with heavy part shipments. ps_availqty is
    // adapted to shipped quantity per (supplier, part) clearing a
    // threshold; the nested IN chain stays two LEFT SEMI joins
    // (part-name restriction inside, supplier restriction outside) —
    // the aggregate side is never broadcast-hinted.
    "q_composite_q20" -> ((spark, sfDir) => {
      val rodParts = Tables.part(spark, sfDir)
        .filter(col("p_name").like("%rod%")).select(col("p_partkey"))
      val heavy = Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
          col("l_shipdate") < tsLit("1998-01-01"))
        .join(rodParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(dec(col("l_quantity"))).as("q"))
        .filter(col("q") > 50)
        .select(col("l_suppkey"))
      Tables.supplier(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), dec(col("s_acctbal")).cast("double").as("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // Market-basket co-occurrence — top co-purchased part pairs. The
    // pair join is WITHIN an order only: both sides partition on
    // orderkey (one exchange, reused across the two branches) and the
    // per-order quadratic is bounded by basket size (≤13 parts on the
    // fixture; production caps at the mega-bucket guard threshold).
    // Never an all-pairs join across orders; the p1 < p2 inequality
    // rides the equi-join as a residual. Pair counts partial-aggregate
    // map-side before the final pair-keyed exchange.
    "q_basket_pairs" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
      val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2"))
      a.join(b, col("l_orderkey") === col("ok2") && col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("p1"), col("p2"))
        .limit(20)
    }),

    // Q21 shape — suppliers who kept orders waiting: the double
    // correlated EXISTS / NOT EXISTS, decorrelated into per-order
    // aggregates (distinct suppliers, distinct LATE suppliers) computed
    // in ONE pass over the joined fact and joined back — no per-row
    // subqueries, no second lineitem scan beyond the late-pair
    // extraction that shares the same shuffle key. Lateness is adapted
    // to "shipped >60 days after the order date" (no l_receiptdate).
    "q_composite_q21" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val l = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .cast("int"))
        .select(col("l_orderkey"), col("l_suppkey"), col("late"))
      val st = l.groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(when(col("late") === 1, col("l_suppkey"))).as("nlate"))
      val latePairs = l.filter(col("late") === 1)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      latePairs.join(st, col("l_orderkey") === col("ok"))
        .filter(col("nsupp") > 1 && col("nlate") === 1)
        .join(Tables.supplier(spark, sfDir),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_composite_q2" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |eur AS (
        |  SELECT s_suppkey, s_name, n_name,
        |    CAST(s_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cand AS (
        |  SELECT p_partkey, p_type, s_name, n_name, bal
        |  FROM part
        |  JOIN pairs ON p_partkey = l_partkey
        |  JOIN eur ON l_suppkey = s_suppkey
        |  WHERE p_type = 'SMALL' AND p_size < 15),
        |minb AS (
        |  SELECT p_partkey AS mk, MIN(bal) AS min_bal FROM cand GROUP BY 1)
        |SELECT CAST(bal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey,
        |  p_type
        |FROM cand JOIN minb ON p_partkey = mk AND bal = min_bal
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_composite_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_composite_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.045 AND l_discount <= 0.075
        |  AND l_quantity < 24""".stripMargin,

    "q_composite_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_18'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_composite_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) -
        |    0.6 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%rod%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_composite_q11" ->
      """WITH eur AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |pv AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS value
        |  FROM lineitem JOIN eur ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(value) AS DECIMAL(30,6)) AS tot_v,
        |  CAST(COUNT(*) AS DECIMAL(10,0)) AS n_v FROM pv)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
        |FROM pv CROSS JOIN t
        |WHERE value * 2 * n_v > 3 * tot_v
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q_composite_q12" ->
      """SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST' ELSE 'SLOW' END
        |    AS ship_bucket,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_composite_q13" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_composite_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE)
        |  AS total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_composite_q16" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_composite_q20" ->
      """SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE)
        |  AS s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE '%rod%'
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        |ORDER BY s_name""".stripMargin,

    "q_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, p1, p2
        |LIMIT 20""".stripMargin,

    "q_composite_q21" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderstatus = 'F'),
        |l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN o ON l_orderkey = o_orderkey),
        |st AS (
        |  SELECT l_orderkey AS ok, COUNT(DISTINCT l_suppkey) AS nsupp,
        |    COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nlate
        |  FROM l GROUP BY 1),
        |lp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late = 1)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM lp
        |JOIN st ON l_orderkey = ok
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE nsupp > 1 AND nlate = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin
  )
}
