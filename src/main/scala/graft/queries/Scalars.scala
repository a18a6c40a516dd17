package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar function operators: string / regex / date / math /
  * conditional / cast (SURVEY.md §2-B).
  *
  * Cross-engine gotchas handled here:
  *  - Spark LENGTH/YEAR/MONTH/DATEDIFF emit INT, DuckDB BIGINT → cast.
  *  - DuckDB regexp_replace replaces only the FIRST match unless the
  *    'g' flag is passed; Spark replaces all.
  *  - DuckDB datediff arg order is (unit, start, end); Spark datediff
  *    is (end, start).
  *  - double→int casts: Spark truncates, DuckDB rounds — only cast
  *    integral-valued doubles (l_quantity).
  *  - math fns stay on exact inputs (IEEE-specified sqrt/%/abs) or are
  *    rounded at 6dp where libm implementations may differ (ln, power).
  */
object Scalars extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q_str_basic" -> ((spark, sfDir) => {
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"),
          concat(upper(col("c_name")), lit("-"), lower(col("c_mktsegment"))).as("cat"),
          substring(col("c_name"), 1, 10).as("sub10"),
          trim(col("c_name")).as("trimmed"),
          length(col("c_name")).cast("long").as("len"),
          regexp_replace(col("c_name"), lit("Customer"), lit("C")).as("shortname"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"))
        .orderBy(col("c_custkey"))
    }),

    "q_str_regex" -> ((spark, sfDir) => {
      Tables.part(spark, sfDir)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          col("p_name").rlike("^[a-z]+ (ring|bolt)$").as("is_ring_bolt"))
        .orderBy(col("p_partkey"))
    }),

    "q_date_funcs" -> ((spark, sfDir) => {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate").cast("date")).as("month_end"))
        .orderBy(col("o_orderkey"))
    }),

    "q_math_funcs" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(lit(100) * col("l_discount")).cast("long").as("disc_pct"),
          abs(col("l_quantity") - 25).as("dist25"),
          ceil(col("l_quantity") / 7).cast("long").as("ceil7"),
          floor(col("l_quantity") / 7).cast("long").as("floor7"),
          pow(col("l_linenumber").cast("double"), 2).as("line_sq"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          (col("l_quantity").cast("long") % 7).as("mod7"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // CASE-based tenant routing — the Spark form of the reference's
    // if/elif project-id→dataset chain (Unity_to_BigQuery.py:143-150).
    "q_cond" -> ((spark, sfDir) => {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", "now")
            .when(col("o_orderpriority") === "2-HIGH", "soon")
            .when(col("o_orderstatus") === "F", "done")
            .otherwise("later").as("route"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
          least(col("o_totalprice"), lit(400000.0)).as("capped_price"))
        .orderBy(col("o_orderkey"))
    }),

    // Error-safe casts and arithmetic (TRY_* semantics): malformed
    // input, division by zero, and numeric overflow yield NULL instead
    // of killing the job — the ingest posture for dirty data at scale
    // (a single bad row must not fail a 100 TB load). Spark's
    // try_cast/try_divide/try_add map to DuckDB's TRY_CAST and
    // CASE-guarded arithmetic; the overflow row is semantically NULL
    // on both engines.
    "q_cast_safe" -> ((spark, sfDir) => {
      Tables.part(spark, sfDir)
        .select(col("p_partkey"),
          expr("try_cast(p_name AS INT)").as("bad_int"),
          expr("try_cast(CAST(p_size AS STRING) AS INT)").as("rt_int"),
          try_divide(lit(1.0), col("p_size") - col("p_size")).as("div0"),
          expr("try_add(9223372036854775807L, p_partkey + 1)").as("ovf"))
        .orderBy(col("p_partkey"))
    }),

    "q_cast" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty_int"),
          col("l_quantity").cast("long").cast("string").as("qty_str"),
          col("l_quantity").cast("long").cast("string").cast("long").as("qty_rt"),
          col("l_extendedprice").cast("decimal(18,2)").cast("double").as("price_dec"),
          col("l_extendedprice").cast("decimal(18,2)").cast("string").as("price_str"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_shipdate").cast("date").cast("string").as("ship_str"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_str_basic" ->
      """SELECT c_custkey,
        |  CONCAT(UPPER(c_name), '-', LOWER(c_mktsegment)) AS cat,
        |  SUBSTRING(c_name, 1, 10) AS sub10,
        |  TRIM(c_name) AS trimmed,
        |  CAST(LENGTH(c_name) AS BIGINT) AS len,
        |  REGEXP_REPLACE(c_name, 'Customer', 'C', 'g') AS shortname,
        |  LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_str_regex" ->
      """SELECT p_partkey,
        |  REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  REGEXP_MATCHES(p_name, '^[a-z]+ (ring|bolt)$') AS is_ring_bolt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS BIGINT) AS y,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS m,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(100 * l_discount) AS BIGINT) AS disc_pct,
        |  ABS(l_quantity - 25) AS dist25,
        |  CAST(CEIL(l_quantity / 7) AS BIGINT) AS ceil7,
        |  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS floor7,
        |  POWER(CAST(l_linenumber AS DOUBLE), 2) AS line_sq,
        |  SQRT(l_quantity) AS sqrt_qty,
        |  ROUND(LN(l_extendedprice), 6) AS ln_price,
        |  CAST(l_quantity AS BIGINT) % 7 AS mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_cond" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'now'
        |       WHEN o_orderpriority = '2-HIGH' THEN 'soon'
        |       WHEN o_orderstatus = 'F' THEN 'done'
        |       ELSE 'later' END AS route,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  GREATEST(o_totalprice, 100000.0) AS floor_price,
        |  LEAST(o_totalprice, 400000.0) AS capped_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_cast_safe" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_name AS INTEGER) AS bad_int,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS rt_int,
        |  CASE WHEN p_size - p_size = 0 THEN NULL
        |    ELSE 1.0 / (p_size - p_size) END AS div0,
        |  CAST(NULL AS BIGINT) AS ovf
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty_int,
        |  CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS qty_str,
        |  CAST(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS BIGINT) AS qty_rt,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
