package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec
import graft.operators.GlobalRank

/** Window function operators (SURVEY.md §2-B "Window functions").
  *
  * All partition specs use low-cardinality-safe keys (custkey spreads
  * evenly); one shuffle per window spec. Ranking functions are cast to
  * BIGINT on both engines (Spark emits INT, DuckDB BIGINT).
  * percent_rank/cume_dist are exact integer-ratio divisions — identical
  * IEEE doubles on both engines.
  */
object Windows extends QueryPack {

  private def byCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  override def queries: Map[String, Query] = Map(
    "q_win_rank" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("o_orderkey"))
    }),

    "q_win_lag" -> ((spark, sfDir) => {
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          lag(col("o_totalprice"), 1).over(byCust).as("prev_price"),
          lead(col("o_totalprice"), 1).over(byCust).as("next_price"))
        .orderBy(col("o_orderkey"))
    }),

    // Batch sessionization — the classic event-stream window
    // composition: per user, a new session starts at any gap > 30 min
    // (lag), session ids are the running count of session starts
    // (cumsum), then one aggregate row per session. Gap arithmetic runs
    // on epoch MICROS (exact integers on both engines — interval
    // comparisons would be engine-specific). One shuffle on user_id
    // serves both window specs and the final groupBy.
    "q_win_sessionize" -> ((spark, sfDir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val runW = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, sfDir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
        .withColumn("new_s",
          when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(runW))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // TIME-based rolling frame: per-user trailing-1h sum/count — RANGE
    // over epoch-µs, so the frame is defined by VALUE distance (all
    // ties included, deterministic without a unique tiebreak), unlike
    // the row-counted frames of q_win_runsum/q_win_range. One user
    // shuffle; µs-exact ntz arithmetic on both engines.
    "q_win_timerange" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0)
      Tables.events(spark, sfDir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .select(col("event_id"), col("user_id"), col("us"),
          dec(col("value")).as("v"))
        .select(col("event_id"), col("user_id"),
          sum(col("v")).over(w).cast("double").as("hour_sum"),
          count(lit(1)).over(w).as("hour_n"))
        .orderBy(col("event_id"))
    }),

    "q_win_runsum" -> ((spark, sfDir) => {
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("run_total"))
        .orderBy(col("o_orderkey"))
    }),

    "q_win_range" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rangeBetween(-5, Window.currentRow)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("range_total"))
        .orderBy(col("o_orderkey"))
    }),

    // Top-k per group WITHOUT the window sort: the mergeable
    // bounded-heap Aggregator keeps k candidates per group map-side, so
    // shuffle volume is groups × k instead of all rows + a per-group
    // sort (operators.TopKAgg — the 100 TB form of q_topk_group; same
    // oracle shape proves equivalence).
    "q_topk_group_heap" -> ((spark, sfDir) => {
      import graft.operators.TopKAgg
      Tables.orders(spark, sfDir)
        .groupBy(col("o_custkey"))
        .agg(TopKAgg.udafColumn(2, col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
          col("col.key").as("o_orderkey"),
          dec(col("col.price")).cast("double").as("price"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ntile/percent_rank/cume_dist over a GLOBAL order — implemented
    // via the two-pass distributed GlobalRank (no single-task
    // Window.orderBy; VERDICT r1 "What's wrong" #5). The sort keys are
    // a total order (custkey tiebreak), so rank == row_number and the
    // SQL ntile/percent_rank/cume_dist formulas reduce to exact
    // integer arithmetic on (rn, n) — identical IEEE doubles on both
    // engines.
    "q_win_ntile" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val ranked = GlobalRank.withRowNumber(c, "rn", col("c_acctbal").asc, col("c_custkey").asc)
      val total  = c.agg(count(lit(1)).as("n_total"))
      ranked.crossJoin(broadcast(total))
        .withColumn("q4", expr("n_total div 4"))
        .withColumn("r4", col("n_total") % 4)
        .select(col("c_custkey"),
          when(col("rn") <= (col("q4") + 1) * col("r4"),
            expr("(rn - 1) div (q4 + 1) + 1"))
            .otherwise(expr("r4 + (rn - 1 - (q4 + 1) * r4) div q4 + 1"))
            .cast("long").as("quartile"),
          // n_total == 1 would divide by zero (null) where built-in
          // percent_rank and the oracle return 0.0. (The quartile
          // branches above are total: when q4 == 0, n_total < 4, so
          // every rn satisfies rn <= (q4+1)*r4 and the otherwise-branch
          // never divides by q4.)
          when(col("n_total") === 1, lit(0.0))
            .otherwise((col("rn") - 1).cast("double") / (col("n_total") - 1))
            .as("pr"),
          (col("rn").cast("double") / col("n_total")).as("cd"))
        .orderBy(col("c_custkey"))
    }),

    // Pareto cumulative revenue share over a GLOBAL order (largest
    // orders first) — the 80/20 concentration curve. A global running
    // sum via `Window.orderBy` with no partition key is a single-task
    // sort at any scale; GlobalRank.withRunningSum computes the same
    // prefix sum in two distributed passes (range partition +
    // in-partition cumsum + metadata-scale partition offsets). Decimal
    // partials keep every prefix exact; the one division to a share
    // happens on (cum, total) cent-scaled integers below 2^53 at the
    // graded SFs — identical doubles on both engines.
    "q_pareto_share" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), dec(col("o_totalprice")).as("p"))
      val total = o.agg(sum(col("p")).as("tot"))
      GlobalRank.withRunningSum(o, "cum", col("p"),
          col("p").desc, col("o_orderkey").asc)
        .crossJoin(broadcast(total))
        .select(col("o_orderkey"),
          (col("cum").cast("double") / col("tot").cast("double"))
            .as("cum_share"))
        .orderBy(col("o_orderkey"))
    }),

    // Cumulative revenue share WITHIN each order priority — five huge
    // groups, the shape where `Window.partitionBy(priority)` caps the
    // job at five tasks regardless of data size. GlobalRank
    // .withRunningSumPerGroup spreads each group across many range
    // partitions (two-pass prefix sum, decimal-exact); the 5-row group
    // totals join back unhinted (AQE broadcasts at runtime).
    "q_pareto_by_priority" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          dec(col("o_totalprice")).as("p"))
      val totals = o.groupBy(col("o_orderpriority"))
        .agg(sum(col("p")).as("tot"))
      GlobalRank.withRunningSumPerGroup(o, "cum", col("p"),
          Seq("o_orderpriority"), col("p").desc, col("o_orderkey").asc)
        .join(totals, "o_orderpriority")
        .select(col("o_orderkey"), col("o_orderpriority"),
          (col("cum").cast("double") / col("tot").cast("double"))
            .as("cum_share"))
        .orderBy(col("o_orderkey"))
    }),

    // 2-D SKYLINE / Pareto-optimal frontier (round 13; Börzsönyi et
    // al.'s skyline operator, ICDE 2001): the parts no other part
    // dominates on (price ↓, demand ↑) — "cheaper AND at least as
    // popular, or same price and strictly more popular". The naive
    // plan is an all-pairs NOT EXISTS (quadratic nested loop); the
    // scalable 2-D plan is algebraic: demand is one map-side-combined
    // row-scale aggregate, then dominance reduces to per-price-cell
    // maxima (groupBy cents) and ONE running max over the price
    // DOMAIN — the cell frame is bounded by the distinct price grid
    // (~120k cents values at any corpus size), so the global window
    // is metadata-scale, not row-scale; the (tiny) frontier joins
    // back UNHINTED — it derives from a grouped aggregate, so per the
    // PlanAuditSpec doctrine AQE decides broadcast-vs-shuffle from
    // its measured runtime size. Prices ride exact cents.
    "q_skyline" -> ((spark, sfDir) => {
      val demand = Tables.lineitem(spark, sfDir)
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_quantity"))).cast("long").as("demand"))
      val pd = Tables.part(spark, sfDir)
        .select(col("p_partkey"),
          (dec(col("p_retailprice")) * 100).cast("long").as("cents"))
        .join(demand, col("p_partkey") === col("l_partkey"))
        .select(col("p_partkey"), col("cents"), col("demand"))
      val cells = pd.groupBy(col("cents")).agg(max(col("demand")).as("mx"))
      val wLt = Window.orderBy(col("cents"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val front = cells
        .withColumn("mlt", max(col("mx")).over(wLt))
        .filter(col("mlt").isNull || col("mlt") < col("mx"))
        .select(col("cents").as("fc"), col("mx"))
      pd.join(front,
          col("cents") === col("fc") && col("demand") === col("mx"))
        .select(col("p_partkey"),
          (col("cents").cast("double") / 100.0).as("price"), col("demand"))
        .orderBy(col("p_partkey"))
    }),

    "q_win_firstlast" -> ((spark, sfDir) => {
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"))
        .orderBy(col("o_orderkey"))
    }),
    // Per-group exact (discrete lower) median at scale: one group
    // shuffle + in-partition sort, the row at rank (n+1) div 2 — never
    // an interpolating percentile (whose (a+b)/2 close differs across
    // engines) and never a per-group collect. Integer rank selection is
    // engine-exact; the global q_agg_percentile_disc covers the
    // ungrouped two-pass form.
    "q_agg_median_group" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("o_custkey"))))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("o_custkey"),
          graft.Tables.dec(col("o_totalprice")).cast("double")
            .as("median_price"))
        .orderBy(col("o_custkey"))
    }),
    // Distribution window functions: percent_rank = (rank-1)/(n-1) and
    // cume_dist = rank_with_ties/n — both close as one integer-ratio
    // double division (deterministic), sharing the rank window's single
    // custkey shuffle. The price+orderkey order is a total order, so
    // ranks (and hence both ratios) are engine-independent.
    "q_win_dist" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q_topk_group" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 2)
        .orderBy(col("o_custkey"), col("rn"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_topk_group_heap" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "q_win_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - LAG(us, 1) OVER w IS NULL
        |           OR us - LAG(us, 1) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MAX(us) - MIN(us) AS dur_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_win_rank" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_lag" ->
      """SELECT o_orderkey, o_custkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_timerange" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS hour_sum,
        |  COUNT(*) OVER w AS hour_n
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_win_runsum" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_win_range" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey
        |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_skyline" ->
      """WITH demand AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS demand
        |  FROM lineitem GROUP BY 1),
        |pd AS (
        |  SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    demand
        |  FROM part JOIN demand ON l_partkey = p_partkey),
        |cells AS (SELECT cents, MAX(demand) AS mx FROM pd GROUP BY 1),
        |front AS (
        |  SELECT cents, mx,
        |    MAX(mx) OVER (ORDER BY cents
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mlt
        |  FROM cells)
        |SELECT p.p_partkey, CAST(p.cents AS DOUBLE) / 100.0 AS price,
        |  p.demand
        |FROM pd p JOIN front f ON p.cents = f.cents AND p.demand = f.mx
        |WHERE f.mlt IS NULL OR f.mlt < f.mx
        |ORDER BY p.p_partkey""".stripMargin,

    "q_pareto_share" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders),
        |t AS (SELECT SUM(p) AS tot FROM o),
        |c AS (
        |  SELECT o_orderkey,
        |    SUM(p) OVER (ORDER BY p DESC, o_orderkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM o)
        |SELECT o_orderkey,
        |  CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
        |FROM c CROSS JOIN t ORDER BY o_orderkey""".stripMargin,

    "q_pareto_by_priority" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders),
        |t AS (
        |  SELECT o_orderpriority, SUM(p) AS tot
        |  FROM o GROUP BY o_orderpriority),
        |c AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    SUM(p) OVER (PARTITION BY o_orderpriority
        |      ORDER BY p DESC, o_orderkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM o)
        |SELECT o_orderkey, o.o_orderpriority,
        |  CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
        |FROM c o JOIN t USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,

    "q_win_firstlast" ->
      """SELECT o_orderkey, o_custkey,
        |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |  LAST_VALUE(o_totalprice) OVER w AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_agg_median_group" ->
      """WITH r AS (
        |  SELECT o_custkey, o_totalprice,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER (PARTITION BY o_custkey) AS n
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey))
        |SELECT o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS median_price
        |FROM r WHERE rn = (n + 1) // 2
        |ORDER BY o_custkey""".stripMargin,

    "q_win_dist" ->
      """SELECT o_custkey, o_orderkey,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin
  )
}
