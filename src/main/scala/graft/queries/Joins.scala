package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec

/** Join operators (SURVEY.md §2-B "Joins").
  *
  * Scale notes: dimension sides (part, customer, nation, region) are
  * broadcast-able at any SF — q_join_broadcast forces it explicitly,
  * the rest let AQE choose. q_join_theta keeps an equi component
  * (partkey) so it plans as a hash join + residual range filter, never
  * a nested-loop cross product. q_join_asof is implemented as a single
  * pass union + ordered window (no self-join), which shuffles each key
  * group once — the 100 TB-friendly as-of shape.
  */
object Joins extends QueryPack {

  /** Nullable 5-bucket key for q_join_nullsafe: bucket 0 becomes the
    * "unknown" (null) bucket. */
  private def nullif5(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c % 5 === 0, lit(null)).otherwise(c % 5)

  /** Both as-of directions in one place: signup/purchase rows union
    * into a single stream; walking it in time order (ascending for
    * backward, descending for forward, signups first on ts ties so
    * at-the-same-instant signups count), `last(sig_ts, ignoreNulls)`
    * over the running frame is each purchase's nearest signup. */
  private def asofJoin(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, forward: Boolean,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "signup", 0).otherwise(1).as("prio"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"))
    val tsOrd = if (forward) col("ts").desc else col("ts").asc
    val w = Window.partitionBy(col("user_id"))
      .orderBy(tsOrd, col("prio").asc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn(outCol, last(col("sig_ts"), ignoreNulls = true).over(w))
      .filter(col("prio") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col(outCol))
      .orderBy(col("event_id"))
  }

  override def queries: Map[String, Query] = Map(
    "q_join_inner" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          dec(col("o_totalprice")).cast("double").as("price"))
        .orderBy(col("o_orderkey"))
    }),

    "q_join_broadcast" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      val p  = Tables.part(spark, sfDir)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    "q_join_sortmerge" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      val o  = Tables.orders(spark, sfDir)
      li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    "q_join_left" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double").as("total"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_full" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
        .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
      val s = Tables.supplier(spark, sfDir)
        .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
      c.join(s, col("nk_c") === col("nk_s"), "full")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"), col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    }),

    "q_join_semi" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Anti against a filtered build side (customers who never placed a
    // >450k order) so the result is non-trivial at every SF.
    "q_join_anti" -> ((spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q_join_cross" -> ((spark, sfDir) => {
      Tables.region(spark, sfDir).crossJoin(Tables.nation(spark, sfDir))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q_join_theta" -> ((spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
      val p  = Tables.part(spark, sfDir)
      li.join(broadcast(p),
          li("l_partkey") === p("p_partkey") &&
          li("l_quantity").between(p("p_size") - 5, p("p_size") + 5))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // As-of join: for each purchase, the latest signup ts <= its ts for
    // the same user. One union + one window pass — no self-join, one
    // shuffle on user_id (SURVEY.md §2-B q_join_asof).
    "q_join_asof" -> ((spark, sfDir) =>
      asofJoin(spark, sfDir, forward = false, "last_signup_ts")),

    // FORWARD as-of join: for each purchase, the EARLIEST signup ts >=
    // its ts (same user) — the symmetric direction, same single-window
    // trick: walk time descending, so "last signup seen" is the nearest
    // one at-or-after the current row.
    "q_join_asof_fwd" -> ((spark, sfDir) =>
      asofJoin(spark, sfDir, forward = true, "next_signup_ts")),

    // NEAREST as-of join: whichever signup is closer in time, either
    // direction (backward wins ties). Both direction passes ride the
    // SAME user_id partitioning — the second window re-sorts in place,
    // no extra exchange — and the pick is an exact µs-interval
    // comparison (identical on both engines), never a float delta.
    "q_join_asof_nearest" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(
          col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "signup", 0).otherwise(1).as("prio"),
          when(col("event_type") === "signup", col("ts")).as("sig_ts"))
      val wb = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("prio").asc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("prio").asc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("b_ts", last(col("sig_ts"), ignoreNulls = true).over(wb))
        .withColumn("f_ts", last(col("sig_ts"), ignoreNulls = true).over(wf))
        .filter(col("prio") === 1)
        .withColumn("nearest_signup_ts",
          when(col("f_ts").isNull, col("b_ts"))
            .when(col("b_ts").isNull, col("f_ts"))
            .when(col("ts") - col("b_ts") <= col("f_ts") - col("ts"),
              col("b_ts"))
            .otherwise(col("f_ts")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("nearest_signup_ts"))
        .orderBy(col("event_id"))
    }),

    "q_join_multikey" -> ((spark, sfDir) => {
      val s = Tables.supplier(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      s.join(c, s("s_nationkey") === c("c_nationkey") && c("c_acctbal") > s("s_acctbal"))
        .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }),

    // NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): null
    // keys MATCH each other instead of vanishing — the semantics a
    // dimension join needs when "unknown" is itself a bucket. The
    // nullable key is derived (every 5th bucket nulled) so both the
    // null-null match and the plain matches are exercised; Spark
    // plans `<=>` as an ordinary hash join (null-safe keys hash like
    // values), NOT a nested loop.
    "q_join_nullsafe" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(nullif5(col("o_custkey")).as("k"),
          Tables.dec(col("o_totalprice")).as("p"))
        .groupBy(col("k"))
        .agg(sum(col("p")).as("rev"), count(lit(1)).as("n_orders"))
      val c = Tables.customer(spark, sfDir)
        .select(nullif5(col("c_custkey")).as("ck"))
        .groupBy(col("ck"))
        .agg(count(lit(1)).as("n_cust"))
      o.join(c, col("k") <=> col("ck"))
        .select(col("k"), col("n_orders"), col("n_cust"),
          col("rev").cast("double").as("rev"))
        .orderBy(col("k"))
    }),

    // Range (interval) join via BIN BLOCKING: overlapping price bands
    // [900+10k, 925+10k) matched to parts. A bare range predicate
    // plans as a broadcast-nested-loop scan of every (row, band) pair
    // — quadratic, dead at scale. Instead each band explodes to the
    // fixed-width bins it covers, the fact row computes its single
    // bin, an EQUI-join on the bin prunes to candidates, and the
    // original range predicate remains as a cheap residual. Pattern
    // generalizes to any interval/temporal join (bin = time bucket).
    "q_join_range" -> ((spark, sfDir) => {
      val bands = spark.range(0, 10).select(
        (col("id") * 10 + 900).as("lo"), (col("id") * 10 + 925).as("hi"))
      val binned = bands.select(col("lo"), col("hi"),
        explode(sequence(expr("lo div 10"), expr("(hi - 1) div 10"))).as("bin"))
      val p = Tables.part(spark, sfDir)
        .withColumn("bin", expr("cast(floor(p_retailprice / 10) as bigint)"))
      p.join(broadcast(binned),
          p("bin") === binned("bin") &&
          p("p_retailprice") >= binned("lo") && p("p_retailprice") < binned("hi"))
        .groupBy(col("lo"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("lo"))
    }),

    // Interval OVERLAP join with BOTH sides row-scale (round 12):
    // every click interval [ts, ts+1h) matched to every overlapping
    // purchase interval of the same user — q_join_range's bin
    // blocking was a small broadcast band table; this is the general
    // big⋈big case (session stitching, ad-exposure × conversion
    // windows). Each interval explodes to the fixed-width buckets it
    // covers (≤ 2 for 1h intervals on a 1h grid), candidates meet in
    // an EQUI-join on (user, bucket), the overlap predicate stays as
    // a residual, and the EXACTLY-ONCE guard — keep the pair only in
    // the bucket owning greatest(s_a, s_b), a point both intervals
    // provably cover — dedups pairs that co-occupy several buckets
    // without a distinct. Shuffle is interval-endpoints only; the
    // per-bucket fanout is bounded by interval_len/bucket_len + 1.
    // Overlap durations sum exactly in int64 µs.
    "q_join_interval" -> ((spark, sfDir) => {
      val W = 3600L * 1000000L
      def side(t: String, s: String, e: String) =
        Tables.events(spark, sfDir)
          .filter(col("event_type") === t)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as(s))
          .withColumn(e, col(s) + W)
      val a = side("click", "s1", "e1")
        .withColumn("bkt", explode(sequence(
          expr(s"s1 div ${W}L"), expr(s"(e1 - 1) div ${W}L"))))
      val b = side("purchase", "s2", "e2")
        .withColumn("bkt", explode(sequence(
          expr(s"s2 div ${W}L"), expr(s"(e2 - 1) div ${W}L"))))
      a.join(b, Seq("user_id", "bkt"))
        .filter(col("s1") < col("e2") && col("s2") < col("e1") &&
          // integer div, not `/` (double): the ownership bucket
          col("bkt") === expr(s"greatest(s1, s2) div ${W}L"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(least(col("e1"), col("e2")) - greatest(col("s1"), col("s2")))
            .as("overlap_us"))
        .orderBy(col("user_id"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_sortmerge" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(nk_c, nk_s) AS nationkey, n_cust, n_supp
        |FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS nk_s, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_theta" ->
      """SELECT p_brand, COUNT(*) AS n
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_asof" ->
      """SELECT p.event_id, p.user_id, p.ts, MAX(s.ts) AS last_signup_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON s.user_id = p.user_id AND s.ts <= p.ts
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_join_asof_fwd" ->
      """SELECT p.event_id, p.user_id, p.ts, MIN(s.ts) AS next_signup_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON s.user_id = p.user_id AND s.ts >= p.ts
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_join_asof_nearest" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT * FROM events WHERE event_type = 'signup'),
        |b AS (
        |  SELECT p.event_id, MAX(s.ts) AS b_ts
        |  FROM p LEFT JOIN s ON s.user_id = p.user_id AND s.ts <= p.ts
        |  GROUP BY p.event_id),
        |f AS (
        |  SELECT p.event_id, MIN(s.ts) AS f_ts
        |  FROM p LEFT JOIN s ON s.user_id = p.user_id AND s.ts >= p.ts
        |  GROUP BY p.event_id)
        |SELECT p.event_id, p.user_id, p.ts,
        |  CASE WHEN f_ts IS NULL THEN b_ts
        |       WHEN b_ts IS NULL THEN f_ts
        |       WHEN p.ts - b_ts <= f_ts - p.ts THEN b_ts
        |       ELSE f_ts END AS nearest_signup_ts
        |FROM p
        |JOIN b ON p.event_id = b.event_id
        |JOIN f ON p.event_id = f.event_id
        |ORDER BY p.event_id""".stripMargin,

    "q_join_multikey" ->
      """SELECT n_name, COUNT(*) AS n
        |FROM supplier s
        |JOIN customer c ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_nullsafe" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_custkey % 5 = 0 THEN NULL
        |    ELSE o_custkey % 5 END AS k,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders),
        |oa AS (SELECT k, SUM(p) AS rev, COUNT(*) AS n_orders FROM o GROUP BY k),
        |c AS (
        |  SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL
        |    ELSE c_custkey % 5 END AS ck
        |  FROM customer),
        |ca AS (SELECT ck, COUNT(*) AS n_cust FROM c GROUP BY ck)
        |SELECT k, n_orders, n_cust, CAST(rev AS DOUBLE) AS rev
        |FROM oa JOIN ca ON k IS NOT DISTINCT FROM ck
        |ORDER BY k NULLS FIRST""".stripMargin,

    "q_join_interval" ->
      """WITH a AS (
        |  SELECT user_id, epoch_us(ts) AS s1,
        |    epoch_us(ts) + 3600000000 AS e1
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT user_id, epoch_us(ts) AS s2,
        |    epoch_us(ts) + 3600000000 AS e2
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(LEAST(e1, e2) - GREATEST(s1, s2)) AS BIGINT) AS overlap_us
        |FROM a JOIN b ON a.user_id = b.user_id AND s1 < e2 AND s2 < e1
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "q_join_range" ->
      """SELECT lo, COUNT(*) AS n_parts
        |FROM part,
        |  (SELECT k * 10 + 900 AS lo, k * 10 + 925 AS hi FROM range(0, 10) t(k)) bands
        |WHERE p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY lo ORDER BY lo""".stripMargin
  )
}
