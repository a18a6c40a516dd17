package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics queries over the event stream — the workloads the
  * reference's users (game analytics) actually run on the warehouse it
  * fills: conversion funnels and cohort retention.
  *
  * Scale notes: every stage is a user-keyed aggregate or equi-join
  * (one user_id shuffle each, exchanges reusable across stages); no
  * global windows, no driver-side state. Timestamp arithmetic rides
  * the µs-exact ntz values (Tables' nanos→micros truncation), so both
  * engines compare identical instants.
  */
object EventsAnalytics extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // 3-step conversion funnel in STRICT time order per user:
    // first signup → first view after it → first purchase after that.
    // Funnel depth = join rounds (conditional mins chain); output is
    // one row per stage so no 1-row cross join is needed.
    "q_events_funnel" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val s = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val v = ev.filter(col("event_type") === "view")
        .join(s, "user_id")
        .filter(col("ts") > col("s_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id")
        .filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      s.agg(count(lit(1)).as("n_users"))
        .select(lit("1_signup").as("stage"), col("n_users"))
        .unionAll(v.agg(count(lit(1)).as("n_users"))
          .select(lit("2_view").as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy(col("stage"))
    }),

    // D7 cohort retention: cohort = a user's first-signup date;
    // retained = any activity exactly 7 days later. The activity set
    // is distinct (user, day), so the left join matches at most once.
    "q_events_retention" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val c = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(col("ts")).cast("date").as("cohort"))
      val active = ev
        .select(col("user_id").as("a_uid"), col("ts").cast("date").as("d"))
        .distinct()
      c.join(active,
          col("user_id") === col("a_uid") &&
          col("d") === date_add(col("cohort"), 7), "left")
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_users"), count(col("d")).as("n_retained_d7"))
        .orderBy(col("cohort"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_events_funnel" ->
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |v AS (
        |  SELECT e.user_id, MIN(e.ts) AS v_ts
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s.s_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
        |  GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s
        |  UNION ALL SELECT '2_view', COUNT(*) FROM v
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
        |ORDER BY stage""".stripMargin,

    "q_events_retention" ->
      """WITH c AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id AS a_uid, CAST(ts AS DATE) AS d FROM events)
        |SELECT cohort, COUNT(*) AS n_users, COUNT(d) AS n_retained_d7
        |FROM c LEFT JOIN active
        |  ON user_id = a_uid AND d = cohort + 7
        |GROUP BY cohort ORDER BY cohort""".stripMargin
  )
}
