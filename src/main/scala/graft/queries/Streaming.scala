package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.dec
import graft.streaming.StreamOps

/** Batch-equivalent forms of the streaming operators (SURVEY.md §2-B
  * "Streaming"): the same [[graft.streaming.StreamOps]] transforms run
  * here over `spark.read` inputs and get oracle-checked against
  * DuckDB's relational equivalents (window buckets via time_bucket,
  * sessions via gaps-and-islands). The streaming execution path —
  * watermarks, state, late data — is covered by MemoryStream parity
  * tests (StreamingSpec), which SQL can't express.
  *
  * q_incremental_watermark is the reference's continuation predicate
  * (/root/reference/Unity_to_BigQuery.py:63-66): rows strictly after a
  * checkpoint timestamp.
  */
object Streaming extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q_stream_tumbling" -> ((spark, sfDir) => {
      StreamOps.tumblingAgg(Tables.events(spark, sfDir))
        .orderBy(col("event_type"), col("win_start"))
    }),

    "q_stream_sliding" -> ((spark, sfDir) => {
      StreamOps.slidingAgg(Tables.events(spark, sfDir))
        .orderBy(col("win_start"))
    }),

    "q_stream_session" -> ((spark, sfDir) => {
      StreamOps.sessionAgg(Tables.events(spark, sfDir))
        .orderBy(col("user_id"), col("sess_start"))
    }),

    // Dedup on the stateful-dedup key set; output only the keys so the
    // result is deterministic regardless of which physical row survives
    // (the streaming form dropDuplicatesWithinWatermark is in
    // StreamOps/StreamingSpec).
    "q_stream_dedup" -> ((spark, sfDir) => {
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .orderBy(col("user_id"), col("event_type"))
    }),

    "q_incremental_watermark" -> ((spark, sfDir) => {
      Tables.events(spark, sfDir)
        .filter(col("ts") > lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
        .select(col("event_id"), col("user_id"), col("ts"),
          dec(col("value")).cast("double").as("value"))
        .orderBy(col("event_id"))
    }),

    // Batch form of the stream-static enrichment join: events pick up
    // their market segment from the customer dimension, aggregated per
    // segment. The streaming form re-plans (and broadcasts) the dim per
    // micro-batch — parity-tested in StreamingSpec.
    "q_stream_static_join" -> ((spark, sfDir) => {
      val dim = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))
      StreamOps.staticEnrich(Tables.events(spark, sfDir), dim, "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // Batch form of the stream-static ANTI join — incremental ingest
    // hygiene: events from users present in the customer reference set
    // are dropped (e.g. already-processed ids); the streaming form
    // re-plans the reference per micro-batch (StreamingSpec parity).
    "q_stream_anti_join" -> ((spark, sfDir) => {
      val ref = Tables.customer(spark, sfDir)
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"))
      StreamOps.antiEnrich(Tables.events(spark, sfDir), ref, "c_custkey")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Batch form of the stream-stream interval join (purchases ×
    // same-user signups within the preceding hour); the watermarked
    // streaming form is StreamOps.intervalJoinStream, parity-tested in
    // StreamingSpec.
    "q_stream_join" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"),
          col("user_id").as("s_user_id"), col("ts").as("sts"))
      StreamOps.intervalJoin(purchases, signups)
        .orderBy(col("purchase_id"), col("signup_id"))
    }),

    // LEFT OUTER variant: conversion attribution where unconverted
    // purchases still appear (null signup). Batch form of
    // StreamOps.leftOuterIntervalJoin; the streaming delayed-emission
    // semantics are exercised in StreamingSpec.
    "q_stream_left_outer" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"),
          col("user_id").as("s_user_id"), col("ts").as("sts"))
      StreamOps.leftOuterIntervalJoin(purchases, signups)
        .orderBy(col("purchase_id"), col("signup_id"))
    }),

    // FULL OUTER variant: reconciliation — orphan purchases AND orphan
    // signups both surface null-padded. Batch form of
    // StreamOps.fullOuterIntervalJoin; both-side delayed-emission
    // semantics are exercised in StreamingSpec.
    "q_stream_full_outer" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"),
          col("user_id").as("s_user_id"), col("ts").as("sts"))
      StreamOps.fullOuterIntervalJoin(purchases, signups)
        .orderBy(col("purchase_id"), col("signup_id"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS win_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, win_start""".stripMargin,

    "q_stream_sliding" ->
      """SELECT ws AS win_start, COUNT(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off AS ws
        |  FROM events
        |  CROSS JOIN (VALUES (INTERVAL '0 minutes'), (INTERVAL '30 minutes')) o(off))
        |GROUP BY ws ORDER BY win_start""".stripMargin,

    "q_stream_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |numbered AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS sess_start, MAX(ts) AS last_ts,
        |  COUNT(*) AS n
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_incremental_watermark" ->
      """SELECT event_id, user_id, ts,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
        |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_stream_anti_join" ->
      """SELECT event_type, COUNT(*) AS n FROM events e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_custkey % 2 = 0 AND c.c_custkey = e.user_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, s.event_id AS signup_id
        |FROM events p JOIN events s
        |  ON p.event_type = 'purchase' AND s.event_type = 'signup'
        | AND s.user_id = p.user_id
        | AND s.ts >= p.ts - INTERVAL '1 hour' AND s.ts <= p.ts
        |ORDER BY purchase_id, signup_id""".stripMargin,

    "q_stream_left_outer" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'signup')
        |SELECT p.event_id AS purchase_id, s.event_id AS signup_id
        |FROM p LEFT JOIN s
        |  ON s.user_id = p.user_id
        | AND s.ts >= p.ts - INTERVAL '1 hour' AND s.ts <= p.ts
        |ORDER BY purchase_id, signup_id NULLS FIRST""".stripMargin,

    "q_stream_full_outer" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |s AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'signup')
        |SELECT p.event_id AS purchase_id, s.event_id AS signup_id
        |FROM p FULL JOIN s
        |  ON s.user_id = p.user_id
        | AND s.ts >= p.ts - INTERVAL '1 hour' AND s.ts <= p.ts
        |ORDER BY purchase_id NULLS FIRST, signup_id NULLS FIRST""".stripMargin
  )
}
