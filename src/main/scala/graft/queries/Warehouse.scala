package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{CdcApply, IncrementalRollup, ScdApply, Upsert}

/** Warehouse-maintenance transforms (SURVEY.md §2-B, added round 4):
  * SCD2 history derivation, keep-latest upsert (MERGE without a table
  * format), and incremental rollup maintenance. All three are the
  * operations that keep a 100 TB warehouse CURRENT without rescanning
  * it: history and upserts touch one key-shuffle of base+delta, the
  * rollup folds delta partials into an accumulator whose size is the
  * key cardinality, not the history.
  */
object Warehouse extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // SCD2 (slowly-changing-dimension) history: per user, each VALUE
    // CHANGE opens an interval [eff_from, eff_to) closed by the next
    // change (null = current). Two window passes over one user_id
    // shuffle: lag to detect changes, lead to close intervals.
    "q_scd2" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("value"), col("ts"))
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .filter(col("prev_v").isNull || col("value") =!= col("prev_v"))
      changes
        .withColumn("eff_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("eff_from"), col("eff_to"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // SCD2 APPLY / type-2 MERGE (round-11 VERDICT gap 2): apply a
    // change batch TO the existing SCD2 dimension — close each changed
    // key's open interval at the batch timestamp, insert the new open
    // version, no-op keys whose current value is unchanged, insert
    // brand-new keys directly. The batch here is deterministic: every
    // user_id % 3 == 0 changes to 999.5 (except % 6 == 0, which
    // re-submits its current value — the exercised no-op path) at
    // max(ts) + 1 hour, plus one never-seen key (-42). Delta rows take
    // event_id -1 so (user_id, eff_from, event_id) stays a total
    // order. See operators.ScdApply for the scale shape (two
    // key-joins against the broadcastable batch; history intervals
    // preserved verbatim, never window-recomputed).
    "q_scd2_apply" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val base = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("value"), col("ts"))
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .filter(col("prev_v").isNull || col("value") =!= col("prev_v"))
        .withColumn("eff_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("eff_from"), col("eff_to"))
      val maxTs = Tables.events(spark, sfDir).agg(max(col("ts")).as("__max_ts"))
      val open = base.filter(col("eff_to").isNull)
        .select(col("user_id"), col("value"))
      val delta = open.filter(col("user_id") % 3 === 0)
        .select(col("user_id"),
          when(col("user_id") % 6 === 0, col("value"))
            .otherwise(lit(999.5)).as("value"))
        .unionAll(spark.range(1)
          .select(lit(-42L).as("user_id"), lit(7.25).as("value")))
        .crossJoin(broadcast(maxTs))
        .select(col("user_id"), lit(-1L).as("event_id"), col("value"),
          (col("__max_ts") + expr("INTERVAL 1 HOUR")).as("eff_from"))
      ScdApply(base, delta, "user_id", "value", "eff_from", "eff_to")
        .orderBy(col("user_id"), col("eff_from"), col("event_id"))
    }),

    // Ordered CDC op-log apply (round 12): final table STATE from a
    // base snapshot plus an insert/update/delete change log with
    // per-key sequence numbers — the Debezium-style merge that
    // generalizes q_upsert (keep-latest, no deletes) and complements
    // q_scd2_apply (history; this keeps state). One union + one key
    // shuffle; the last-op-wins cut is a row_number window over
    // per-key op chains (change-log depth, never table size).
    // Synthetic insert keys ride 10^13 past the base key space (the
    // q_table_diff rule — TPC-H orderkeys reach 6e6·SF, so no SF
    // collides). Sum in DECIMAL, one double cast at the end (§7.4).
    "q_cdc_apply" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      val base = o.select(col("o_orderkey").as("k"), lit(0L).as("seq"),
        lit("I").as("op"), col("o_totalprice").as("price"),
        col("o_orderpriority").as("prio"))
      val ins = o.filter(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + lit(10000000000000L)).as("k"),
          lit(1L).as("seq"), lit("I").as("op"),
          lit(100.0).as("price"), lit("6-NEW").as("prio"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), lit(2L).as("seq"),
          lit("U").as("op"), (col("o_totalprice") * 2).as("price"),
          col("o_orderpriority").as("prio"))
      val del = o.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("k"), lit(3L).as("seq"),
          lit("D").as("op"), lit(null).cast("double").as("price"),
          lit(null).cast("string").as("prio"))
      CdcApply(base.unionAll(ins).unionAll(upd).unionAll(del),
          "k", "seq", "op")
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec(col("price"))).cast("double").as("sum_price"))
        .orderBy(col("prio"))
    }),

    // Keep-latest upsert: an update batch (every 10th order, doubled
    // price, version 2) merged into the base (version 1); merged state
    // is then aggregated. Updates replace base rows by key.
    "q_upsert" -> ((spark, sfDir) => {
      val base = Tables.orders(spark, sfDir).withColumn("version", lit(1))
      val updates = Tables.orders(spark, sfDir)
        .filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("version", lit(2))
      Upsert(base, updates, Seq("o_orderkey"), "version")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Point-in-time dimension lookup: each purchase joined to the SCD2
    // interval (q_scd2's history, rebuilt inline) that was ACTIVE at
    // the purchase's timestamp — the as-of-correct warehouse join that
    // prevents attribute leakage from the future. Equi key (user_id)
    // carries the join; the validity-interval test rides as residual,
    // so the plan is a plain hash join whose per-key candidate count is
    // the user's version count — bounded, no window over the fact side,
    // scalable to any fact volume. Intervals are disjoint [from, to) so
    // every fact matches EXACTLY one version (zero-length intervals
    // from same-ts changes exclude themselves).
    "q_join_pit" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val dim = ev
        .select(col("user_id"), col("event_id"), col("value"), col("ts"))
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .filter(col("prev_v").isNull || col("value") =!= col("prev_v"))
        .withColumn("eff_to", lead(col("ts"), 1).over(w))
        .select(col("user_id").as("d_user"), col("value").as("d_value"),
          col("ts").as("eff_from"), col("eff_to"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      facts.join(dim, col("user_id") === col("d_user") &&
          col("ts") >= col("eff_from") &&
          (col("eff_to").isNull || col("ts") < col("eff_to")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("d_value"), col("eff_from"))
        .orderBy(col("event_id"))
    }),

    // Single-pass data-quality report — the validation gate a pipeline
    // runs before publishing a table: row count, per-column null
    // counts, key uniqueness (exact distinct vs rows), domain bounds,
    // value-range violations, all as ONE aggregate over ONE scan (no
    // per-check passes). At 100 TB this is the cheapest possible
    // shape: map-side partials for every metric, a 1-row result.
    "q_data_quality" -> ((spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
      o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_date"),
        countDistinct(col("o_orderkey")).as("distinct_orderkey"),
        min(col("o_orderdate")).cast("string").as("min_date"),
        max(col("o_orderdate")).cast("string").as("max_date"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("nonpositive_price"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("bad_status"))
    }),

    // Incremental rollup: the per-type event rollup maintained across
    // three append batches (split by ts) — the final accumulator must
    // equal the direct full-scan aggregate, which is exactly what the
    // oracle computes. Proves merge() is lossless.
    "q_agg_incremental" -> ((spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val cut1 = lit("2024-01-10 00:00:00").cast("timestamp_ntz")
      val cut2 = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
      val batches = Seq(
        ev.filter(col("ts") < cut1),
        ev.filter(col("ts") >= cut1 && col("ts") < cut2),
        ev.filter(col("ts") >= cut2))
      val rollup = batches.tail.foldLeft(
        IncrementalRollup.partial(batches.head, "event_type", "value")) {
        (acc, b) => IncrementalRollup.merge(acc, b, "event_type", "value")
      }
      rollup
        .select(col("event_type"), col("n"),
          col("s").cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, value, ts,
        |    LAG(value, 1) OVER w AS prev_v
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |changes AS (
        |  SELECT user_id, event_id, value, ts FROM ordered
        |  WHERE prev_v IS NULL OR value <> prev_v)
        |SELECT user_id, event_id, value, ts AS eff_from,
        |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
        |FROM changes ORDER BY user_id, event_id""".stripMargin,

    "q_scd2_apply" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, value, ts,
        |    LAG(value, 1) OVER w AS prev_v
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |base AS (
        |  SELECT user_id, event_id, value, ts AS eff_from,
        |    LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS eff_to
        |  FROM ordered WHERE prev_v IS NULL OR value <> prev_v),
        |open_v AS (SELECT user_id, value FROM base WHERE eff_to IS NULL),
        |delta AS (
        |  SELECT user_id, CAST(-1 AS BIGINT) AS event_id,
        |    CASE WHEN user_id % 6 = 0 THEN value ELSE 999.5 END AS value,
        |    (SELECT MAX(ts) FROM events) + INTERVAL 1 HOUR AS eff_from
        |  FROM open_v WHERE user_id % 3 = 0
        |  UNION ALL
        |  SELECT CAST(-42 AS BIGINT), CAST(-1 AS BIGINT), 7.25,
        |    (SELECT MAX(ts) FROM events) + INTERVAL 1 HOUR),
        |eff AS (
        |  SELECT d.user_id, d.event_id, d.value, d.eff_from
        |  FROM delta d LEFT JOIN open_v o ON d.user_id = o.user_id
        |  WHERE o.user_id IS NULL OR d.value <> o.value),
        |closed AS (
        |  SELECT b.user_id, b.event_id, b.value, b.eff_from,
        |    CASE WHEN b.eff_to IS NULL AND e.user_id IS NOT NULL
        |      THEN e.eff_from ELSE b.eff_to END AS eff_to
        |  FROM base b LEFT JOIN eff e ON b.user_id = e.user_id)
        |SELECT user_id, event_id, value, eff_from, eff_to FROM closed
        |UNION ALL
        |SELECT user_id, event_id, value, eff_from,
        |  CAST(NULL AS TIMESTAMP) AS eff_to FROM eff
        |ORDER BY user_id, eff_from, event_id""".stripMargin,

    "q_cdc_apply" ->
      """WITH oplog AS (
        |  SELECT o_orderkey AS k, 0 AS seq, 'I' AS op,
        |    o_totalprice AS price, o_orderpriority AS prio FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000000000, 1, 'I', 100.0,
        |    '6-NEW' FROM orders WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', o_totalprice * 2,
        |    o_orderpriority FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', NULL, NULL
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |last AS (
        |  SELECT k, op, price, prio,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC, op ASC) AS rn
        |  FROM oplog)
        |SELECT prio, COUNT(*) AS n,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM last WHERE rn = 1 AND op <> 'D'
        |GROUP BY prio ORDER BY prio""".stripMargin,

    "q_upsert" ->
      """WITH unioned AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority,
        |    1 AS version, 0 AS src FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 2, o_orderpriority,
        |    2 AS version, 1 AS src FROM orders WHERE o_orderkey % 10 = 0),
        |merged AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC, src DESC) AS rn
        |  FROM unioned)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM merged WHERE rn = 1
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_pit" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, value, ts,
        |    LAG(value, 1) OVER w AS prev_v
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |dim AS (
        |  SELECT user_id AS d_user, value AS d_value, ts AS eff_from,
        |    LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS eff_to
        |  FROM ordered WHERE prev_v IS NULL OR value <> prev_v),
        |facts AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT event_id, user_id, ts, d_value, eff_from
        |FROM facts JOIN dim
        |  ON user_id = d_user AND ts >= eff_from
        |  AND (eff_to IS NULL OR ts < eff_to)
        |ORDER BY event_id""".stripMargin,

    "q_data_quality" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS null_custkey,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS null_date,
        |  COUNT(DISTINCT o_orderkey) AS distinct_orderkey,
        |  CAST(MIN(o_orderdate) AS VARCHAR) AS min_date,
        |  CAST(MAX(o_orderdate) AS VARCHAR) AS max_date,
        |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nonpositive_price,
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
        |FROM orders""".stripMargin,

    "q_agg_incremental" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
