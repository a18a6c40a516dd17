package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables.dec

/** Structured Streaming transforms generalizing the reference's
  * incremental `continueFrom` protocol
  * (/root/reference/Unity_to_BigQuery.py:63-66,155,178-180): watermark +
  * windowed state replaces the Postgres checkpoint table, and
  * commit-after-batch replaces the post-save insert.
  *
  * Each transform takes any events-shaped DataFrame — batch or
  * streaming — so the SAME code runs under `spark.read` (oracle-checked
  * via the batch-equivalent queries in [[graft.queries.Streaming]]) and
  * under `spark.readStream` (exercised with MemoryStream in
  * StreamingSpec, including late-data drop). That batch/stream parity
  * is the point: Catalyst plans the incremental execution, we only
  * declare the query.
  */
object StreamOps {

  /** Tumbling 1-hour windows per event type: count + exact decimal sum
    * (finished in double). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("event_type"), col("window.start").as("win_start"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes (each event lands in
    * exactly 2 windows — slide divides width, SURVEY.md §7.5). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Per-user session windows with a 30-minute gap. Verified boundary
    * semantics (StreamingSpec): sessions that TOUCH are merged — a gap
    * of exactly 30 min stays one session; a new session needs
    * diff > gap. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("sess_start"), col("last_ts"), col("n"))

  /** Streaming variants with event-time watermark (state eviction /
    * late-data drop). Only valid on streaming DataFrames. */
  def tumblingAggStream(events: DataFrame, watermark: String): DataFrame =
    tumblingAgg(events.withWatermark("ts", watermark))

  def sessionAggStream(events: DataFrame, watermark: String): DataFrame =
    sessionAgg(events.withWatermark("ts", watermark))

  /** Stateful dedup on event_id; bounded state via watermark. */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
