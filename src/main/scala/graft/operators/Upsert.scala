package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational MERGE/upsert for engines without a table format that
  * supports it natively: rows from `updates` replace same-key rows in
  * `base`, latest `versionCol` wins, updates win version ties. One
  * shuffle on the key (union is shuffle-free; the window ranks within
  * key groups) — at warehouse scale this runs per affected partition
  * under dynamic partition overwrite, so the rewrite touches only
  * partitions the update batch hits (see ParquetWarehouseSink).
  */
object Upsert {

  /** `tiebreak`: extra ordering columns applied after (version desc,
    * updates-first) — REQUIRED for determinism when one batch can carry
    * duplicate (key, version) rows (at-least-once ingest); without it,
    * such ties pick a partitioning-dependent survivor. */
  def apply(base: DataFrame, updates: DataFrame,
      keys: Seq[String], versionCol: String,
      tiebreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc +: col("__src").desc +: tiebreak: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}

/** Mergeable incremental rollup: maintain per-key (count, sum) partial
  * aggregates across append-only delta batches without ever rescanning
  * history — `merge(acc, delta)` folds a new batch's partials into the
  * accumulator with one key-shuffle over (|acc keys| + |delta
  * partials|) rows, never the raw history. The partial-state columns
  * (`n`, decimal `s`) re-aggregate associatively, the same property
  * that makes sketches mergeable — exact here because count/sum ARE
  * their own mergeable state.
  */
object IncrementalRollup {

  /** Per-key partial state of one batch. */
  def partial(batch: DataFrame, key: String, valueCol: String): DataFrame =
    batch.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(graft.Tables.Money)).as("s"))

  /** Fold a new batch into the accumulated rollup. */
  def merge(acc: DataFrame, batch: DataFrame, key: String, valueCol: String): DataFrame =
    acc.unionByName(partial(batch, key, valueCol))
      .groupBy(col(key))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
}
