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

/** Type-2 MERGE: apply a change batch TO an existing SCD2 dimension —
  * the maintenance operator a warehouse runs nightly (complements
  * q_scd2, which DERIVES history from events, and Upsert, which is
  * type-1 keep-latest). For each delta row: if the key's current
  * (open, `to` IS NULL) version already carries the same value the
  * row is a NO-OP; otherwise the open interval closes at the delta's
  * effective timestamp and a new open version inserts. Keys absent
  * from the base insert an open version directly.
  *
  * Scale shape: two key-joins of base against the (typically
  * batch-sized, broadcastable) delta plus one union — history rows
  * are never window-sorted or rewritten beyond the one closed
  * interval per changed key, and existing interval bounds are
  * PRESERVED verbatim (no lead() recompute), so gapped or irregular
  * histories survive untouched. Assumes at most one delta row per
  * key per batch (pre-collapse a multi-change batch with Upsert
  * keep-latest first); idempotent under replay — re-applying a batch
  * finds every changed key's current value already equal and no-ops
  * (spec asserts apply∘apply = apply).
  */
object ScdApply {

  def apply(base: DataFrame, delta: DataFrame, key: String,
      value: String, from: String, to: String): DataFrame = {
    // the documented precondition, ENFORCED: a batch with two rows for
    // one key would fan the close-join out and insert two open
    // versions — silent dimension corruption; fail loudly instead
    // (pre-collapse multi-change batches with Upsert keep-latest
    // first). Batch-sized action, one tiny aggregate.
    require(delta.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).count() == 0,
      s"ScdApply: delta carries multiple rows for one '$key' — " +
        "pre-collapse the batch (keep-latest) before applying")
    val open = base.filter(col(to).isNull)
      .select(col(key).as("__k"), col(value).as("__cur"))
    // effective delta rows: new keys, or keys whose current value
    // actually changes (value-equal rows are no-ops). Null-SAFE
    // comparison: a NULL delta value (nulling an attribute out) and a
    // NULL current value must compare as values, not propagate NULL
    // through =!= and silently drop the change.
    val eff = delta.join(open, col(key) === col("__k"), "left")
      .filter(col("__k").isNull || !(col(value) <=> col("__cur")))
      .drop("__k", "__cur")
      .withColumn(to, lit(null).cast(base.schema(to).dataType))
    val changed = eff.select(col(key).as("__ck"), col(from).as("__nf"))
    base.join(changed, col(key) === col("__ck"), "left")
      .withColumn(to,
        when(col(to).isNull && col("__ck").isNotNull, col("__nf"))
          .otherwise(col(to)))
      .drop("__ck", "__nf")
      .unionByName(eff)
  }
}
