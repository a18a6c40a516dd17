package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered change-data-capture apply: materialize the FINAL state of a
  * table from a change log of insert/update/delete operations with
  * per-key sequence numbers — the Debezium-style op-log merge a
  * lakehouse runs to mirror an OLTP source. Complements the existing
  * warehouse family: [[Upsert]] is keep-latest without deletes,
  * [[ScdApply]] keeps type-2 HISTORY; CdcApply keeps STATE under the
  * full I/U/D alphabet (a delete hides the key; a later re-insert
  * resurrects it).
  *
  * Reference scope: the reference pipeline only ever appends
  * (Unity_to_BigQuery.py:178-180 records completed jobs, never
  * deletes); CDC apply is the north-star warehouse extension.
  *
  * Scale: ONE hash shuffle of base ∪ oplog on the key, then a
  * row_number window whose partitions are per-key op chains — bounded
  * by change-log depth per key (never table size), so the plan
  * survives any table volume; AQE coalesces the post-window output.
  * Determinism: the cut orders by (seq DESC, op ASC) so replays with
  * duplicated sequence numbers still resolve identically; callers
  * should assign unique seqs per key (a Kafka offset, a log LSN).
  */
object CdcApply {

  /** The winning (highest-seq) op row per key, INCLUDING delete
    * winners — the tombstone-preserving form
    * [[graft.streaming.StreamOps.cdcSink]] persists so that replayed
    * or out-of-order batches cannot resurrect a deleted key. */
  def winners(oplog: DataFrame, keyCol: String, seqCol: String,
      opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).asc)
    oplog.withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
      .drop("__cdc_rn")
  }

  /** @param oplog base rows (as 'I' ops at the lowest seq) unioned
    *              with the change log; must carry `keyCol`, `seqCol`,
    *              `opCol` ('I' | 'U' | 'D') plus payload columns
    * @return one row per surviving key: the payload of its
    *         highest-seq op, dropped entirely if that op is a delete */
  def apply(oplog: DataFrame, keyCol: String, seqCol: String,
      opCol: String): DataFrame =
    winners(oplog, keyCol, seqCol, opCol).filter(col(opCol) =!= "D")
}
