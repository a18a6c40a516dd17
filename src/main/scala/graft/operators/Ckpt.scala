package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.graftbridge.Bridge

/** Checkpoint policy for the iterative operators ([[PageRank]],
  * [[graft.queries.TextOps.connectedComponents]], [[BpeTrain]],
  * [[graft.queries.SimOps.kmeansRefine]]/pqTrain). Every round of those
  * loops truncates lineage — after truncation there is NOTHING to
  * recompute the state from, so WHERE the truncated state lives decides
  * whether the job survives an executor loss:
  *
  *  - [[CkptMode.Local]] (`localCheckpoint`): blocks in executor
  *    memory/disk. Fastest (no filesystem round-trip) and the right
  *    default for a single-JVM session, but on a real cluster one lost
  *    executor mid-run kills the whole multi-hour job unrecoverably —
  *    the blocks have no lineage and no replica.
  *  - [[CkptMode.Reliable]] (`Dataset.checkpoint` into
  *    `SparkContext.setCheckpointDir`): each truncation writes the
  *    state to the checkpoint directory — on a production cluster an
  *    HDFS/object-store path — and subsequent rounds read it back from
  *    files. Executor loss costs only the in-flight tasks; Spark
  *    re-reads the snapshot and the loop continues. The recovery
  *    contract: at most `ckEvery` rounds of work are lost, never the
  *    run. (Driver loss still ends the job — that is external
  *    orchestration's restart, which can itself resume from the last
  *    snapshot if the caller persists it — and Spark's documented cost
  *    applies: a reliable checkpoint recomputes its segment once more
  *    to write the files, so each snapshot costs ~2× its segment.)
  *
  * Both modes preserve the loop disciplines the operators rely on:
  * `Dataset.checkpoint` captures the physical plan's output
  * partitioning into the `LogicalRDD` exactly like `localCheckpoint`
  * (the pre-partitioned edge tables still probe exchange-free), lazy
  * (`eager = false`) checkpoints still let the round's mandatory probe
  * action double as the materializer, and [[Ckpt.release]] frees the
  * superseded round's storage (blocks or files) at every truncation so
  * retained state stays O(current round), not O(rounds).
  */
sealed trait CkptMode

object CkptMode {

  /** Executor-resident `localCheckpoint` — fastest, dies with an
    * executor. The default everywhere; correct for local sessions and
    * for clusters where re-running a failed job is acceptable. */
  case object Local extends CkptMode

  /** Durable `Dataset.checkpoint` into the session's checkpoint
    * directory — requires `spark.sparkContext.setCheckpointDir` to
    * point at storage that survives executor loss (HDFS/object store
    * on a cluster; any path in a single-JVM session). */
  case object Reliable extends CkptMode
}

object Ckpt {

  /** Materialize (or, with `eager = false`, mark-for-materialization
    * at the next action) a loop state under `mode`. The returned
    * Dataset is the checkpoint leaf itself — pass exactly it to
    * [[release]] when a newer round supersedes it. */
  def materialize[T](ds: Dataset[T], mode: CkptMode, eager: Boolean = true): Dataset[T] =
    mode match {
      case CkptMode.Local => ds.localCheckpoint(eager)
      case CkptMode.Reliable =>
        require(ds.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "CkptMode.Reliable requires spark.sparkContext.setCheckpointDir(...) — " +
            "on a cluster, a durable (HDFS/object-store) path")
        ds.checkpoint(eager)
    }

  /** Free the storage behind a superseded checkpoint leaf: block-
    * manager blocks under [[CkptMode.Local]], checkpoint-directory
    * files under [[CkptMode.Reliable]]. The input must not be used
    * again after the call. */
  def release(ds: Dataset[_], mode: CkptMode): Unit = mode match {
    case CkptMode.Local    => Bridge.unpersistCheckpoint(ds)
    case CkptMode.Reliable => Bridge.releaseReliableCheckpoint(ds)
  }
}
