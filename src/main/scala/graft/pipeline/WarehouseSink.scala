package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse load boundary (reference A9: BigQuery_uploader.main,
  * /root/reference/bq_uploader.py:14-35 — dataset + table + file
  * format in, blocking load job out).
  */
trait WarehouseSink {
  /** Load a batch into (dataset, table); append semantics, one call per
    * export job — the reference's per-file `load_table_from_file`. */
  def load(df: DataFrame, dataset: String, table: String): Unit
}

/** Local Parquet implementation (offline substitution for the BigQuery
  * connector, SURVEY.md §7.3): one directory per (dataset, table),
  * partitioned by the lineage `job_id` column when present so re-runs
  * append whole jobs and partition pruning can target a single export.
  */
final class ParquetWarehouseSink(root: String) extends WarehouseSink {
  override def load(df: DataFrame, dataset: String, table: String): Unit = {
    val writer = df.write.mode(SaveMode.Append)
    val target = s"$root/$dataset/$table"
    if (df.columns.contains("job_id")) writer.partitionBy("job_id").parquet(target)
    else writer.parquet(target)
  }
}

/** Error-notification boundary (reference A13: slack webhook via curl,
  * /root/reference/slack_notifier.py:5-11 — here a trait with a
  * driver-side logging impl; prod would POST from the driver, never
  * via a subshell).
  */
trait Notifier {
  def notify(channel: String, message: String): Unit
}

final class LogNotifier extends Notifier {
  override def notify(channel: String, message: String): Unit =
    System.err.println(s"[notify:$channel] $message")
}

/** Test/in-memory notifier capturing messages. */
final class RecordingNotifier extends Notifier {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  override def notify(channel: String, message: String): Unit =
    buf.synchronized { buf += ((channel, message)) }
  def messages: Seq[(String, String)] = buf.synchronized(buf.toSeq)
}
