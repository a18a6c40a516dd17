package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** High-watermark store enabling incremental continuation — the Spark
  * form of the reference's `ua_completed_reports` Postgres table
  * (/root/reference/Unity_to_BigQuery.py:36-42 DDL, :88-100 lookup,
  * :178-180 append).
  *
  * Schema mirrors the reference's column-for-column (date_range is
  * declared there but never populated — kept for parity).
  */
final case class CheckpointEntry(
    job_id: Long,
    job_type: String,
    ts: Timestamp,
    app_id: String,
    previous_job_id: Option[Long],
    date_range: Option[String])

trait CheckpointStore {
  /** The reference's one real query (A3): filter job_type+app_id, order
    * by ts desc, take 1. */
  def findPreviousJobId(jobType: String, appId: String): Option[Long]

  /** Commit-after-save (A10) — only called once a job's files landed. */
  def append(entry: CheckpointEntry): Unit
}

/** Parquet-backed store (offline substitution for JDBC, SURVEY.md §7.3
  * — the trait boundary is the reference's class boundary; a prod
  * deployment implements this over `format("jdbc")`).
  */
final class ParquetCheckpointStore(spark: SparkSession, path: String)
    extends CheckpointStore {
  import spark.implicits._

  // Resolve through the Hadoop FileSystem for the configured path —
  // java.io.File would silently report "no checkpoint" for any
  // non-local scheme (hdfs://, s3a://) and re-ingest from scratch.
  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def findPreviousJobId(jobType: String, appId: String): Option[Long] = {
    if (!exists) return None
    // filter → orderBy → limit(1) plans as TakeOrderedAndProject:
    // per-partition top-1 + driver merge, no global sort — the
    // scale-correct k=1 top-k (the reference pushed this to Postgres
    // and then fetchone()'d an unlimited sort).
    spark.read.parquet(path)
      .filter(col("job_type") === jobType && col("app_id") === appId)
      .orderBy(col("ts").desc, col("job_id").desc)
      .limit(1)
      .select(col("job_id"))
      .as[Long]
      .collect()
      .headOption
  }

  override def append(entry: CheckpointEntry): Unit =
    Seq(entry).toDS().write.mode(SaveMode.Append).parquet(path)
}
