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

/** JDBC-backed store over embedded Derby (ships with Spark) — the
  * §7.3 boundary implemented against a REAL database through Spark's
  * `format("jdbc")` source/sink, matching the reference's Postgres
  * table one-for-one (DDL mirror of
  * /root/reference/Unity_to_BigQuery.py:36-42; the filter in
  * [[findPreviousJobId]] pushes down to the database as the
  * reference's WHERE did). A prod deployment only changes the URL and
  * driver class.
  */
final class JdbcCheckpointStore(spark: SparkSession, url: String,
    table: String = "ua_completed_reports",
    driver: String = "org.apache.derby.jdbc.EmbeddedDriver")
    extends CheckpointStore {
  import spark.implicits._

  // reference A2: CREATE TABLE IF NOT EXISTS (Derby has no IF NOT
  // EXISTS — swallow the table-exists SQLState instead)
  locally {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $table (
           |  job_id BIGINT NOT NULL,
           |  job_type VARCHAR(64) NOT NULL,
           |  ts TIMESTAMP NOT NULL,
           |  app_id VARCHAR(64) NOT NULL,
           |  previous_job_id BIGINT,
           |  date_range VARCHAR(64))""".stripMargin)
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () // exists
      } finally st.close()
    } finally conn.close()
  }

  private def reader =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)

  override def findPreviousJobId(jobType: String, appId: String): Option[Long] =
    reader.load()
      .filter(col("job_type") === jobType && col("app_id") === appId)
      .orderBy(col("ts").desc, col("job_id").desc)
      .limit(1)
      .select(col("job_id"))
      .as[Long]
      .collect()
      .headOption

  // Single-row commit marker → a plain JDBC INSERT (the reference's
  // A10 insert, Unity_to_BigQuery.py:178-180) — launching a Spark job
  // per checkpoint row would be overhead without distribution, and
  // Spark's Derby dialect writes strings as CLOB, clashing with the
  // reference's VARCHAR schema.
  override def append(entry: CheckpointEntry): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"INSERT INTO $table VALUES (?, ?, ?, ?, ?, ?)")
      try {
        ps.setLong(1, entry.job_id)
        ps.setString(2, entry.job_type)
        ps.setTimestamp(3, entry.ts)
        ps.setString(4, entry.app_id)
        entry.previous_job_id match {
          case Some(p) => ps.setLong(5, p)
          case None    => ps.setNull(5, java.sql.Types.BIGINT)
        }
        entry.date_range match {
          case Some(d) => ps.setString(6, d)
          case None    => ps.setNull(6, java.sql.Types.VARCHAR)
        }
        ps.executeUpdate(): Unit
      } finally ps.close()
    } finally conn.close()
  }
}
