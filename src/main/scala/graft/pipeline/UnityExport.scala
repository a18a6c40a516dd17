package graft.pipeline

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unity-export-style source: gzip/plain NDJSON files in the
  * reference's on-disk layout
  * `<root>/<app_id>/<job_type>/<yyyy-MM-dd>_<job_id>/part-*.json[.gz]`
  * (/root/reference/Unity_to_BigQuery.py:106-108,132,136-141).
  *
  * Always read with the explicit envelope schema (FIXTURES.md §3) —
  * schema-on-read inference over export volumes is an extra full pass
  * and nondeterministic. Gzip needs no code: Hadoop's GzipCodec
  * decompresses by extension (the reference's in-memory
  * gzip.GzipFile step disappears).
  */
object UnityExport {

  /** Record envelope (FIXTURES.md §3). `ts` is carried as an ISO-8601
    * string and parsed on read — export files are schema-on-read in
    * the reference, and string-typed time survives any JSON writer. */
  val schema: StructType = StructType(Seq(
    StructField("ts", StringType),
    StructField("appid", StringType),
    StructField("type", StringType),
    StructField("userid", StringType),
    StructField("sessionid", StringType),
    StructField("platform", StringType),
    StructField("sdk_ver", StringType),
    StructField("debug", BooleanType),
    StructField("custom_params", StringType),
    StructField("amount", DoubleType)))

  /** Job directories for (app, jobType), as (jobId, path). Driver-side
    * listing mirrors the reference's export fileList (:129); at scale
    * this is object-store metadata — the data reads stay distributed. */
  def listJobs(exportRoot: String, appId: String, jobType: String): Seq[(Long, String)] = {
    val dir = new File(s"$exportRoot/$appId/$jobType")
    val children = Option(dir.listFiles()).getOrElse(Array.empty[File])
    children.toSeq
      .filter(_.isDirectory)
      .flatMap { d =>
        // <yyyy-MM-dd>_<job_id>
        d.getName.split("_").lastOption.flatMap(_.toLongOption).map(_ -> d.getPath)
      }
      .sortBy(_._1)
  }

  /** Read one export job directory with the declared schema, with
    * parsed event time and lineage columns attached. */
  def readJob(spark: SparkSession, jobDir: String, jobId: Long): DataFrame =
    spark.read.schema(schema).json(jobDir)
      .withColumn("event_ts", to_timestamp(col("ts")))
      .withColumn("job_id", lit(jobId))
}
