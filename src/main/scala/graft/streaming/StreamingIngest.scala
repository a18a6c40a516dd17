package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{PipelineConfig, UnityExport, WarehouseSink}

/** Streaming form of the ingest pipeline: `readStream` over an export
  * directory tree with the declared NDJSON schema, routed to the
  * warehouse in `foreachBatch`.
  *
  * The Structured Streaming file-source checkpoint IS the reference's
  * `continueFrom` protocol (/root/reference/Unity_to_BigQuery.py:63-66,
  * 178-180): processed files are recorded in the checkpoint log, a
  * restart resumes exactly after them, and commit-after-batch replaces
  * the post-save Postgres insert — no hand-rolled watermark table at
  * all. The batch IngestJob exists for the checkpoint-table parity
  * surface; this is what a production deployment would run.
  */
object StreamingIngest {

  /** Start an AvailableNow ingest of everything new under
    * exportRoot/appId/jobType for one tenant; returns the running
    * query (await termination to drain). */
  def start(
      spark: SparkSession,
      config: PipelineConfig,
      appId: String,
      jobType: String,
      sink: WarehouseSink,
      checkpointDir: String): StreamingQuery = {
    val dataset = config.datasetFor(appId).getOrElse(
      throw new IllegalArgumentException(s"unknown tenant: $appId"))
    spark.readStream
      .schema(UnityExport.schema)
      .option("pathGlobFilter", "*.json*")
      .json(s"${config.exportRoot}/$appId/$jobType/*")
      .withColumn("event_ts", to_timestamp(col("ts")))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink.load(batch.withColumn("batch_id", lit(batchId)), dataset, jobType)
      }
      .start()
  }
}
