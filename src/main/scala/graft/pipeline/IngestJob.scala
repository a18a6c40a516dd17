package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** The reference's orchestration loop re-expressed on Spark:
  *
  *  - A3  checkpoint lookup   → [[CheckpointStore.findPreviousJobId]]
  *  - A4  incremental request → jobs with id > checkpoint (the local
  *        model of `continueFrom`; job ids are monotone)
  *  - A6  download + gunzip   → [[UnityExport.readJob]] (gz by ext)
  *  - A7/A8/A9 route + load   → tenant dataset, table = report type
  *        ("Table name = Report Name", reference README), via
  *        [[WarehouseSink]]
  *  - A10 checkpoint append iff the job had data (`is_files` flag,
  *        /root/reference/Unity_to_BigQuery.py:124-127,178-184)
  *  - A11/A12 tenant × report-type loop
  *        (/root/reference/Unity_to_BigQuery.py:152-186,189-216)
  *  - A13 errors → [[Notifier]] instead of aborting the sweep.
  *
  * Unlike the reference (strictly sequential, one thread), each job's
  * read→write is a distributed Spark job; the driver loop only
  * sequences commits so the checkpoint stays a consistent high
  * watermark.
  */
final class IngestJob(
    spark: SparkSession,
    config: PipelineConfig,
    checkpoints: CheckpointStore,
    sink: WarehouseSink,
    notifier: Notifier) {

  /** Ingest everything new for one (app, reportType); returns rows
    * loaded. */
  def run(appId: String, jobType: String): Long = {
    val dataset = config.datasetFor(appId).getOrElse(
      throw new IllegalArgumentException(s"unknown tenant: $appId"))
    val previous = checkpoints.findPreviousJobId(jobType, appId)
    val pending = UnityExport
      .listJobs(config.exportRoot, appId, jobType)
      .filter { case (jobId, _) => previous.forall(jobId > _) }

    var total = 0L
    var prev  = previous
    pending.foreach { case (jobId, dir) =>
      val batch = UnityExport.readJob(spark, dir, jobId)
      val n = batch.count()
      if (n > 0) {
        sink.load(batch, dataset, jobType)
        checkpoints.append(CheckpointEntry(
          job_id = jobId,
          job_type = jobType,
          ts = new Timestamp(System.currentTimeMillis()),
          app_id = appId,
          previous_job_id = prev,
          date_range = None))
        prev = Some(jobId)
        total += n
      }
    }
    total
  }

  /** The cross-product driver loop (A12): tenants × report types, one
    * failure never kills the sweep — it posts to the notifier and
    * continues, like the reference's outer try/except → Slack. */
  def runAll(): Map[(String, String), Long] =
    (for {
      tenant  <- config.tenants
      jobType <- config.reportTypes
    } yield {
      val n =
        try run(tenant.appId, jobType)
        catch {
          case e: Exception =>
            notifier.notify("pipeline-errors",
              s"ingest failed for ${tenant.appId}/$jobType: ${e.getMessage}")
            -1L
        }
      (tenant.appId, jobType) -> n
    }).toMap
}
