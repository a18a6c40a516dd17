package graft.pipeline

import java.time.LocalDate

/** Export-service boundary (reference A4/A5: POST an incremental
  * export request, then poll readiness every 5 s —
  * /root/reference/Unity_to_BigQuery.py:56-75,78-86,166-169).
  *
  * Prod implements this over an HTTP client; offline, the local
  * filesystem plays the export service (SURVEY.md §7.3).
  */
trait ExportClient {
  /** Request the next export after `continueFrom` (the reference's
    * `continueFrom` body field), or from the backfill window when
    * there is no checkpoint (`startDate`, capped at 30 days —
    * reference :63-66, :157). Returns the job id, or None when the
    * service has nothing new. */
  def requestExport(appId: String, jobType: String,
      continueFrom: Option[Long]): Option[Long]

  /** Readiness poll (reference `is_raw_analytics_dump_ready`). */
  def isReady(appId: String, jobType: String, jobId: Long): Boolean

  /** Directory of a completed job's files. */
  def jobDir(appId: String, jobType: String, jobId: Long): String
}

/** Local-filesystem export service: jobs are the on-disk
  * `<date>_<jobId>` directories; an optional `backfillAnchor` models
  * "today" for the 30-day backfill cap (a literal date, never
  * `LocalDate.now()` — determinism, SURVEY.md §7.4.4). `readyAfter`
  * simulates remote completion latency in poll ticks. */
final class LocalDirExportClient(
    exportRoot: String,
    backfillAnchor: Option[LocalDate] = None,
    backfillDays: Int = 30,
    readyAfter: Int = 0) extends ExportClient {

  private val pollCount = scala.collection.mutable.Map.empty[(String, Long), Int]

  private def jobs(appId: String, jobType: String): Seq[(Long, String)] = {
    val all = UnityExport.listJobs(exportRoot, appId, jobType)
    backfillAnchor match {
      case None => all
      case Some(anchor) =>
        val cutoff = anchor.minusDays(backfillDays.toLong)
        all.filter { case (_, path) =>
          val name = new java.io.File(path).getName
          name.split("_").headOption
            .flatMap(d => scala.util.Try(LocalDate.parse(d)).toOption)
            .forall(!_.isBefore(cutoff))
        }
    }
  }

  override def requestExport(appId: String, jobType: String,
      continueFrom: Option[Long]): Option[Long] =
    jobs(appId, jobType)
      .collectFirst { case (id, _) if continueFrom.forall(id > _) => id }

  override def isReady(appId: String, jobType: String, jobId: Long): Boolean =
    synchronized {
      val k = (s"$appId/$jobType", jobId)
      val polls = pollCount.getOrElse(k, 0)
      pollCount(k) = polls + 1
      polls >= readyAfter
    }

  override def jobDir(appId: String, jobType: String, jobId: Long): String =
    UnityExport.listJobs(exportRoot, appId, jobType)
      .collectFirst { case (`jobId`, path) => path }
      .getOrElse(throw new IllegalStateException(
        s"job $jobId not found for $appId/$jobType"))
}

/** Readiness poll loop with injectable sleep (reference :166-171: 5 s
  * interval + accumulated wait_time accounting). Returns total waited
  * millis, or fails after `maxPolls`. */
final class ExportPoller(
    client: ExportClient,
    pollIntervalMs: Long = 5000L,
    maxPolls: Int = 120,
    sleep: Long => Unit = Thread.sleep) {

  def awaitReady(appId: String, jobType: String, jobId: Long): Long = {
    var waited = 0L
    var polls = 0
    while (!client.isReady(appId, jobType, jobId)) {
      polls += 1
      if (polls > maxPolls)
        throw new IllegalStateException(
          s"export $jobId for $appId/$jobType not ready after $maxPolls polls")
      sleep(pollIntervalMs)
      waited += pollIntervalMs
    }
    waited
  }
}
