package graft.pipeline

import org.apache.spark.scheduler.{JobFailed, SparkListener, SparkListenerJobEnd}

/** Engine-level error notification (reference A13: every failure posts
  * to a Slack webhook, /root/reference/slack_notifier.py:5-11 — but
  * via a SparkListener on the driver, never an `os.system(curl)`
  * subshell): any failed Spark job is reported to the [[Notifier]]
  * with its job id and root message. Register once per application:
  *
  * {{{
  * spark.sparkContext.addSparkListener(
  *   new NotifyingListener(notifier, "pipeline-errors"))
  * }}}
  */
final class NotifyingListener(notifier: Notifier, channel: String)
    extends SparkListener {

  override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit =
    jobEnd.jobResult match {
      case JobFailed(e) =>
        notifier.notify(channel,
          s"spark job ${jobEnd.jobId} failed: ${e.getMessage}")
      case _ => ()
    }
}
