package graft

import java.io.{File, PrintWriter}
import java.time.LocalDate

import graft.pipeline.{ExportPoller, LocalDirExportClient, ExportClient}

/** Reference A4/A5 semantics: incremental export requests honor
  * continueFrom and the backfill window; the poll loop sleeps between
  * readiness checks and bounds its waiting. */
class ExportClientSpec extends SparkSuite {

  private val root = {
    val dir = new File("target/test-fixtures/exportclient")
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dir); dir.mkdirs()
    dir.getPath
  }

  private def mkJob(date: String, jobId: Long): Unit = {
    val d = new File(s"$root/app-x/custom/${date}_$jobId")
    d.mkdirs()
    val w = new PrintWriter(new File(d, "part-0.json"))
    try w.println("""{"ts":"2024-01-01 00:00:00","appid":"app-x"}""")
    finally w.close()
  }

  test("requestExport walks jobs in order and honors continueFrom") {
    mkJob("2024-01-05", 11)
    mkJob("2024-01-06", 12)
    mkJob("2024-01-07", 13)
    val c = new LocalDirExportClient(root)
    assert(c.requestExport("app-x", "custom", None).contains(11L))
    assert(c.requestExport("app-x", "custom", Some(11L)).contains(12L))
    assert(c.requestExport("app-x", "custom", Some(13L)).isEmpty)
    assert(c.requestExport("app-x", "appStart", None).isEmpty)
  }

  test("backfill window excludes jobs older than 30 days before anchor") {
    mkJob("2023-11-01", 5) // far before the window
    val anchored = new LocalDirExportClient(root,
      backfillAnchor = Some(LocalDate.parse("2024-01-20")))
    assert(anchored.requestExport("app-x", "custom", None).contains(11L),
      "job 5 (2023-11-01) must fall outside the 30-day window")
    val unanchored = new LocalDirExportClient(root)
    assert(unanchored.requestExport("app-x", "custom", None).contains(5L))
  }

  test("poller sleeps between checks and returns accumulated wait") {
    val c = new LocalDirExportClient(root, readyAfter = 3)
    var sleeps = 0L
    val poller = new ExportPoller(c, pollIntervalMs = 5000L,
      maxPolls = 10, sleep = ms => sleeps += ms)
    val waited = poller.awaitReady("app-x", "custom", 11L)
    assert(waited == 15000L && sleeps == 15000L)
  }

  test("poller gives up after maxPolls") {
    val never = new ExportClient {
      def requestExport(a: String, j: String, c: Option[Long]): Option[Long] = None
      def isReady(a: String, j: String, id: Long): Boolean = false
      def jobDir(a: String, j: String, id: Long): String = ""
    }
    val poller = new ExportPoller(never, pollIntervalMs = 1L,
      maxPolls = 3, sleep = _ => ())
    intercept[IllegalStateException] {
      poller.awaitReady("app-x", "custom", 1L)
    }
  }
}
