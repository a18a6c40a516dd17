package graft

import java.io.{File, FileOutputStream, OutputStreamWriter, PrintWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.pipeline._

/** Golden-file test of the reference-parity pipeline (SURVEY.md §5.2):
  * synthesize a Unity-style export tree (gzip + plain NDJSON), ingest →
  * route → partitioned warehouse write → checkpoint, then prove a
  * re-run is a no-op and a new export job is picked up incrementally
  * (the reference's continueFrom semantics,
  * /root/reference/Unity_to_BigQuery.py:63-66,88-100,178-180).
  */
class PipelineSpec extends SparkSuite {

  private val root = {
    val dir = new File("target/test-fixtures/pipeline")
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dir); dir.mkdirs()
    dir.getPath
  }

  private def writeJob(app: String, jobType: String, jobId: Long,
      rows: Int, gzip: Boolean): Unit = {
    val dir = new File(s"$root/export/$app/$jobType/2024-01-01_$jobId")
    dir.mkdirs()
    val f = new File(dir, if (gzip) "part-0.json.gz" else "part-0.json")
    val out = if (gzip)
      new PrintWriter(new OutputStreamWriter(
        new GZIPOutputStream(new FileOutputStream(f)), StandardCharsets.UTF_8))
    else new PrintWriter(f, "UTF-8")
    try {
      (0 until rows).foreach { i =>
        val m = f"${i % 60}%02d"
        out.println(
          s"""{"ts":"2024-01-01 00:$m:00","appid":"$app","type":"$jobType","userid":"u$i","sessionid":"s${jobId}_$i","platform":"ios","sdk_ver":"1.0","debug":false,"custom_params":"{\\"k\\": $i}","amount":${i * 1.5}}""")
      }
    } finally out.close()
  }

  private val config = PipelineConfig(
    exportRoot = s"$root/export",
    warehouseRoot = s"$root/warehouse",
    checkpointPath = s"$root/checkpoints",
    tenants = Seq(TenantConfig("app-a", "Dataset_A"), TenantConfig("app-b", "Dataset_B")),
    reportTypes = Seq("custom", "transaction"))

  private def mkJob(notifier: Notifier = new LogNotifier) = IngestJob(
    spark, config,
    new ParquetCheckpointStore(spark, config.checkpointPath),
    new ParquetWarehouseSink(config.warehouseRoot),
    notifier)

  test("ingest → route → partitioned write → checkpoint → incremental re-run") {
    writeJob("app-a", "custom", 101, rows = 10, gzip = true)
    writeJob("app-a", "custom", 102, rows = 5, gzip = false)
    writeJob("app-a", "transaction", 103, rows = 4, gzip = true)
    writeJob("app-b", "custom", 104, rows = 7, gzip = false)

    val first = mkJob().runAll()
    assert(first(("app-a", "custom")) == 15)
    assert(first(("app-a", "transaction")) == 4)
    assert(first(("app-b", "custom")) == 7)
    assert(first(("app-b", "transaction")) == 0)

    // routed to the tenant dataset, table = report type, partitioned by job
    val aCustom = spark.read.parquet(s"${config.warehouseRoot}/Dataset_A/custom")
    assert(aCustom.count() == 15)
    assert(aCustom.select("job_id").distinct().collect()
      .map(_.get(0).toString.toLong).toSet == Set(101L, 102L))
    // gzip payload decoded transparently; JSON fields typed by schema
    assert(aCustom.filter(col("job_id") === 101).count() == 10)
    assert(aCustom.select(sum(col("amount"))).collect().head.getDouble(0) > 0)

    // checkpoint: one entry per non-empty job, chained previous ids
    val ck = spark.read.parquet(config.checkpointPath)
    assert(ck.count() == 4)
    val chain = ck.filter(col("app_id") === "app-a" && col("job_type") === "custom")
      .orderBy(col("job_id"))
      .select(col("job_id"), col("previous_job_id")).collect()
    assert(chain.map(_.getLong(0)).toSeq == Seq(101L, 102L))
    assert(chain(0).isNullAt(1) && chain(1).getLong(1) == 101L)

    // re-run: continuation skips everything
    val second = mkJob().runAll()
    assert(second.values.forall(_ == 0L), s"re-run ingested: $second")
    assert(spark.read.parquet(config.checkpointPath).count() == 4)
    assert(spark.read.parquet(s"${config.warehouseRoot}/Dataset_A/custom").count() == 15)

    // a new export job arrives → only it is ingested
    writeJob("app-a", "custom", 105, rows = 3, gzip = true)
    val third = mkJob().runAll()
    assert(third(("app-a", "custom")) == 3)
    assert(third.values.sum == 3)
    assert(spark.read.parquet(s"${config.warehouseRoot}/Dataset_A/custom").count() == 18)
  }

  test("a failing tenant posts to the notifier and does not kill the sweep") {
    val notifier = new RecordingNotifier
    val failing = IngestJob(
      spark,
      config.copy(checkpointPath = s"$root/checkpoints2",
        warehouseRoot = s"$root/warehouse2"),
      new ParquetCheckpointStore(spark, s"$root/checkpoints2"),
      new WarehouseSink {
        override def load(df: org.apache.spark.sql.DataFrame,
            dataset: String, table: String): Unit =
          throw new RuntimeException("warehouse unavailable")
      },
      notifier)
    val res = failing.runAll()
    // jobs with pending data fail (-1) but the sweep completes
    assert(res.values.exists(_ == -1L))
    assert(res.size == 4)
    assert(notifier.messages.nonEmpty)
    assert(notifier.messages.forall(_._1 == "pipeline-errors"))
  }

  test("a file-less job halts the sweep and is retried next run") {
    val cfg = config.copy(
      checkpointPath = s"$root/checkpoints3",
      warehouseRoot = s"$root/warehouse3",
      tenants = Seq(TenantConfig("app-c", "Dataset_C")))
    val job = IngestJob(spark, cfg,
      new ParquetCheckpointStore(spark, cfg.checkpointPath),
      new ParquetWarehouseSink(cfg.warehouseRoot), new LogNotifier)

    // job 201 exists but its files haven't landed; 202 has data
    // (same dir name writeJob uses, so the files later land in place)
    new File(s"${cfg.exportRoot}/app-c/custom/2024-01-01_201").mkdirs()
    writeJob("app-c", "custom", 202, rows = 4, gzip = false)
    assert(job.run("app-c", "custom") == 0,
      "sweep must not advance past the file-less job")
    assert(!new File(cfg.checkpointPath).exists())

    // 201's files land → the retry picks up BOTH jobs in order
    writeJob("app-c", "custom", 201, rows = 3, gzip = true)
    assert(job.run("app-c", "custom") == 7)
    val ck = spark.read.parquet(cfg.checkpointPath)
      .filter(col("app_id") === "app-c")
      .orderBy(col("job_id")).select("job_id").collect().map(_.getLong(0))
    assert(ck.toSeq == Seq(201L, 202L))
  }

  test("JDBC (Derby) checkpoint store: roundtrip + incremental continuation") {
    val url = s"jdbc:derby:$root/ckpt_db;create=true"
    val store = new JdbcCheckpointStore(spark, url)
    assert(store.findPreviousJobId("custom", "app-j").isEmpty)
    store.append(CheckpointEntry(11L, "custom",
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "app-j", None, None))
    store.append(CheckpointEntry(12L, "custom",
      java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "app-j", Some(11L), None))
    store.append(CheckpointEntry(99L, "transaction",
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "app-j", None, None))
    assert(store.findPreviousJobId("custom", "app-j").contains(12L))
    assert(store.findPreviousJobId("transaction", "app-j").contains(99L))
    assert(store.findPreviousJobId("custom", "other-app").isEmpty)
    // re-opening the same database sees the committed rows
    assert(new JdbcCheckpointStore(spark, url)
      .findPreviousJobId("custom", "app-j").contains(12L))

    // the full ingest flow works unchanged over the JDBC store
    val cfg = config.copy(
      checkpointPath = "unused",
      warehouseRoot = s"$root/warehouse-jdbc",
      tenants = Seq(TenantConfig("app-j", "Dataset_J")),
      reportTypes = Seq("custom"))
    writeJob("app-j", "custom", 401, rows = 4, gzip = true)
    val job = IngestJob(spark, cfg, store,
      new ParquetWarehouseSink(cfg.warehouseRoot), new LogNotifier)
    assert(job.run("app-j", "custom") == 4)
    assert(store.findPreviousJobId("custom", "app-j").contains(401L))
    assert(job.run("app-j", "custom") == 0, "continuation must skip job 401")
  }

  test("re-run of a partially-committed job is idempotent (no duplicate rows)") {
    val cfg = config.copy(
      checkpointPath = s"$root/checkpoints4",
      warehouseRoot = s"$root/warehouse4",
      tenants = Seq(TenantConfig("app-d", "Dataset_D")),
      reportTypes = Seq("custom"))
    writeJob("app-d", "custom", 301, rows = 6, gzip = false)

    // Crash in the window between sink.load and checkpoint append: the
    // job's rows land in the warehouse but no checkpoint is written.
    val real = new ParquetCheckpointStore(spark, cfg.checkpointPath)
    val crashing = new CheckpointStore {
      override def findPreviousJobId(jobType: String, appId: String): Option[Long] =
        real.findPreviousJobId(jobType, appId)
      override def append(entry: CheckpointEntry): Unit =
        throw new RuntimeException("crash before checkpoint")
    }
    val sink = new ParquetWarehouseSink(cfg.warehouseRoot)
    val notifier = new RecordingNotifier
    assert(new IngestJob(spark, cfg, crashing, sink, notifier,
      new LocalDirExportClient(cfg.exportRoot),
      new ExportPoller(new LocalDirExportClient(cfg.exportRoot),
        pollIntervalMs = 0L, sleep = _ => ()))
      .runAll().values.toSeq == Seq(-1L))
    val target = s"${cfg.warehouseRoot}/Dataset_D/custom"
    assert(spark.read.parquet(target).count() == 6, "rows landed pre-crash")

    // The retry re-ingests job 301; dynamic partition overwrite on its
    // job_id partition must leave exactly one copy.
    val retried = IngestJob(spark, cfg, real, sink, new LogNotifier).runAll()
    assert(retried(("app-d", "custom")) == 6)
    assert(spark.read.parquet(target).count() == 6,
      "partially-committed job duplicated rows on retry")
    assert(real.findPreviousJobId("custom", "app-d").contains(301L))
  }

  test("checkpoint lookup plans as TakeOrderedAndProject (k=1 top-k)") {
    // the scaladoc's claim, held to: filter+orderBy+limit(1) must not
    // global-sort
    import org.apache.spark.sql.functions._
    val plan = spark.read.parquet(config.checkpointPath)
      .filter(col("job_type") === "custom" && col("app_id") === "app-a")
      .orderBy(col("ts").desc, col("job_id").desc)
      .limit(1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("unknown tenant is rejected") {
    intercept[IllegalArgumentException] {
      mkJob().run("no-such-app", "custom")
    }
  }

  test("config validation fails fast") {
    intercept[IllegalArgumentException] {
      PipelineConfig("", "w", "c", Seq(TenantConfig("a", "d")), Seq("custom"))
    }
    intercept[IllegalArgumentException] {
      PipelineConfig("e", "w", "c", Seq.empty, Seq("custom"))
    }
    intercept[IllegalArgumentException] {
      PipelineConfig("e", "w", "c",
        Seq(TenantConfig("a", "d1"), TenantConfig("a", "d2")), Seq("custom"))
    }
  }
}
