package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.Tables.dec

/** Scan / source / sink operators (SURVEY.md §2-B "Scans / sources /
  * sinks") — the rows that directly encode reference behaviors:
  * NDJSON event ingestion and gzip wire format
  * (/root/reference/Unity_to_BigQuery.py:132,136-141), CSV with header
  * skip (/root/reference/bq_uploader.py:24-25), and the partitioned
  * file layout (/root/reference/Unity_to_BigQuery.py:106-108).
  *
  * The NDJSON/gz/CSV inputs don't exist as driver fixtures, so each
  * query derives them deterministically from the parquet tables
  * (FIXTURES.md §3) under target/fixtures/<sf>/ (overwrite → idempotent)
  * and then reads them back; the DuckDB oracle computes the same result
  * straight from the parquet table, so the round-trip fidelity of the
  * format (JSON/CSV double shortest-round-trip, gzip transparency,
  * header skip) is exactly what's under test.
  *
  * All reads use explicit schemas — schema inference over 100 TB of
  * JSON is an extra full pass and nondeterministic (SURVEY.md §7.5).
  */
object ScansSinks extends QueryPack {

  /** Unity-export-style record envelope derived from `events`
    * (FIXTURES.md §3: event_id→sessionid, user_id→userid,
    * event_type→type, props→custom_params, value→amount). */
  private def exportRecords(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id").cast("string").as("sessionid"),
      col("user_id").cast("string").as("userid"),
      col("event_type").as("type"),
      col("props").as("custom_params"),
      col("value").as("amount"))

  private val exportSchema = StructType(Seq(
    StructField("sessionid", StringType),
    StructField("userid", StringType),
    StructField("type", StringType),
    StructField("custom_params", StringType),
    StructField("amount", DoubleType)))

  /** Shared result shape: per report type, row count, exact decimal sum
    * of amount (finished in double), distinct users. */
  private def exportAgg(df: DataFrame): DataFrame =
    df.groupBy(col("type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("amount"))).cast("double").as("sum_amount"),
        countDistinct(col("userid")).as("n_users"))
      .orderBy(col("type"))

  private val exportAggOracle =
    """SELECT event_type AS type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount,
      |  COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_users
      |FROM events GROUP BY 1 ORDER BY type""".stripMargin

  override def queries: Map[String, Query] = Map(
    // Plain full-width parquet scan, totally ordered.
    "q_scan_parquet" -> ((spark, sfDir) => {
      Tables.lineitem(spark, sfDir)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_scan_ndjson" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "events_ndjson")
      exportRecords(spark, sfDir).write.mode("overwrite").json(dir)
      exportAgg(spark.read.schema(exportSchema).json(dir))
    }),

    // Same wire format gzipped — Hadoop decompresses by extension, the
    // reference's gzip.GzipFile step (:136-137) disappears entirely.
    "q_scan_ndjson_gz" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "events_ndjson_gz")
      exportRecords(spark, sfDir).write.mode("overwrite")
        .option("compression", "gzip").json(dir)
      exportAgg(spark.read.schema(exportSchema).json(dir))
    }),

    // Plain-text source — one document per line, the dominant raw LLM
    // corpus layout (every *.txt dump). The text source yields a single
    // `value` column; structure is whatever the pipeline parses out of
    // the line (id<TAB>text here). Equality with the parquet-side
    // oracle proves the line round-trip loses nothing.
    "q_scan_text" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "documents_text")
      Tables.documents(spark, sfDir)
        .select(concat(col("doc_id"), lit("\t"), col("text")).as("value"))
        .write.mode("overwrite").text(dir)
      spark.read.text(dir)
        .select(
          split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
          split(col("value"), "\t").getItem(1).as("text"))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q_scan_csv_header" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "customer_csv")
      val cust = Tables.customer(spark, sfDir)
      cust.write.mode("overwrite").option("header", "true").csv(dir)
      spark.read.schema(cust.schema).option("header", "true").csv(dir)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // ORC round-trip (the second columnar format Spark ships a native
    // vectorized reader for): write the export records as ORC, read
    // back with explicit schema, aggregate — oracle computes the same
    // result from the parquet source, so ORC encode/decode fidelity is
    // what's under test.
    "q_scan_orc" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "events_orc")
      exportRecords(spark, sfDir).write.mode("overwrite").orc(dir)
      exportAgg(spark.read.schema(exportSchema).orc(dir))
    }),

    // Malformed-record-TOLERANT NDJSON scan: real export feeds carry
    // truncated/garbage lines, and one of them must not kill a 100 TB
    // ingest. PERMISSIVE mode routes unparseable lines into
    // _corrupt_record; valid rows aggregate to exactly the clean
    // result (the oracle aggregates the pristine events table — equal
    // iff every good line survives and every bad line is dropped).
    "q_scan_json_corrupt" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "events_ndjson_corrupt")
      exportRecords(spark, sfDir).write.mode("overwrite").json(dir)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "garbage.json"),
        java.util.Arrays.asList("this is not json", "{\"userid\": trunca",
          "[]]", "{\"type\":\"view\",\"amount\":\"NaNaN"))
      val schema = exportSchema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType)
      exportAgg(spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
        .filter(col("_corrupt_record").isNull)
        .drop("_corrupt_record"))
    }),

    // Z-ORDERED layout: rows sorted by the Morton interleave of
    // (custkey, totalprice) before writing, so parquet min/max stats
    // prune files for predicates on EITHER dimension (ZOrderSpec
    // measures the pruning win; this query checks the reordering loses
    // nothing — the 2-D box aggregate must equal the plain table's).
    "q_scan_zorder" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "orders_zorder")
      graft.operators.ZOrder.write(
        Tables.orders(spark, sfDir), "o_custkey", "o_totalprice", dir, 16)
      spark.read.parquet(dir)
        .filter(col("o_custkey") < 500 && col("o_totalprice").between(50000, 200000))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Bucketed + sorted table sink: the persistent layout that makes
    // repeated joins/aggregations on the bucket key exchange-free
    // (BucketingSpec asserts the zero-Exchange join plan). saveAsTable
    // because bucket metadata lives in the catalog, not the files.
    "q_sink_bucketed" -> ((spark, sfDir) => {
      val tbl = "orders_bucketed_sink"
      graft.operators.Bucketing.writeBucketed(
        Tables.orders(spark, sfDir), tbl, "o_custkey", buckets = 8,
        path = Some(fixtureDir(sfDir, "orders_bucketed")))
      spark.table(tbl)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Scan-time schema evolution: two write epochs with different
    // schemas (a column added mid-stream — the warehouse reality)
    // read back through ONE `mergeSchema` scan; rows from the old
    // epoch surface the new column as null. mergeSchema costs a
    // footer-merge pass, so production turns it on per-read, not
    // globally — exactly how it's scoped here. The rollup coalesces
    // pre-schema rows into a sentinel group and must equal computing
    // the same split straight from the source (the oracle's CASE).
    "q_scan_parquet_merge" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "orders_evolve")
      val o = Tables.orders(spark, sfDir)
      val cut = lit("1998-01-01").cast("timestamp_ntz")
      val pre = o.filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_totalprice"))
      val post = o.filter(col("o_orderdate") >= cut)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      // an empty epoch writes no part files, so the mergeSchema read
      // would silently lose that epoch's columns and fail resolution
      // downstream — surface the fixture-shape dependency loudly instead
      require(!pre.isEmpty && !post.isEmpty,
        s"orders fixture must straddle the $cut schema-evolution cut " +
          "(one epoch is empty — adjust the cut for this fixture)")
      pre.write.mode("overwrite").parquet(s"$dir/epoch=1")
      post.write.mode("overwrite").parquet(s"$dir/epoch=2")
      spark.read.option("mergeSchema", "true").parquet(dir)
        .groupBy(coalesce(col("o_orderpriority"), lit("(pre-schema)")).as("prio"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("prio"))
    }),

    // Partitioned write (ref A7 layout) → read back through the
    // partition-discovered directory tree; per-partition rollup must
    // equal the source aggregation.
    "q_sink_parquet_part" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "events_part")
      Tables.events(spark, sfDir)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // DYNAMIC partition overwrite — the backfill shape: recompute ONE
    // partition and overwrite only it, leaving every other partition's
    // files untouched (static overwrite mode would clobber the whole
    // table — the classic warehouse data-loss foot-gun this conf
    // exists to prevent). At 100 TB a backfill rewrites exactly the
    // partitions it produced rows for; the read-back aggregate proves
    // the untouched partitions survived alongside the recomputed one.
    "q_sink_partition_overwrite" -> ((spark, sfDir) => {
      val dir = fixtureDir(sfDir, "events_dynpart")
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), dec(col("value")).as("v"), col("event_type"))
      ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, "dynamic")
      try {
        // the backfill: purchases re-derived under a stricter rule
        ev.filter(col("event_type") === "purchase" && col("v") > 50)
          .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      } finally {
        prev match {
          case Some(p) => spark.conf.set(conf, p)
          case None => spark.conf.unset(conf)
        }
      }
      spark.read.parquet(dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_scan_ndjson" -> exportAggOracle,
    "q_scan_ndjson_gz" -> exportAggOracle,
    "q_scan_orc" -> exportAggOracle,
    "q_scan_json_corrupt" -> exportAggOracle,

    "q_scan_csv_header" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_scan_zorder" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_custkey < 500 AND o_totalprice BETWEEN 50000 AND 200000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_sink_bucketed" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_scan_parquet_merge" ->
      """SELECT CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |    THEN o_orderpriority ELSE '(pre-schema)' END AS prio,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY 1 ORDER BY prio""".stripMargin,

    "q_sink_parquet_part" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // read-back after the dynamic single-partition backfill: purchases
    // re-derived under the stricter rule, every other partition intact
    "q_sink_partition_overwrite" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type <> 'purchase' OR CAST(value AS DECIMAL(18,2)) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_scan_text" ->
      """SELECT doc_id,
        |  CAST(len(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
