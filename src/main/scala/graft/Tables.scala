package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loader for the driver fixtures (TESTDATA.md / FIXTURES.md).
  *
  * All oracle-checked queries load their inputs through here so the
  * determinism rules of SURVEY.md §7.4 are applied in exactly one place:
  *
  *  - `events.ts` is Parquet TIMESTAMP(NANOS); Spark refuses it unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true`, which yields the raw
  *    nanos as Long. We truncate (toward zero) to micros — matching how
  *    DuckDB reads the same column — and store as timestamp_ntz so the
  *    Parquet output is tz-naive micros on both engines.
  */
object Tables {

  /** Decimal type used for money/metric measures in oracle queries
    * (SURVEY.md §7.4.2: never hash-compare raw double sums). */
  val Money: DecimalType = DecimalType(18, 2)

  def dec(c: Column): Column = c.cast(Money)

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // session builders set these too; kept as a safety net for
      // driver-owned sessions that load tables without our builder —
      // the ns→ntz cast below is session-timezone-dependent, so a
      // non-UTC session would shift every event timestamp
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      // Fixture generations differ: TIMESTAMP(NANOS) surfaces as Long
      // under nanosAsLong (truncate toward zero to micros, like DuckDB);
      // TIMESTAMP(MICROS) arrives as a timestamp already — only align
      // the tz flavor. Either path lands on tz-naive micros.
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case org.apache.spark.sql.types.TimestampNTZType => raw
        case _ =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
      }
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
