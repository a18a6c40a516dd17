package graft

import org.apache.spark.sql.functions._

/** Catalog statistics + cost-based optimization: ANALYZE TABLE must
  * land exact row counts in the catalog, those stats must propagate
  * into plan cardinality estimates, and with CBO + join reorder
  * enabled a deliberately bad user join order (two big tables first,
  * tiny dim last) must be re-ordered so the tiny dimension joins
  * early. This is the conf a 100 TB deployment flips
  * (`spark.sql.cbo.enabled`) — SURVEY §4.2. */
class StatsSpec extends SparkSuite {

  test("ANALYZE fills exact stats; CBO reorders a bad join order") {
    val ss = spark
    import ss.implicits._
    // drop leftovers from prior runs — a stale warehouse dir without a
    // metastore entry makes saveAsTable refuse the location
    Seq("stats_fact", "stats_mid", "stats_dim").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
    // big fact, medium mid, tiny dim — written as catalog tables so
    // ANALYZE has somewhere to put stats
    spark.range(20000).select(col("id").as("fk"), (col("id") % 100).as("mk"))
      .write.mode("overwrite").saveAsTable("stats_fact")
    spark.range(5000).select(col("id").as("mk2"), (col("id") % 5).as("dk"))
      .write.mode("overwrite").saveAsTable("stats_mid")
    Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("dk2", "name")
      .write.mode("overwrite").saveAsTable("stats_dim")
    Seq("stats_fact", "stats_mid", "stats_dim").foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }

    // exact row counts in the catalog
    val counted = spark.sql("DESCRIBE TABLE EXTENDED stats_fact")
      .filter(col("col_name") === "Statistics")
      .collect().head.getString(1)
    assert(counted.contains("20000 rows"), counted)

    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // catalog stats propagate into plan cardinality estimates (CBO
      // planning reads rowCount; size-only estimation ignores it)
      val scanStats = spark.table("stats_fact")
        .queryExecution.optimizedPlan.stats
      assert(scanStats.rowCount.contains(BigInt(20000)), scanStats.toString)
      // user order: fact ⋈ mid first (both big), dim last
      val joined = spark.table("stats_fact")
        .join(spark.table("stats_mid"), col("mk") === col("mk2"))
        .join(spark.table("stats_dim"), col("dk") === col("dk2"))
        .groupBy(col("name")).agg(count(lit(1)).as("n"))
      // join reorder must move the big fact table to the TOP join (the
      // user order joins it first): one side of the outermost join is
      // the fact alone, meaning mid ⋈ dim was evaluated before it
      import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
      val top = joined.queryExecution.optimizedPlan
        .collectFirst { case j: LJoin => j }.get
      val sides = Seq(top.left.toString, top.right.toString)
      assert(sides.exists(s => s.contains("stats_fact") &&
        !s.contains("stats_mid") && !s.contains("stats_dim")),
        s"join not reordered:\n${joined.queryExecution.optimizedPlan}")
      assert(joined.collect().map(_.getLong(1)).sum == 20000L)
    }
  }
}
