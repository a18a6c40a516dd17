package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed joins must co-locate without any shuffle exchange — the
  * write-once/join-many pattern for recurring 100 TB joins. */
class BucketingSpec extends SparkSuite {

  test("join of two tables bucketed on the key plans with no Exchange") {
    // the warehouse dir outlives the per-JVM in-memory catalog — clear
    // both so reruns start clean
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(s"spark-warehouse/$t"))
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, Sf).withColumnRenamed("o_custkey", "custkey"),
      "b_orders", "custkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.customer(spark, Sf).withColumnRenamed("c_custkey", "custkey"),
      "b_customer", "custkey", buckets = 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "custkey")
        .select(col("custkey"), col("o_orderkey"), col("c_name"))
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain join") {
    val bucketed = spark.table("b_orders")
      .join(spark.table("b_customer"), "custkey")
      .count()
    val plain = Tables.orders(spark, Sf)
      .join(Tables.customer(spark, Sf),
        col("o_custkey") === col("c_custkey"))
      .count()
    assert(bucketed == plain)
  }
}
