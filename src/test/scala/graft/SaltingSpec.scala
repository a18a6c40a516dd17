package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salted joins must produce exactly the plain join's rows while
  * carrying the salt through the shuffle keys. */
class SaltingSpec extends SparkSuite {

  test("salted join equals plain join on a skewed dataset") {
    import spark.implicits._
    // skew: one mega-key (0) plus a uniform tail
    val probe = (1 to 5000).map(i => (if (i <= 4000) 0L else i % 50L, i.toLong))
      .toDF("k", "row_id")
    val build = (0L to 49L).map(k => (k, s"dim_$k")).toDF("bk", "name")

    val salted = Salting.saltedJoin(probe, build, "k", "bk",
      saltCarrier = Seq(col("row_id")), n = 8)
    val plain = probe.join(build, col("k") === col("bk"))

    assert(salted.count() == plain.count())
    val a = salted.select("row_id", "name").collect().map(_.toSeq).toSet
    val b = plain.select("row_id", "name").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("AQE skew join splits the mega-key partition at runtime") {
    import spark.implicits._
    // manual salting's runtime alternative: AQE detects the oversized
    // partition from shuffle stats and splits it (thresholds forced
    // low so fixture-scale stats trigger the optimization)
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val skewed = (Seq.fill(30000)(0L) ++ (1L to 100L)).toDF("k")
        .select(col("k"), (col("k") + 1).as("v"))
      val dim = (0L to 100L).toDF("k").select(col("k"), (col("k") * 2).as("w"))
      val joined = skewed.join(dim, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not mark the join as skew-optimized\n" + plan.take(3000))
    }
  }

  test("salt participates in the join keys (skew actually splits)") {
    import spark.implicits._
    val probe = (1 to 100).map(i => (0L, i.toLong)).toDF("k", "row_id")
    val build = Seq((0L, "x")).toDF("bk", "name")
    val joined = Salting.saltedJoin(probe, build, "k", "bk",
      saltCarrier = Seq(col("row_id")), n = 4)
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("__psalt") && plan.contains("__bsalt"), plan)
    // salts genuinely spread the mega-key
    val salts = probe
      .withColumn("s", pmod(xxhash64(col("row_id")), lit(4L)))
      .select("s").distinct().count()
    assert(salts == 4)
  }
}
