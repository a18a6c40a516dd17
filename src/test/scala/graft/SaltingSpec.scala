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

  test("salted pair join: every pair exactly once, over-cap buckets " +
      "split, under-cap buckets untouched") {
    import spark.implicits._
    // one product-skewed bucket (k0: 120x120 > the 1,000 cap) plus a
    // tail of small buckets that must stay on the g=1 path
    val rows = ((1 to 120).map(i => ("k0", i.toLong)) ++
      (1 to 40).map(i => (s"k${i % 8 + 1}", 1000L + i)))
      .toDF("tok", "doc_id")
    val salted = Salting.saltedPairJoin(rows, rows, Seq("tok"),
        "doc_id", "doc_id", g = 4, capProduct = 1000L,
        cond = col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val plain = rows.as("a").join(rows.as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    // EXACTLY once: same count (no distinct applied anywhere), no
    // duplicated pair, identical pair sets
    assert(salted.count() == plain.count())
    assert(salted.groupBy("d1", "d2").count()
      .filter(col("count") > 1).count() == 0,
      "a pair was produced more than once across the g x g groups")
    assert(salted.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }

  test("salted pair join, two-sided directed form (prefix x full): " +
      "equality with the plain join under a =!= condition") {
    import spark.implicits._
    val full = ((1 to 60).map(i => ("k0", i.toLong)) ++
      (1 to 30).map(i => (s"k${i % 5 + 1}", 500L + i)))
      .toDF("tok", "doc_id")
    // an asymmetric left side (a prefix-style subset)
    val pref = full.filter(col("doc_id") % 2 === 0)
    val salted = Salting.saltedPairJoin(pref, full, Seq("tok"),
        "doc_id", "doc_id", g = 4, capProduct = 100L,
        cond = col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("contained"),
        col("b.doc_id").as("container"))
    val plain = pref.as("a").join(full.as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("contained"),
        col("b.doc_id").as("container"))
    assert(salted.count() == plain.count())
    assert(salted.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
  }
}
