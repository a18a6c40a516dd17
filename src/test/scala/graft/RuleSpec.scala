package graft

import org.apache.spark.sql.functions._

import graft.plans.AccelerateCosine
import graft.queries.SimOps

/** The AccelerateCosine optimizer rule must rewrite the HOF cosine
  * formula into the native expression without changing results. */
class RuleSpec extends SparkSuite {

  test("HOF cosine rewrites to cosine_similarity with identical results") {
    val emb = Tables.embeddings(spark, Sf).limit(50)
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("p"))
    def query = emb.crossJoin(broadcast(probe))
      .select(col("vec_id"), SimOps.cosineHof(col("embedding"), col("p")).as("cos"))

    // baseline must be the genuinely un-rewritten HOF result — the
    // session installs the rule via GraftExtensions, so exclude it here
    val before = {
      var r: Map[Long, Double] = null
      withSQLConf(NoCosineRewrite) {
        r = query.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
      r
    }
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ AccelerateCosine
      val optimized = query
      val plan = optimized.queryExecution.optimizedPlan.toString
      assert(plan.contains("cosine_similarity"), s"rule did not fire:\n$plan")
      assert(!plan.contains("aggregate("), s"HOF fold should be gone:\n$plan")
      val after = optimized.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(after == before, "rewrite changed results")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule does not rewrite a sum-of-squares fold wearing the cosine shape") {
    val emb = Tables.embeddings(spark, Sf).limit(20)
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("p"))
    // (x, y) -> dbl(x) * dbl(x): same tree shape, NOT a dot product —
    // only operand-identity checking distinguishes it
    def notDot = aggregate(
      zip_with(col("embedding"), col("p"),
        (x, _) => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    def query = emb.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        (notDot / (sqrt(SimOps.dot(col("embedding"), col("embedding"))) *
          sqrt(SimOps.dot(col("p"), col("p"))))).as("notcos"))
    val before = query.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ AccelerateCosine
      val plan = query.queryExecution.optimizedPlan.toString
      assert(!plan.contains("cosine_similarity"),
        s"rule over-matched a non-dot fold:\n$plan")
      val after = query.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(after == before)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule does not rewrite the cosine shape over non-float arrays") {
    val emb = Tables.embeddings(spark, Sf).limit(20)
      .select(col("vec_id"),
        transform(col("embedding"), x => (x * lit(100)).cast("int")).as("iv"))
    val probe = emb.filter(col("vec_id") === 0).select(col("iv").as("p"))
    // Same HOF tree (Cast int→double survives into the plan), but
    // CosineSimilarity reads getFloat — a rewrite would reinterpret
    // int bytes as floats.
    def query = emb.crossJoin(broadcast(probe))
      .select(col("vec_id"), SimOps.cosineHof(col("iv"), col("p")).as("cos"))
    val before = query.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ AccelerateCosine
      val plan = query.queryExecution.optimizedPlan.toString
      assert(!plan.contains("cosine_similarity"),
        s"rule rewrote an array<int> cosine:\n$plan")
      val after = query.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(after == before)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule leaves non-matching folds alone") {
    val emb = Tables.embeddings(spark, Sf).limit(10)
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ AccelerateCosine
      // plain sum fold (no cosine shape) must survive untouched
      val df = emb.select(
        aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")).as("s"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("cosine_similarity"), plan)
      assert(df.count() == 10)
    } finally spark.experimental.extraOptimizations = prev
  }
}
