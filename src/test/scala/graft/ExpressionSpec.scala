package graft

import org.apache.spark.sql.functions._

import graft.expressions.CosineSimilarity
import graft.queries.SimOps

/** The codegen'd CosineSimilarity expression must be bit-identical to
  * the higher-order-function formulation (which mirrors the DuckDB
  * oracle SQL), and must actually run inside whole-stage codegen. */
class ExpressionSpec extends SparkSuite {

  test("expression equals HOF cosine bit-for-bit on the fixture") {
    val emb = Tables.embeddings(spark, Sf).limit(200)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val both = emb.crossJoin(broadcast(probe))
      .select(
        CosineSimilarity(col("embedding"), col("probe")).as("fast"),
        SimOps.cosineHof(col("embedding"), col("probe")).as("ref"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, Sf)
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
    val df = emb.crossJoin(broadcast(probe))
      .select(CosineSimilarity(col("embedding"), col("probe")).as("cos"))
    // collect() executes THIS queryExecution so AQE finalizes the plan
    // (count() would plan a separate query)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a whole-stage-codegen stage; the projection holding
    // the expression must sit inside one (a CodegenFallback would
    // strand it outside).
    assert(plan.contains(") Project [cosine_similarity") &&
      """\*\(\d+\) Project \[cosine_similarity""".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("null input yields null; mismatched lengths yield null (HOF parity)") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f))),
      (Some(Array(1.0f, 0.0f, 3.0f)), Some(Array(1.0f, 0.0f)))).toDF("a", "b")
    val rows = df.select(
      CosineSimilarity(col("a"), col("b")).as("c"),
      SimOps.cosineHof(col("a"), col("b")).as("h")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    // ragged: zip_with pads with null and the fold propagates — the
    // native expression must agree, not truncate to min length
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("non-float-array inputs are rejected at analysis time") {
    import spark.implicits._
    val ints = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }
}
