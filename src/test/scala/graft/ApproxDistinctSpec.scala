package graft

import org.apache.spark.sql.functions._

/** Tolerance gate for the sketch-based operator (SURVEY.md §2-B:
  * q_agg_approx_distinct has no DuckDB oracle — HLL++ differs —
  * so correctness = bounded relative error vs the exact count). */
class ApproxDistinctSpec extends SparkSuite {

  test("approx_count_distinct within 10% of exact per group") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.10,
        s"group $k: approx $ap vs exact $ex")
    }
  }
}
