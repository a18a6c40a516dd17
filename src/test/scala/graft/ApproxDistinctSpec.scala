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

  test("approx_percentile within 2% of the exact group percentiles") {
    val approx = SparkEntry.queries("q_agg_approx_percentile")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, Sf)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 <= 0.02, s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 <= 0.02, s"$k p95: $a95 vs $e95")
    }
  }

  test("count-min sketch: estimate >= exact, within eps*N overcount") {
    val rows = SparkEntry.queries("q_sketch_cms")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (tok, est) =>
      val ex = exact.getOrElse(tok, 0L)
      assert(est >= ex, s"$tok: CMS must never undercount ($est < $ex)")
      assert(est <= ex + (0.0001 * n).ceil.toLong + 1,
        s"$tok: overcount beyond eps*N ($est vs $ex, n=$n)")
    }
    assert(rows("xyzzy_absent") <= (0.0001 * n).ceil.toLong + 1)
  }

  test("HLL sketch estimates (per-lang and merged) within 10% of exact") {
    val est = SparkEntry.queries("q_sketch_hll")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.documents(spark, Sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val exactPerLang = toks.groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = toks.select(countDistinct(col("tok"))).collect().head.getLong(0)
    assert(est.keySet == exactPerLang.keySet + "*ALL*")
    (exactPerLang + ("*ALL*" -> exactAll)).foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex).toDouble / ex <= 0.10,
        s"lang $k: sketch ${est(k)} vs exact $ex")
    }
    // the merged row must come from sketch union, not a rescan: its
    // estimate is >= the largest single-language estimate
    assert(est("*ALL*") >= est.filterKeys(_ != "*ALL*").values.max)
  }
}
