package graft.expressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.Bridge

/** Native bloom build/probe over Spark's own runtime-filter expressions
  * (`bloom_filter_agg` / `might_contain` — the pair `InjectRuntimeFilter`
  * plants), exposed for explicit use in a query. Unlike
  * `df.stat.bloomFilter` + a probe UDF, the build stays IN-PLAN (a
  * 1-row aggregate evaluated as a scalar subquery when the query first
  * runs, never at construction time) and the probe stays codegen'd —
  * no per-row ScalaUDF serialization, no driver-side corpus scan when
  * the query map is merely enumerated. */
object NativeBloom {

  /** `might_contain(<scalar subquery building the filter>, xxhash64(value))`.
    *
    * `BloomFilterMightContain` requires its filter side to be a constant
    * or a scalar subquery; the subquery form keeps the whole thing lazy
    * and lets the optimizer run the build once and broadcast the binary
    * to every probe task.
    *
    * @param build single-column DataFrame of values to insert
    * @param expectedItems sizing hint for the fixed-size filter
    * @param value probe-side column
    */
  def probablyIn(build: DataFrame, expectedItems: Long, value: Column): Column = {
    val bfAgg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(build.col(build.columns.head))),
      expectedItems).toAggregateExpression()
    val bfPlan = build
      .agg(Bridge.column(bfAgg).as("bf"))
      .queryExecution.analyzed
    Bridge.column(
      BloomFilterMightContain(ScalarSubquery(bfPlan), Bridge.expression(xxhash64(value))))
  }
}
