package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** The Z-ordered layout must actually prune: a predicate on the SECOND
  * dimension reads a fraction of the rows that a layout sorted only by
  * the first dimension reads (parquet min/max stats per file/row
  * group). Also: the layout is a pure reordering — contents identical. */
class ZOrderSpec extends SparkSuite {

  private def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(pred)
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.sum
  }

  test("z-order prunes on the second dimension; linear sort does not") {
    val orders = Tables.orders(spark, Sf)
    val zdir = "target/test-fixtures/zorder_orders"
    val ldir = "target/test-fixtures/linear_orders"
    ZOrder.write(orders, "o_custkey", "o_totalprice", zdir, numFiles = 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(ldir)

    // identical contents — the layout is a pure reordering
    assert(spark.read.parquet(zdir).count() == orders.count())
    assert(spark.read.parquet(zdir)
      .unionAll(orders).distinct().count() == orders.distinct().count())

    // selective predicate on the SECOND dimension only
    val pred = col("o_totalprice").between(100000, 120000)
    val zRows = scannedRows(zdir, pred)
    val lRows = scannedRows(ldir, pred)
    val total = orders.count()
    assert(lRows > 0 && zRows > 0)
    assert(zRows < lRows,
      s"z-order scanned $zRows rows, linear scanned $lRows — no pruning win")
    assert(zRows <= total / 2,
      s"z-order scanned $zRows of $total rows — expected substantial pruning")
  }
}
