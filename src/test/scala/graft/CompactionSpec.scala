package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.pipeline.Compaction

/** Compaction must reduce file count without changing data, and be a
  * no-op when the directory is already compact. */
class CompactionSpec extends SparkSuite {

  private def parquetFiles(dir: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).toSeq

  test("compacts a fragmented table, preserving rows and schema") {
    val dir = "target/test-fixtures/compact/orders"
    val src = Tables.orders(spark, Sf)
    src.repartition(16).write.mode("overwrite").parquet(dir)
    assert(parquetFiles(dir).size == 16)
    val before = spark.read.parquet(dir)
    val beforeCount = before.count()
    val beforeSum = before.agg(sum(col("o_orderkey"))).collect().head.getLong(0)

    val n = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1, s"expected 1 output file, got $n")
    assert(parquetFiles(dir).size == 1)
    val after = spark.read.parquet(dir)
    assert(after.count() == beforeCount)
    assert(after.agg(sum(col("o_orderkey"))).collect().head.getLong(0) == beforeSum)
    assert(after.schema == before.schema)

    // already compact → no-op
    assert(Compaction.compact(spark, dir, targetBytes = 1L << 30) == 0)
    assert(parquetFiles(dir).size == 1)
  }

  test("missing directory is a no-op") {
    assert(Compaction.compact(spark, "target/test-fixtures/compact/nope", 1024) == 0)
  }

  test("target size bounds the output file count from below") {
    val dir = "target/test-fixtures/compact/lineitem"
    Tables.lineitem(spark, Sf).repartition(12).write.mode("overwrite").parquet(dir)
    val totalBytes = parquetFiles(dir).map(_.length()).sum
    // target of ~1/3 the data → at least 3 files, far fewer than 12
    val n = Compaction.compact(spark, dir, targetBytes = totalBytes / 3)
    assert(n >= 3 && n < 12, s"got $n files")
    assert(parquetFiles(dir).size == n)
  }
}
