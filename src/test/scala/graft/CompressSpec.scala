package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.DeflateLen

/** Compressibility signal (round 12): the DeflateLen expression and
  * the q_text_compress consumer — declared no-oracle (DuckDB carries
  * no zlib UDF), so the spec carries the correctness weight. */
class CompressSpec extends SparkSuite {

  test("deflate_len: repetitive text compresses far below random text") {
    val rep = "ab" * 500
    val rng = new scala.util.Random(7)
    val rnd = Array.fill(1000)(('a' + rng.nextInt(26)).toChar).mkString
    val lRep = DeflateLen.compute(UTF8String.fromString(rep))
    val lRnd = DeflateLen.compute(UTF8String.fromString(rnd))
    assert(lRep < lRnd / 3, s"rep $lRep vs rnd $lRnd")
    // deflate never loses bytes on empty, and tiny inputs round-trip
    assert(DeflateLen.compute(UTF8String.fromString("")) > 0)
  }

  test("deflate_len as a column: codegen path matches direct compute") {
    val ss = spark
    import ss.implicits._
    val docs = Seq("abababababababab", "the quick brown fox", "")
    val got = docs.toDF("t")
      .select(DeflateLen(col("t")).as("l"))
      .collect().map(_.getInt(0)).toSeq
    val want = docs.map(d => DeflateLen.compute(UTF8String.fromString(d)))
    assert(got === want)
    // null in, null out
    val n = Seq[String](null).toDF("t")
      .select(DeflateLen(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("q_text_compress: ratios in (0, ~1.1], partitioning-invariant") {
    val rows = SparkEntry.queries("q_text_compress")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("mean_ratio")
      // zlib adds framing overhead, so tiny docs can exceed 1.0
      // slightly; natural prose lands well below
      assert(ratio > 0.0 && ratio < 1.2)
      assert(r.getAs[Long]("n_repetitive") <= r.getAs[Long]("n_docs"))
    }
    // per-doc integer-ppm rounding before the sum makes the report
    // independent of partitioning
    val again = SparkEntry.queries("q_text_compress")(spark, Sf)
      .repartition(13).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_ratio")).toMap
    rows.foreach { r =>
      assert(again(r.getString(0)) === r.getAs[Double]("mean_ratio"))
    }
  }
}
