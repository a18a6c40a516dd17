package graft

import graft.queries.TextOps

/** SimHash near-dup detection: identical token sets collide exactly,
  * near-identical documents land within a small hamming distance, and
  * the banded candidate generation surfaces the fixture's planted
  * near-dup pair. */
class SimhashSpec extends SparkSuite {

  test("identical and near-identical docs; disjoint docs stay apart") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "s"),
      (2L, base, "s"),                          // identical
      (3L, base.replace("w7 ", "zz "), "s"),    // one token changed
      (4L, (100 to 140).map(i => s"q$i").mkString(" "), "s") // disjoint
    ).toDF("doc_id", "text", "source")
    val cand = TextOps.simhashCandidates(docs, maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cand((1L, 2L)) == 0L, "identical docs must have hamming 0")
    assert(cand.get((1L, 3L)).exists(_ <= 8L),
      s"near-identical docs should be close, got ${cand.get((1L, 3L))}")
    cand.get((1L, 4L)).foreach(h =>
      assert(h > 8L, s"disjoint docs unexpectedly close: $h"))
  }

  test("fixture: the planted near-dup pair is a simhash candidate") {
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngram.nonEmpty, "fixture has no planted near-dups — vacuous")
    val sim = SparkEntry.queries("q_dedup_simhash")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = ngram -- sim
    assert(missed.isEmpty,
      s"simhash missed planted near-dup pairs: $missed")
  }

  test("SimHash64 codegen path equals the interpreted eval path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.expressions.SimHash64
    val df = Tables.documents(spark, Sf).limit(100)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val viaCodegen = df.select(col("doc_id"), SimHash64(col("toks")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // interpreted: evaluate the expression directly per row
    val viaEval = df.collect().map { r =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        r.getSeq[String](1).map(
          org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val e = graft.expressions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(arr,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
      r.getLong(0) -> e.eval(null).asInstanceOf[Long]
    }.toMap
    assert(viaCodegen == viaEval)
  }

  test("hamming distances are within [0, 64]") {
    val rows = SparkEntry.queries("q_dedup_simhash")(spark, Sf).collect()
    rows.foreach { r =>
      val h = r.getLong(2)
      assert(h >= 0L && h <= 64L)
      assert(r.getLong(0) < r.getLong(1))
    }
  }
}
