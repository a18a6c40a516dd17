package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Bigram-LM cross-entropy quality scoring (q_text_perplexity,
  * TextOps.bigramCrossEntropy) — the declared no-oracle verification
  * (log() doubles are not cross-engine bit-stable, so no DuckDB hash
  * compare). A sequential reference LM provides the ground truth; the
  * decimal-summed log-probs make the distributed scores bit-stable, so
  * the partitioning-invariance assertion is EXACT equality.
  */
class PerplexitySpec extends SparkSuite {

  /** Textbook sequential add-one bigram LM over the same corpus. */
  private def referenceCE(texts: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val docs = texts.map { case (id, t) => id -> t.split(" ").toVector }
    val pairs = docs.flatMap { case (id, toks) =>
      toks.zip(toks.drop(1)).map(p => (id, p)) }
    val cab = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ca = pairs.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val v = docs.flatMap(_._2).distinct.size.toDouble
    pairs.groupBy(_._1).map { case (id, ps) =>
      val logps = ps.map { case (_, (a, b)) =>
        math.log((cab((a, b)) + 1).toDouble / (ca(a) + v)) }
      id -> ((logps.size.toLong, -logps.sum / logps.size))
    }
  }

  test("cross-entropy matches the sequential reference LM") {
    val docs = Tables.documents(spark, Sf)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = referenceCE(texts)
    val got = TextOps.bigramCrossEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, ce)) =>
      val (en, ece) = expected(id)
      assert(n === en, s"doc $id bigram count")
      // identical log-prob doubles; only the summation order differs
      // (reference sums doubles in doc order, the engine sums decimal
      // quantizations) — agreement to 1e-12 relative
      assert(math.abs(ce - ece) <= 1e-12 * math.max(1.0, math.abs(ece)),
        s"doc $id: got $ce, reference $ece")
    }
  }

  test("scores are BIT-identical across repartitionings") {
    val docs = Tables.documents(spark, Sf)
    def scores(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      TextOps.bigramCrossEntropy(df).orderBy(col("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toSeq
    // decimal-summed log-probs: not approximately — exactly
    assert(scores(docs) === scores(docs.repartition(13, col("lang"))))
  }

  test("a gibberish doc scores strictly worst in a patterned corpus") {
    import spark.implicits._
    // The discriminative property needs a corpus with a dominant
    // pattern (the fixture is uniform word soup, where add-one
    // smoothing can rank a rare bigram under a COMMON context below a
    // rare-context one: 2/(ca+V) shrinks with ca). 99 repeats of one
    // sentence give every natural bigram count 99 — logp ~ log(100/
    // (198+V)) — while each gibberish bigram is count-1 in a count-1
    // context — logp = log(2/(1+V)), strictly more surprising.
    val docs = ((1 to 99).map(i => (i.toLong, "the cat sat on the mat")) :+
      (999999L, "zq xv qj vx jz wq qx zj")).toDF("doc_id", "text")
    val scored = TextOps.bigramCrossEntropy(docs)
      .orderBy(col("cross_entropy").desc)
      .select(col("doc_id")).limit(1).collect()
    assert(scored.head.getLong(0) === 999999L,
      "gibberish doc must have the highest cross-entropy")
  }
}
