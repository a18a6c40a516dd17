package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** Driver-memory bound for BPE training (VERDICT r9 "what's wrong" #1):
  * on a space-free wide-alphabet corpus (the CJK hazard) every document
  * is one giant "word" and the distinct-adjacent-pair set — the one
  * driver-held table — scales with corpus bigram diversity, not vocab.
  * `driverPairBudget` prunes that table to a top-K above a strict count
  * floor with distributed recounts when the retained top decays
  * (BpeTrain scaladoc). These tests pin the two halves of the claim:
  * pruned training is BIT-IDENTICAL to unbounded training, and the
  * driver-held state actually stays near the budget instead of
  * pair-diversity-sized.
  */
class BpeBoundedSpec extends SparkSuite {

  // deterministic LCG (specs never use wall-clock or global RNG state)
  private def lcg(seed: Long): () => Int = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0x7fffffff).toInt }
  }

  /** Space-free docs over a wide CJK-range alphabet with Zipf-ish skew
    * (the product trick biases toward low indices) so a deep merge
    * chain exists. */
  private def cjkDocs(nDocs: Int, docLen: Int, alphaSize: Int, seed: Long) = {
    import spark.implicits._
    val next = lcg(seed)
    (0 until nDocs).map { _ =>
      (0 until docLen).map { _ =>
        val idx = (next() % alphaSize) * (next() % alphaSize) / alphaSize
        (0x4e00 + idx).toChar.toString
      }.mkString
    }.toDF("text")
  }

  test("pruned training is bit-identical to unbounded on a space-free " +
      "wide-alphabet corpus, with bounded driver state and real rescans") {
    val docs = cjkDocs(nDocs = 80, docLen = 80, alphaSize = 120, seed = 42L)
    val (exactDf, exactStats) =
      BpeTrain.trainWithStats(docs, numMerges = 150, collectStats = true)
    val (prunedDf, prunedStats) =
      BpeTrain.trainWithStats(docs, numMerges = 150, collectStats = true,
        driverPairBudget = 64)

    val exact = exactDf.orderBy(col("rank")).collect().toSeq
    val pruned = prunedDf.orderBy(col("rank")).collect().toSeq
    assert(exact.size == 150, "corpus must sustain a 150-merge chain")
    assert(pruned === exact)

    val exactMax = exactStats.map(_.retainedPairs).max
    val prunedMax = prunedStats.map(_.retainedPairs).max
    assert(exactMax > 500,
      s"fixture not pair-diverse enough to test pruning (exact table $exactMax)")
    // pruned state = budget + exact-tracked fresh pairs since last
    // recount; must sit far below the pair-diversity-sized exact table
    assert(prunedMax * 4 <= exactMax,
      s"pruned driver table ($prunedMax) not materially below exact ($exactMax)")
    assert(prunedStats.last.rescans >= 1,
      "budget never forced a recount — pruning untested at this size")
    assert(exactStats.last.rescans == 0,
      "unbounded mode must never recount (it holds the exact table)")
  }

  test("a count-tie class larger than the budget falls back to exact " +
      "mode via budget doubling, still bit-identical") {
    import spark.implicits._
    // one doc of 120 DISTINCT chars: 119 distinct pairs, all count 1 —
    // a single tie class no top-K floor can cut
    val text = (0 until 120).map(i => (0x4e00 + i).toChar).mkString
    val docs = Seq(text).toDF("text")
    val exact = BpeTrain(docs, numMerges = 8).orderBy(col("rank")).collect().toSeq
    val pruned = BpeTrain.trainWithStats(docs, numMerges = 8,
      driverPairBudget = 16)._1.orderBy(col("rank")).collect().toSeq
    assert(pruned === exact)
    assert(exact.size == 8)
  }

  test("run-collapse and cascade merges stay identical under pruning") {
    import spark.implicits._
    // (a,a)-run collapses and chained merges exercise the fresh-pair
    // exact-tracking path (new pairs around each merged symbol) under
    // an engaged floor
    val next = lcg(7L)
    val docs = (0 until 40).map { _ =>
      (0 until 30).map { _ =>
        val r = next() % 10
        if (r < 4) "aa" else if (r < 7) "ab" else ((0x4e00 + next() % 200).toChar).toString
      }.mkString
    }.toDF("text")
    val exact = BpeTrain(docs, numMerges = 12).orderBy(col("rank")).collect().toSeq
    val pruned = BpeTrain.trainWithStats(docs, numMerges = 12,
      driverPairBudget = 24)._1.orderBy(col("rank")).collect().toSeq
    assert(pruned === exact)
  }
}
