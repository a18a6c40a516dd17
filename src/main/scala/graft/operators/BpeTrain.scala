package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Distributed BPE (byte-pair-encoding) merge training — the operator
  * that LEARNS a tokenizer's merge table from a corpus, not just lexes
  * with one (q_text_tokens is the lexing side).
  *
  * Algorithm (classic BPE over a word-frequency table): split the
  * corpus into whitespace words ONCE and aggregate to (word, count) —
  * the only corpus-sized pass; everything after runs on the vocab-sized
  * table, the standard trick that makes BPE training tractable at
  * 100 TB (a web corpus has ~10⁸ distinct words however many tokens it
  * has). Each round: (1) count adjacent symbol pairs weighted by word
  * frequency — one explode + one hash aggregate with map-side combine;
  * (2) take the single most frequent pair (ties broken by smallest
  * (left, right) — fully deterministic at any partitioning, same rule
  * as the published BPE reference implementations); (3) rewrite every
  * word's symbol array, merging non-overlapping occurrences greedily
  * left-to-right. The rewrite is a map-side `aggregate` fold — an
  * append-or-merge-last step reproduces the greedy scan exactly,
  * because a merged tail element (`a+b`) can never re-match the left
  * symbol `a` (symbols are non-empty, so `a+b ≠ a`).
  *
  * Driver traffic per round is ONE 1-row argmax probe (same pattern as
  * [[graft.queries.TextOps.connectedComponents]]'s fixpoint probe);
  * word state is localCheckpoint'ed per round with the superseded
  * round's blocks released (the repo-wide iteration discipline).
  *
  * Reproduces the tokenizer-training stage the reference's export
  * corpus feeds downstream (/root/reference/Unity_to_BigQuery.py ships
  * raw text to the warehouse; merge learning is the LLM-pipeline layer
  * built here).
  *
  * @return (rank, left, right, merged) — rank 1 is the first merge
  *         learned; at most `numMerges` rows (fewer iff the vocab runs
  *         out of adjacent pairs first).
  */
object BpeTrain {

  def apply(docs: DataFrame, numMerges: Int, textCol: String = "text"): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    // corpus → (symbol-array, count): the single corpus-sized pass.
    // split(w, "") keeps a trailing "" on some JDK regex paths — filter
    // empties rather than depend on the split flavor.
    var words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(filter(split(col("w"), ""), s => length(s) > 0).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = Vector.newBuilder[(Int, String, String)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // pair counts over the vocab table: zip each symbol array with its
      // own tail (the q_text_bigrams shape — the trailing null-padded
      // element is the row to drop), aggregate weighted by word count
      val top = words
        .select(col("syms"), slice(col("syms"), lit(2), size(col("syms"))).as("tl"),
          col("cnt"))
        .select(explode(arrays_zip(col("syms"), col("tl"))).as("p"), col("cnt"))
        .filter(col("p.tl").isNotNull)
        .groupBy(col("p.syms").as("l"), col("p.tl").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        val m = a + b
        merges += ((rank, a, b))
        // greedy left-to-right merge as a fold: append each symbol,
        // except replace the tail when (tail, symbol) == (a, b)
        val prev = words
        words = words
          .withColumn("syms", aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, s) => when(
              size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
              .otherwise(concat(acc, array(s)))))
          .localCheckpoint()
        Bridge.unpersistCheckpoint(prev)
        rank += 1
      }
    }
    Bridge.unpersistCheckpoint(words)
    import spark.implicits._
    merges.result()
      .map { case (r, a, b) => (r, a, b, a + b) }
      .toDF("rank", "left", "right", "merged")
  }
}
