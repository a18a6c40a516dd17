package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Bigram-LM cross-entropy quality scoring (q_text_perplexity,
  * TextOps.bigramCrossEntropy) — the declared no-oracle verification
  * (log() doubles are not cross-engine bit-stable, so no DuckDB hash
  * compare). A sequential reference LM provides the ground truth; the
  * decimal-summed log-probs make the distributed scores bit-stable, so
  * the partitioning-invariance assertion is EXACT equality. Also
  * covers the held-out scoring path (q_text_perplexity_holdout,
  * TextOps.scoreAgainstLm) against a sequential SMOOTHED reference,
  * and asserts the single-corpus-shuffle plan shape (exchange reuse).
  */
class PerplexitySpec extends SparkSuite {

  /** The engine's token rule: \s+ split, empties dropped. */
  private def toks(t: String): Vector[String] =
    t.split("\\s+").filter(_.nonEmpty).toVector

  /** Textbook sequential add-one bigram LM over the same corpus. */
  private def referenceCE(texts: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    val docs = texts.map { case (id, t) => id -> toks(t) }
    val pairs = docs.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map(p => (id, p)) }
    val cab = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ca = pairs.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
    val v = docs.flatMap(_._2).distinct.size.toDouble
    pairs.groupBy(_._1).map { case (id, ps) =>
      val logps = ps.map { case (_, (a, b)) =>
        math.log((cab((a, b)) + 1).toDouble / (ca(a) + v)) }
      id -> ((logps.size.toLong, -logps.sum / logps.size))
    }
  }

  /** Sequential smoothed HELD-OUT scorer: train counts on `train`,
    * score `held` with the add-one floor for unseen bigrams/contexts. */
  private def referenceHoldout(train: Seq[String], held: Seq[(Long, String)])
      : Map[Long, (Long, Double)] = {
    val tdocs = train.map(toks)
    val pairs = tdocs.flatMap(ts => ts.zip(ts.drop(1)))
    val cab = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = tdocs.flatten.distinct.size.toDouble
    held.map { case (id, t) =>
      val ts = toks(t)
      val logps = ts.zip(ts.drop(1)).map { case (a, b) =>
        math.log((cab.getOrElse((a, b), 0L) + 1).toDouble /
          (ca.getOrElse(a, 0L) + v)) }
      id -> ((logps.size.toLong, -logps.sum / logps.size))
    }.toMap
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

  test("trailing and doubled spaces do not mint empty tokens") {
    import spark.implicits._
    // same word content, different whitespace: scores must be
    // identical — a raw single-space split would add "" tokens to the
    // second doc's bigram stream AND to the corpus vocabulary
    val clean = Seq((1L, "the cat sat on the mat"))
    val messy = Seq((1L, "the cat  sat on the mat "))
    def score(rows: Seq[(Long, String)]): (Long, Double) = {
      val r = TextOps.bigramCrossEntropy(rows.toDF("doc_id", "text"))
        .collect().head
      (r.getLong(1), r.getDouble(2))
    }
    assert(score(messy) === score(clean))
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

  test("held-out scoring matches the sequential smoothed reference") {
    val docs = Tables.documents(spark, Sf)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val held = docs.filter(col("doc_id") % 5 === 0)
    val trainTexts = train.select(col("text")).collect().map(_.getString(0)).toSeq
    val heldTexts = held.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = referenceHoldout(trainTexts, heldTexts)
    val got = TextOps.scoreAgainstLm(held, TextOps.trainBigramLm(train))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    assert(got.nonEmpty)
    got.foreach { case (id, (n, ce)) =>
      val (en, ece) = expected(id)
      assert(n === en, s"doc $id bigram count")
      assert(math.abs(ce - ece) <= 1e-12 * math.max(1.0, math.abs(ece)),
        s"doc $id: got $ce, reference $ece")
    }
  }

  test("unseen bigrams and contexts get the add-one floor (smoothing)") {
    import spark.implicits._
    // the fixture's ~30-word vocabulary leaves no bigram unseen, so
    // the true smoothing path needs planted novelty: one held doc of
    // entirely novel words (unseen CONTEXTS → 1/V), one mixing known
    // and novel (unseen bigrams under known contexts → 1/(ca+V))
    val docs = Tables.documents(spark, Sf)
    val lm = TextOps.trainBigramLm(docs)
    val trainTexts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val held = Seq(
      (1L, "zzq zzv zzj zzx"),
      (2L, "the zzq of zzv"))
    val expected = referenceHoldout(trainTexts, held)
    val got = TextOps.scoreAgainstLm(held.toDF("doc_id", "text"), lm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, ce)) =>
      val (en, ece) = expected(id)
      assert(n === en, s"doc $id bigram count")
      assert(math.abs(ce - ece) <= 1e-12 * math.max(1.0, math.abs(ece)),
        s"doc $id: got $ce, reference $ece")
    }
    // and the guard that this case really is off-support
    val trainPairs = trainTexts.map(toks).flatMap(ts => ts.zip(ts.drop(1))).toSet
    assert(held.flatMap(t => { val ts = toks(t._2); ts.zip(ts.drop(1)) })
      .exists(p => !trainPairs.contains(p)))
  }

  test("self-scoring: one corpus shuffle via exchange reuse in the " +
      "executed plan") {
    val docs = Tables.documents(spark, Sf)
    val df = TextOps.bigramCrossEntropy(docs)
    df.collect()
    // final adaptive plan only (the string repeats the initial plan)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val reused = "ReusedExchange".r.findAllIn(plan).size
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(reused >= 2,
      s"cab and ca must reuse the occurrence aggregate's exchange; plan:\n$plan")
    assert(scans <= 2,
      s"corpus must be scanned once for the pair stream (plus once for " +
        s"the vocabulary), found $scans scans; plan:\n$plan")
  }
}
