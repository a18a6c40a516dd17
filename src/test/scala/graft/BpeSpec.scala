package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeEncode, BpeTrain}

/** BPE merge training (q_text_bpe, operators/BpeTrain.scala) against an
  * INDEPENDENT single-node reference implementation — the declared
  * no-oracle verification for the operator (an iterative argmax chain
  * is not one DuckDB statement). The reference below is the textbook
  * sequential algorithm: explicit pair-count map, explicit greedy
  * left-to-right scan with skip-two — deliberately NOT the fold
  * formulation the operator uses, so agreement checks the semantics,
  * not the implementation.
  */
class BpeSpec extends SparkSuite {

  /** Textbook sequential BPE over a word-frequency table. */
  private def referenceBpe(freq: Map[String, Long], numMerges: Int): Seq[(Int, String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      freq.toVector.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Vector.newBuilder[(Int, String, String)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) continue = false
      else {
        // max count, ties to lexicographically smallest (left, right)
        val (a, b) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        out += ((rank, a, b))
        words = words.map { case (syms, c) =>
          val nw = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nw += (a + b); i += 2
            } else { nw += syms(i); i += 1 }
          }
          (nw.result(), c)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def corpusFreq(rows: Seq[String]): Map[String, Long] =
    rows.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("merge table equals the sequential reference on the fixture corpus") {
    val docs = Tables.documents(spark, Sf)
    val texts = docs.select(col("text")).collect().map(_.getString(0)).toSeq
    val expected = referenceBpe(corpusFreq(texts), 16)
      .map { case (r, a, b) => (r, a, b, a + b) }
    val got = BpeTrain(docs, numMerges = 16).orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(got === expected)
    assert(got.size === 16, "fixture corpus should support 16 merges")
  }

  test("merge table is invariant under repartitioning") {
    val docs = Tables.documents(spark, Sf)
    val a = BpeTrain(docs, 8).orderBy(col("rank")).collect().toSeq
    val b = BpeTrain(docs.repartition(7, col("lang")), 8)
      .orderBy(col("rank")).collect().toSeq
    assert(a === b)
  }

  test("greedy merge semantics: overlapping runs collapse left-to-right") {
    import spark.implicits._
    // "aaaa" (×3) forces the (a,a) merge first; greedy left-to-right
    // yields [aa][aa], never the overlapping [a][aa][a] reading, so the
    // second round must merge (aa, aa) — the run-collapse signature.
    val docs = Seq("aaaa aaaa aaaa b").toDF("text").withColumn("doc_id", lit(1L))
    val got = BpeTrain(docs, 2).orderBy(col("rank"))
      .select(col("left"), col("right")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("a", "a"), ("aa", "aa")))
  }

  test("exhausted vocab stops early with fewer rows than numMerges") {
    import spark.implicits._
    // single-character words have no adjacent pairs after one merge each
    val docs = Seq("ab ab").toDF("text")
    val got = BpeTrain(docs, 10).collect()
    assert(got.length === 1) // (a,b) merges; then no pairs remain
  }

  /** Sequential reference ENCODER: apply each merge over every word in
    * rank order with the textbook skip-two greedy scan — again a
    * different formulation than the operator's fold, so agreement
    * checks semantics. */
  private def referenceEncode(text: String, merges: Seq[(String, String)]): Vector[String] =
    text.split("\\s+").filter(_.nonEmpty).toVector.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        val nw = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            nw += (a + b); i += 2
          } else { nw += syms(i); i += 1 }
        }
        nw.result()
      }
    }

  test("encode parity with the sequential reference, using trained merges") {
    val docs = Tables.documents(spark, Sf)
    val merges = BpeTrain(docs, numMerges = 16).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeEncode(docs, merges)
      .select(col("doc_id"), col("tokens")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(got(id) === referenceEncode(text, merges), s"doc $id")
    }
  }

  test("encode is lossless: concatenated tokens rebuild every word") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat  on the mat"), (2L, "aaaa abab a"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("aa", "aa"), ("t", "h"), ("th", "e"))
    val got = BpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L).mkString === "thecatsatonthemat")
    assert(got(2L).mkString === "aaaaababa")
    // and the learned merges actually fire: "the" is one token
    assert(got(1L).count(_ == "the") === 2)
    assert(got(2L).take(1) === Seq("aaaa")) // (a,a) then (aa,aa)
  }

  test("vocab-path token frequencies equal per-doc encoding counts") {
    // tokenFrequencies encodes each distinct word once and weights by
    // count (the registered query's scale path); it must agree exactly
    // with brute-force per-occurrence encoding.
    val docs = Tables.documents(spark, Sf)
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g",
      "a" -> "n", "an" -> "d")
    val vocabPath = BpeEncode.tokenFrequencies(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perDoc = BpeEncode(docs, merges)
      .select(explode(col("tokens")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocabPath === perDoc)
  }
}
