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

  /** Code-point split — the operator's symbol unit (Spark's
    * `split(w, "")` splits by code point); `w.map(_.toString)` would
    * shear surrogate pairs into lone surrogates on non-BMP text. */
  private def codePoints(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Tie-break order: code-point order == UTF-8 binary == Spark's own
    * string order (String.compareTo diverges above the BMP). */
  private implicit val cpOrd: Ordering[String] = BpeTrain.CodePointOrdering

  /** Textbook sequential BPE over a word-frequency table. */
  private def referenceBpe(freq: Map[String, Long], numMerges: Int): Seq[(Int, String, String)] = {
    var words: Vector[(Vector[String], Long)] =
      freq.toVector.map { case (w, c) => (codePoints(w), c) }
    val out = Vector.newBuilder[(Int, String, String)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) continue = false
      else {
        // max count, ties to code-point-smallest (left, right)
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
      merges.foldLeft(codePoints(w)) { case (syms, (a, b)) =>
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

  test("non-BMP corpus: code-point symbols and code-point tie-break " +
      "agree with the reference") {
    import spark.implicits._
    // A supplementary character (emoji U+1F600, two UTF-16 code units)
    // interleaved with a BMP char ABOVE the surrogate range (U+FFFD):
    // a code-unit split shears the emoji into lone surrogates, and a
    // UTF-16 compareTo tie-break sorts the emoji BELOW U+FFFD (its
    // high surrogate 0xD83D < 0xFFFD) while code-point order sorts it
    // above — either bug diverges from the reference here.
    val emoji = new String(Character.toChars(0x1F600))
    val hi = "\uFFFD"
    val doc = Seq(
      s"$emoji$hi$emoji", s"$hi$emoji$hi", s"$emoji$hi$emoji", "ab", "ab"
    ).mkString(" ")
    val docs = Seq(doc).toDF("text").withColumn("doc_id", lit(1L))
    val expected = referenceBpe(corpusFreq(Seq(doc)), 6)
      .map { case (r, a, b) => (r, a, b, a + b) }
    val got = BpeTrain(docs, 6).orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(got === expected)
    // learned symbols are whole code points — no lone surrogates
    got.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach { s =>
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          assert(!Character.isSurrogate(cp.toChar) || Character.charCount(cp) == 2,
            s"lone surrogate in symbol ${s.map(c => f"${c.toInt}%04x")}")
          i += Character.charCount(cp)
        }
      }
    }
  }

  test("merge-table parity with the sequential reference at 256 merges") {
    import spark.implicits._
    // A corpus rich enough for 256 distinct merges: 200 deterministic
    // LCG-generated 16-char words over a 20-letter alphabet (low pair
    // sharing, so the vocab doesn't collapse early) with skewed counts
    // (word i repeated (i mod 13)+1 times) — count ties exercise the
    // code-point tie-break throughout the chain.
    val alpha = "abcdefghijklmnopqrst"
    var seed = 12345L
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val rows = (0 until 200).flatMap { i =>
      val w = (0 until 16).map(_ => alpha(nextInt(20))).mkString
      Seq.fill(i % 13 + 1)(w)
    }
    val docs = rows.grouped(16).map(_.mkString(" ")).toSeq.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val expected = referenceBpe(corpusFreq(rows.grouped(16).map(_.mkString(" ")).toSeq), 256)
    val (gotDf, stats) = BpeTrain.trainWithStats(docs, 256, collectStats = true)
    val got = gotDf.orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(got === expected)
    assert(got.size >= 200, s"corpus exhausted after only ${got.size} merges " +
      "— fixture not rich enough to exercise a deep merge chain")
    // batched rounds really batch: the sequential-equivalence proof
    // must fire on a real corpus, not degenerate to width 1 everywhere
    assert(stats.map(_.nMerges).sum === got.size)
    assert(stats.size < got.size,
      s"no round batched more than one merge (${stats.size} rounds for " +
        s"${got.size} merges) — selectBatch never proved independence")
  }

  test("batched training is bit-identical to width-1 training") {
    val docs = Tables.documents(spark, Sf)
    val batched = BpeTrain.trainWithStats(docs, 16)._1
      .orderBy(col("rank")).collect().toSeq
    val oneAtATime = BpeTrain.trainWithStats(docs, 16, batchWidth = 1)._1
      .orderBy(col("rank")).collect().toSeq
    assert(batched === oneAtATime)
  }

  test("per-round work is proportional to affected words, not vocab size") {
    import spark.implicits._
    // 2000 single-letter filler words: they have NO adjacent pairs, so
    // no merge can ever touch them — only the 4 planted multi-char
    // words are ever affected. The incremental trainer must therefore
    // aggregate at most 4 words per round; the round-6 full-recount
    // design processed all 2004.
    val filler = (0 until 2000).map(i => s"${('a' + i % 26).toChar}")
    val planted = Seq("wxyz", "wxyz", "wxyzwxyz", "yzwx")
    val docs = (filler ++ planted).grouped(50).map(_.mkString(" ")).toSeq
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val (mergesDf, stats) =
      BpeTrain.trainWithStats(docs, numMerges = 6, collectStats = true)
    val merges = mergesDf.collect()
    assert(merges.length >= 3, "planted words must yield at least 3 merges")
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.affectedWords <= planted.distinct.size.toLong,
        s"round ${s.rank} aggregated ${s.affectedWords} words — " +
          "delta counting must touch only words containing the merged pair")
    }
    // and the merge table still matches the sequential reference
    val expected = referenceBpe(
      corpusFreq((filler ++ planted).grouped(50).map(_.mkString(" ")).toSeq), 6)
      .map { case (r, a, b) => (r, a, b) }
    assert(merges.sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq === expected)
  }

  test("ranked-greedy encode equals the fold chain under trained merges") {
    val docs = Tables.documents(spark, Sf)
    val merges = BpeTrain(docs, numMerges = 16).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def toks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      df.select(col("doc_id"), col("tokens")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val ranked = toks(BpeEncode.applyRanked(docs, merges))
    assert(ranked === toks(BpeEncode(docs, merges)))
    assert(ranked.nonEmpty)
    // and the vocab-path frequency rollup agrees too
    val f = BpeEncode.tokenFrequencies(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fr = BpeEncode.tokenFrequenciesRanked(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fr === f)
  }

  test("ranked-greedy encode parity at 64 trained merges and on non-BMP text") {
    import spark.implicits._
    val alpha = "abcdefghijklmnopqrst"
    var seed = 54321L
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val rows = (0 until 80).flatMap { i =>
      val w = (0 until 12).map(_ => alpha(nextInt(20))).mkString
      Seq.fill(i % 7 + 1)(w)
    }
    val docs = rows.grouped(16).map(_.mkString(" ")).toSeq.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val merges = BpeTrain(docs, 64).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size === 64)
    def toks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      df.select(col("doc_id"), col("tokens")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(BpeEncode.applyRanked(docs, merges)) ===
      toks(BpeEncode(docs, merges)))
    // non-BMP: code-point symbols survive the ranked path too
    val emoji = new String(Character.toChars(0x1F600))
    val eDocs = Seq(s"$emoji\uFFFD$emoji \uFFFD$emoji\uFFFD ab ab")
      .toDF("text").withColumn("doc_id", lit(1L))
    val eMerges = BpeTrain(eDocs, 6).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(toks(BpeEncode.applyRanked(eDocs, eMerges)) ===
      toks(BpeEncode(eDocs, eMerges)))
  }

  test("ranked-greedy needs a TRAINED table: an out-of-rank-order " +
      "hand-written table diverges by design") {
    import spark.implicits._
    // rank-1 pair (ab, c) is built over a symbol only minted by rank-2
    // (a, b) — impossible for BpeTrain to emit. Sequential passes never
    // reach it (rank 1 runs before "ab" exists); ranked-greedy applies
    // rank 2 then finds rank 1 live. The divergence IS the documented
    // equivalence contract.
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val badTable = Seq(("ab", "c"), ("a", "b"))
    val fold = BpeEncode(docs, badTable).collect().head.getSeq[String](1)
    val ranked = BpeEncode.applyRanked(docs, badTable)
      .collect().head.getSeq[String](1)
    assert(fold === Seq("ab", "c"))
    assert(ranked === Seq("abc"))
  }

  test("PROPERTY: batched selection equals sequential BPE on 300 " +
      "adversarial random corpora (pure driver, no Spark jobs)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // The batching proof (selectBatch) is the subtle logic: exercise it
    // against the textbook reference with EXACT per-symbol ceilings —
    // the most aggressive valid bounds, so any hole in the acceptance
    // rule (overlap, tie-break, merged-symbol conflation) surfaces.
    // Tiny alphabets force collisions, ties, run collapses, and
    // same-merged-string conflation ("x"+"yz" vs "xy"+"z" → "xyz").
    def inMemoryBatched(freq: Map[String, Long], numMerges: Int,
        width: Int): Seq[(String, String)] = {
      var words = freq.toVector.map { case (w, c) => (codePoints(w), c) }
      val out = Vector.newBuilder[(String, String)]
      var rank = 0
      var exhausted = false
      while (rank < numMerges && !exhausted) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- words; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (counts.isEmpty) exhausted = true
        else {
          implicit val ord: Ordering[(Long, String, String)] =
            Ordering.by[(Long, String, String), Long](-_._1)
              .orElse(Ordering.by[(Long, String, String), String](_._2)(cpOrd))
              .orElse(Ordering.by[(Long, String, String), String](_._3)(cpOrd))
          val ordered = scala.collection.immutable.TreeSet.from(
            counts.map { case ((l, r), n) => (n, l, r) })
          val maxLeft = scala.collection.mutable.Map.empty[String, Long]
          val maxRight = scala.collection.mutable.Map.empty[String, Long]
          counts.foreach { case ((l, r), n) =>
            if (n > maxLeft.getOrElse(l, Long.MinValue)) maxLeft(l) = n
            if (n > maxRight.getOrElse(r, Long.MinValue)) maxRight(r) = n
          }
          val batch = BpeTrain.selectBatch(ordered, maxLeft, maxRight,
            math.min(width, numMerges - rank))
          batch.foreach { case (a, b) =>
            out += ((a, b))
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
          }
          rank += batch.size
        }
      }
      out.result()
    }
    val corpusGen = for {
      alphaSize <- Gen.choose(2, 5)
      nWords <- Gen.choose(3, 10)
      words <- Gen.listOfN(nWords, for {
        len <- Gen.choose(1, 8)
        cs <- Gen.listOfN(len, Gen.choose(0, alphaSize - 1))
      } yield cs.map(i => ('a' + i).toChar).mkString)
      counts <- Gen.listOfN(nWords, Gen.choose(1L, 5L))
    } yield words.zip(counts).groupMapReduce(_._1)(_._2)(_ + _)
    val cases = (1 to 300).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 250)
    var batchedRounds = 0
    var totalMerges = 0
    cases.foreach { freq =>
      val expected = referenceBpe(freq, 12).map { case (_, a, b) => (a, b) }
      Seq(1, 2, 4, 16).foreach { w =>
        val got = inMemoryBatched(freq, 12, w)
        assert(got == expected,
          s"width $w diverged on $freq:\n got $got\n exp $expected")
      }
      totalMerges += expected.size
      batchedRounds += 1
    }
    assert(totalMerges > 1000, "generator produced trivially-short merge chains")
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
