package graft

import org.apache.spark.sql.functions._

import graft.expressions.CosineSimilarity
import graft.queries.SimOps

/** The codegen'd CosineSimilarity expression must be bit-identical to
  * the higher-order-function formulation (which mirrors the DuckDB
  * oracle SQL), and must actually run inside whole-stage codegen. */
class ExpressionSpec extends SparkSuite {

  test("expression equals HOF cosine bit-for-bit on the fixture") {
    // exclude the session's cosine rewrite: the ref column must stay
    // the genuine interpreted HOF fold for this parity to mean anything
    withSQLConf(NoCosineRewrite) {
      val emb = Tables.embeddings(spark, Sf).limit(200)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      val both = emb.crossJoin(broadcast(probe))
        .select(
          CosineSimilarity(col("embedding"), col("probe")).as("fast"),
          SimOps.cosineHof(col("embedding"), col("probe")).as("ref"))
        .collect()
      both.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"${r.getDouble(0)} != ${r.getDouble(1)}")
      }
    }
  }

  test("expression participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, Sf)
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
    val df = emb.crossJoin(broadcast(probe))
      .select(CosineSimilarity(col("embedding"), col("probe")).as("cos"))
    // collect() executes THIS queryExecution so AQE finalizes the plan
    // (count() would plan a separate query)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a whole-stage-codegen stage; the projection holding
    // the expression must sit inside one (a CodegenFallback would
    // strand it outside).
    assert(plan.contains(") Project [cosine_similarity") &&
      """\*\(\d+\) Project \[cosine_similarity""".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("null input yields null; mismatched lengths yield null (HOF parity)") {
    withSQLConf(NoCosineRewrite) {
      import spark.implicits._
      val df = Seq(
        (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
        (None, Some(Array(1.0f, 0.0f))),
        (Some(Array(1.0f, 0.0f, 3.0f)), Some(Array(1.0f, 0.0f)))).toDF("a", "b")
      val rows = df.select(
        CosineSimilarity(col("a"), col("b")).as("c"),
        SimOps.cosineHof(col("a"), col("b")).as("h")).collect()
      assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
      // ragged: zip_with pads with null and the fold propagates — the
      // native expression must agree, not truncate to min length
      assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    }
  }

  test("MinHashBands equals the HOF minhash formulation bit-for-bit") {
    import graft.expressions.MinHashBands
    val docs = Tables.documents(spark, Sf)
    val toks = array_distinct(split(col("text"), " "))
    val hof = {
      val sig = transform(sequence(lit(0), lit(15)),
        i => array_min(transform(toks, t => xxhash64(i, t))))
      transform(sequence(lit(0), lit(7)),
        b => xxhash64(slice(sig, b * lit(2) + 1, lit(2))))
    }
    val rows = docs.select(col("doc_id"),
      MinHashBands(toks, numHashes = 16, bands = 8).as("native"),
      hof.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"minhash bands diverge for doc ${r.getLong(0)}")
    }
  }

  test("MinHashBands codegen and interpreted paths agree") {
    import graft.expressions.MinHashBands
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"), Seq("a"), Seq("x", "y", "x"), Seq.empty[String]
    ).toDF("toks")
    val cg = df.select(MinHashBands(col("toks"), 16, 8).as("b")).collect()
    val interp = df.select(MinHashBands(col("toks"), 16, 8).as("b")).collect()
    // force interpreted evaluation via local relation + eval
    val expr = graft.expressions.MinHashBands(
      org.apache.spark.sql.graftbridge.Bridge.expression(col("toks")), 16, 8)
    val direct = Seq(Seq("a", "b", "c"), Seq("a"), Seq("x", "y", "x")).map { s =>
      expr.nullSafeEval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          s.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    }
    assert(cg.take(3).map(_.getSeq[Long](0)) sameElements direct.toArray.map(identity))
    assert(cg(3).isNullAt(0), "empty token array must yield null")
    assert(interp.map(_.toString) sameElements cg.map(_.toString))
  }

  test("FirstEqualIndex: first match, no match, ragged lengths, nulls") {
    import graft.expressions.FirstEqualIndex
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(9L, 2L, 3L))), // first match at 1
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),         // no match -> -1
      (Some(Seq(7L, 8L, 9L)), Some(Seq(7L))),         // ragged: compare prefix
      (None, Some(Seq(1L)))                            // null in -> null out
    ).toDF("a", "b")
    val rows = df.select(FirstEqualIndex(col("a"), col("b")).as("i")).collect()
    assert(rows(0).getInt(0) == 1)
    assert(rows(1).getInt(0) == -1)
    assert(rows(2).getInt(0) == 0)
    assert(rows(3).isNullAt(0))
    // non-long arrays rejected at analysis time
    val ints = Seq((Array(1, 2), Array(1, 2))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(FirstEqualIndex(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }

  test("ShingleJoin equals the HOF shingle formulation in both modes") {
    import graft.expressions.ShingleJoin
    import graft.queries.TextOps
    val toks = split(col("text"), " ")
    val rows = Tables.documents(spark, Sf).select(col("doc_id"),
      ShingleJoin(toks, 3, shortToUnigrams = false).as("ne"),
      TextOps.shingleArrayHof(toks, array().cast("array<string>")).as("he"),
      ShingleJoin(toks, 3, shortToUnigrams = true).as("nu"),
      TextOps.shingleArrayHof(toks, toks).as("hu")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)} empty-mode")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"doc ${r.getLong(0)} unigram-mode")
    }
    // short docs: empty mode yields [], unigram mode yields distinct toks
    import spark.implicits._
    val shorts = Seq("a b", "a a", "x y z", "p q p q").toDF("text")
    val s = shorts.select(
      ShingleJoin(split(col("text"), " "), 3, shortToUnigrams = false).as("e"),
      ShingleJoin(split(col("text"), " "), 3, shortToUnigrams = true).as("u"),
      TextOps.shingleArrayHof(split(col("text"), " "), array().cast("array<string>")).as("eh"),
      TextOps.shingleArrayHof(split(col("text"), " "), split(col("text"), " ")).as("uh"))
      .collect()
    s.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](2), r.toString)
      assert(r.getSeq[String](1) == r.getSeq[String](3), r.toString)
    }
  }

  test("SignBitLsh equals the HOF bucket formulation bit-for-bit") {
    import graft.expressions.SignBitLsh
    val emb = Tables.embeddings(spark, Sf)
    val rows = emb.select(col("vec_id"),
      SignBitLsh(col("embedding"), 64, 4, 8).as("native"),
      SimOps.lshBucketsHof(col("embedding"), 64, 4, 8).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"lsh buckets diverge for vec ${r.getLong(0)}")
    }
  }

  test("SignBitLsh degenerate inputs mirror the HOF form") {
    import graft.expressions.SignBitLsh
    import spark.implicits._
    val df = Seq(
      Some(Array(1.0f, -2.0f, 0.5f)),  // exact dim
      Some(Array(1.0f, -2.0f)),        // too short -> all-zero buckets
      Some(Array.fill(4)(1.0f)),       // too long  -> all-zero buckets
      None                             // null -> null (HOF: bucket 0)
    ).toDF("e")
    val rows = df.select(
      SignBitLsh(col("e"), 3, 2, 2).as("native"),
      SimOps.lshBucketsHof(col("e"), 3, 2, 2).as("hof")).collect()
    rows.take(3).foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
    assert(rows(1).getSeq[Long](0).forall(_ == 0L))
    // deliberate divergence: null array yields null natively (drops the
    // row from candidate generation) where the HOF form's otherwise(0)
    // branch would file it into a junk all-zero bucket
    assert(rows(3).isNullAt(0))
    assert(rows(3).getSeq[Long](1).forall(_ == 0L))
    // runs inside whole-stage codegen (no CodegenFallback)
    val emb = Tables.embeddings(spark, Sf)
    val planned = emb.select(SignBitLsh(col("embedding"), 64, 4, 8).as("b"))
    assert(planned.collect().nonEmpty)
    val plan = planned.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[sign_bit_lsh""".r.findFirstIn(plan).isDefined, plan)
  }

  test("WinnowPrints equals the zip_with winnow chain, boundaries included") {
    import graft.expressions.WinnowPrints
    import graft.queries.TextOps
    // fixture corpus: bit-parity including first-occurrence distinct order
    val rows = Tables.documents(spark, Sf).select(col("doc_id"),
      WinnowPrints(TextOps.winnowFeatures(col("text")), 3, 4).as("fast"),
      TextOps.winnowHofPrints(TextOps.winnowFeatures(col("text"))).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
    // prefix-truncation boundaries: below / at / just above the minimum
    // k+w−1 = 6 tokens for one print, plus repeated-token dedup
    import spark.implicits._
    val edge = Seq("", "a", "a b c d e", "a b c d e f", "a b c d e f g",
      "a a a a a a a a", "x y x y x y x y x y").toDF("text")
    val e = edge.select(
      WinnowPrints(TextOps.winnowFeatures(col("text")), 3, 4).as("fast"),
      TextOps.winnowHofPrints(TextOps.winnowFeatures(col("text"))).as("ref"))
      .collect()
    e.foreach { r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString) }
    // the 6-token doc yields exactly one print; 5 tokens yield none
    val one = edge.select(size(
      WinnowPrints(TextOps.winnowFeatures(col("text")), 3, 4)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(one(2) === 0)
    assert(one(3) === 1)
  }

  test("MinHashBands and ShingleJoin run inside whole-stage codegen") {
    import graft.expressions.{MinHashBands, ShingleJoin}
    val docs = Tables.documents(spark, Sf)
    val toks = split(col("text"), " ")
    val df = docs.select(
      ShingleJoin(toks, 3, shortToUnigrams = false).as("sh"),
      MinHashBands(array_distinct(toks), 16, 8).as("bh"))
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // a CodegenFallback would strand the projection outside a "*(n)" stage
    assert("""\*\(\d+\) Project \[shingle_join""".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("minhash_bands"), plan)
  }

  test("non-float-array inputs are rejected at analysis time") {
    import spark.implicits._
    val ints = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }

  test("NormalizeNfc: composes decomposed sequences, identity on NFC " +
      "text, null-safe, codegen/interpreted parity") {
    import spark.implicits._
    import graft.expressions.NormalizeNfc
    val rows = Seq(
      ("cafe\u0301", "caf\u00e9"),   // e + combining acute -> precomposed
      ("caf\u00e9", "caf\u00e9"),    // already NFC: byte-identical
      ("A\u030aa", "\u00c5a"),       // A + combining ring -> precomposed
      ("plain ascii", "plain ascii"),
      ("", ""))
      .toDF("s", "want")
    def run(codegen: Boolean): Seq[(String, String)] = {
      var out = Seq.empty[(String, String)]
      withSQLConf("spark.sql.codegen.wholeStage" -> codegen.toString) {
        out = rows.select(col("want"), NormalizeNfc(col("s")).as("got"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      }
      out
    }
    for (mode <- Seq(true, false); (want, got) <- run(mode))
      assert(got === want, s"codegen=$mode")
    // null-in → null-out
    val n = Seq(Tuple1(null: String)).toDF("s")
      .select(NormalizeNfc(col("s"))).collect()
    assert(n.head.isNullAt(0))
    // non-string input rejected at analysis
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1)).toDF("i").select(NormalizeNfc(col("i"))).collect()
    }
    assert(e2.getMessage.contains("string"), e2.getMessage)
  }
}
