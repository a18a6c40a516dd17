package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5.2) of the pure formulas the
  * distributed operators rely on — fast (no Spark jobs), wide input
  * coverage. ScalaCheck generators are driven with fixed seeds
  * (deterministic runs; scalatestplus bridge is not on the offline
  * classpath). */
class PropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** The q_win_ntile CASE formula, extracted: SQL NTILE(k) of rank rn
    * (1-based) among n rows. */
  private def ntileFormula(rn: Long, n: Long, k: Long): Long = {
    val q = n / k
    val r = n % k
    if (rn <= (q + 1) * r) (rn - 1) / (q + 1) + 1
    else r + (rn - 1 - (q + 1) * r) / q + 1
  }

  /** Reference NTILE: first (n mod k) buckets get ceil(n/k) rows. */
  private def ntileReference(n: Int, k: Int): Seq[Long] = {
    val q = n / k
    val r = n % k
    (1 to k).flatMap { b =>
      val size = if (b <= r) q + 1 else q
      Seq.fill(size)(b.toLong)
    }
  }

  test("ntile formula matches the bucket-size definition for all n") {
    val cases = samples(Gen.zip(Gen.choose(1, 400), Gen.choose(1, 10)))
      .filter { case (n, k) => n >= k } // ntile defined: more rows than buckets
    assert(cases.size > 100)
    cases.foreach { case (n, k) =>
      val got = (1 to n).map(rn => ntileFormula(rn.toLong, n.toLong, k.toLong))
      assert(got == ntileReference(n, k), s"n=$n k=$k")
    }
  }

  /** The q_text_fingerprint fold, extracted. */
  private def fingerprint(feats: Seq[Long]): Long =
    feats.foldLeft(0L)((acc, f) => (acc * 31 + f) % 1000000007L)

  test("fingerprint stays in [0, p) and is deterministic and order-sensitive") {
    samples(Gen.listOf(Gen.choose(0L, 100000L))).foreach { feats =>
      val h = fingerprint(feats)
      assert(h >= 0L && h < 1000000007L)
      assert(h == fingerprint(feats))
    }
    assert(fingerprint(Seq(1L, 2L)) != fingerprint(Seq(2L, 1L)))
  }

  /** Jaccard over sets, as computed by q_dedup_jaccard. */
  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / (a.size + b.size - a.intersect(b).size)

  test("jaccard is symmetric, bounded, and 1 only for equal sets") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.toSet)
    samples(Gen.zip(tokGen, tokGen)).foreach { case (a, b) =>
      val j = jaccard(a, b)
      assert(j == jaccard(b, a))
      assert(j >= 0.0 && j <= 1.0)
      if (a.nonEmpty && j == 1.0) assert(a == b)
    }
  }

  test("ShingleJoin parity vs HOF on random token arrays (incl. unicode)") {
    import org.apache.spark.sql.functions._
    import graft.expressions.ShingleJoin
    import graft.queries.TextOps
    import spark.implicits._
    val tok = Gen.oneOf("a", "bb", "γδ", "日本", "x-1", "", "the")
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tok))
    val arrays = samples(arrGen, 120)
    val df = arrays.toDF("toks")
    val rows = df.select(
      ShingleJoin(col("toks"), 3, shortToUnigrams = false).as("ne"),
      TextOps.shingleArrayHof(col("toks"), array().cast("array<string>")).as("he"),
      ShingleJoin(col("toks"), 3, shortToUnigrams = true).as("nu"),
      TextOps.shingleArrayHof(col("toks"), col("toks")).as("hu")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
      assert(r.getSeq[String](2) == r.getSeq[String](3), r.toString)
    }
  }

  test("SignBitLsh parity vs HOF on random embeddings") {
    import org.apache.spark.sql.functions.col
    import graft.expressions.SignBitLsh
    import graft.queries.SimOps
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.choose(-10.0f, 10.0f))
    val vecs = samples(vecGen, 100).map(_.toArray)
    val df = vecs.toDF("e")
    val rows = df.select(
      SignBitLsh(col("e"), 8, 3, 4).as("n"),
      SimOps.lshBucketsHof(col("e"), 8, 3, 4).as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("InterleaveBits: monotone locality and exact round-trip") {
    // deinterleaving the even/odd bits must recover the masked inputs
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until 21) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    import org.apache.spark.sql.functions.col
    import graft.expressions.InterleaveBits
    import spark.implicits._
    val pairs = samples(Gen.zip(Gen.choose(0, (1 << 21) - 1), Gen.choose(0, (1 << 21) - 1)), 150)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"), InterleaveBits(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y) = deinterleave(r.getLong(2))
      assert(x == r.getInt(0).toLong && y == r.getInt(1).toLong, r.toString)
    }
  }

  /** LSH band-match probability: more bands can only add candidates
    * (monotonicity backing the minhash superset test). */
  test("band signatures: equal token sets give equal signatures") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "z y x"), (4L, "p q")
    ).toDF("doc_id", "text")
    val sigs = df
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(7)),
          i => array_min(transform(col("toks"), t => xxhash64(i, t)))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical docs must collide")
    assert(sigs(1L) == sigs(3L), "signature must be order-insensitive (set semantics)")
    assert(sigs(1L) != sigs(4L), "disjoint docs must (generically) differ")
  }

  /** Reference Levenshtein over code points (plain DP). */
  private def lev(a: String, b: String): Int = {
    val as = a.codePoints().toArray
    val bs = b.codePoints().toArray
    val d = Array.tabulate(as.length + 1, bs.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to as.length; j <- 1 to bs.length) {
      val sub = d(i - 1)(j - 1) + (if (as(i - 1) == bs(j - 1)) 0 else 1)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), sub)
    }
    d(as.length)(bs.length)
  }

  /** CharHistL1's pruning bound (q_dedup_editdist): the leading-byte
    * char-histogram L1 never exceeds 2x the true edit distance, for
    * arbitrary strings including multibyte — filtering candidate
    * pairs at l1 <= 2*maxDist is therefore lossless. */
  test("char-histogram L1 lower-bounds 2x edit distance on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val alphabet = Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', 'é', 'ß', '日', '語', 'ü'))
    val word = Gen.choose(0, 24)
      .flatMap(n => Gen.listOfN(n, alphabet).map(_.mkString))
    val cases = samples(Gen.zip(word, word), 400)
    assert(cases.size > 300)
    cases.foreach { case (a, b) =>
      val l1 = graft.expressions.CharHist.l1(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(l1 <= 2 * lev(a, b), s"bound violated for '$a' vs '$b'")
    }
  }

  /** The q_dedup_prefix length formula, extracted (integer-exact
    * ceil: (sz·tNum + tDen − 1) div tDen). */
  private def prefixLen(sz: Int, tNum: Int, tDen: Int): Int =
    sz - (sz * tNum + tDen - 1) / tDen + 1

  test("prefix-filter theorem holds on random set corpora: every " +
      "over-threshold pair shares a token within both prefixes") {
    // random families of token sets over a small alphabet (forces
    // collisions); canonical order = (global frequency asc, token asc),
    // exactly prefixJaccardPairs' sort key
    val corpus = Gen.choose(2, 14).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 12).flatMap(sz =>
        Gen.listOfN(sz, Gen.choose(0, 19)).map(_.toSet))))
    val cases = samples(corpus, 300)
    assert(cases.size > 200)
    for (ts <- Seq((4, 5), (1, 2), (9, 10)); sets <- cases) {
      val (tNum, tDen) = ts
      val t = tNum.toDouble / tDen
      val freq = sets.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def canon(s: Set[Int]): Seq[Int] =
        s.toSeq.sortBy(x => (freq(x), x))
      def prefix(s: Set[Int]): Set[Int] =
        canon(s).take(prefixLen(s.size, tNum, tDen)).toSet
      for {
        i <- sets.indices; j <- sets.indices if i < j
        a = sets(i); b = sets(j)
        inter = (a & b).size
        jac = inter.toDouble / (a.size + b.size - inter)
        if jac >= t
      } assert((prefix(a) & prefix(b)).nonEmpty,
        s"t=$tNum/$tDen: J=$jac pair escaped the prefixes: $a vs $b " +
          s"(prefixes ${prefix(a)} / ${prefix(b)})")
    }
  }

  test("NFC normalization is idempotent and its output is normalized, " +
      "on random strings with combining marks") {
    import java.text.Normalizer
    val char = Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('e', 'a', 'o', 'A', 'n'),
      // combining acute/grave/ring/tilde/cedilla — the decomposed parts
      Gen.oneOf('\u0301', '\u0300', '\u030a', '\u0303', '\u0327'),
      Gen.oneOf('\u00e9', '\u00c5', '\u00df', '\u65e5', '\u00fc'))
    val str = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, char).map(_.mkString))
    val cases = samples(str, 400)
    assert(cases.size > 300)
    val expr = graft.expressions.NormalizeNfc(
      org.apache.spark.sql.graftbridge.Bridge.expression(
        org.apache.spark.sql.functions.col("s")))
    cases.foreach { s =>
      val once = expr.nullSafeEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      assert(Normalizer.isNormalized(once, Normalizer.Form.NFC),
        s"output not NFC for input '$s'")
      assert(once == Normalizer.normalize(s, Normalizer.Form.NFC),
        s"expression diverges from java.text.Normalizer on '$s'")
      val twice = expr.nullSafeEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(once)).toString
      assert(twice == once, s"not idempotent on '$s'")
    }
  }
}
