package graft

import org.apache.spark.sql.functions._

import graft.queries.Matching

/** [[Matching.bestMatch]] on a planted sparse fixture where every
  * dirty record's true source is the UNIQUE nearest candidate — the
  * property the adversarially dense customer fixture can't promise
  * (its names are mutual Hamming-1 neighbors; there the oracle gate
  * proves cross-engine agreement instead). */
class MatchingSpec extends SparkSuite {

  // 26 masters, names "AAAAAAAAAA".."ZZZZZZZZZZ" — pairwise edit
  // distance 10, all in one block (nation 1, length 10)
  private def masters() = {
    import spark.implicits._
    (0 until 26).map { i =>
      val ch = ('A' + i).toChar.toString
      (i.toLong, ch * 10, 1)
    }.toDF("m_id", "m_name", "m_nk")
  }

  test("a 2-char corruption matches its unique source, with the exact distance") {
    import spark.implicits._
    val dirty = (0 until 26).map { i =>
      val ch = ('A' + i).toChar.toString
      (1000L + i, "xx" + ch * 8, 1, 10)
    }.toDF("in_id", "in_name", "nk", "ln")
    val out = Matching.bestMatch(dirty, masters())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 26)
    out.foreach { case (inId, mId, dist) =>
      assert(mId === inId - 1000L, s"wrong source for $inId")
      assert(dist === 2L)
    }
  }

  test("blocking completeness: candidates outside the block never score") {
    import spark.implicits._
    // the nearest NAME is in nation 2, but the block restricts to
    // nation 1 — the match must come from inside the block
    val master = Seq(
      (1L, "AAAAAAAAAA", 1), (2L, "BBBBBBBBBB", 2)).toDF("m_id", "m_name", "m_nk")
    val dirty = Seq((9L, "BBBBBBBBBx", 1, 10)).toDF("in_id", "in_name", "nk", "ln")
    val out = Matching.bestMatch(dirty, master).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L) // nation-1 candidate, not the closer name
  }

  test("confusion-normalized blocking: a lev-closer candidate OUTSIDE " +
      "the noise model never scores") {
    import spark.implicits._
    // dirty "AOI" is master 1 ("A01") under the 0→O / 1→I confusion
    // (distance 2); master 2 ("AOQ") is levenshtein-CLOSER (distance 1)
    // but not reachable by the declared noise model
    val master = Seq((1L, "A01", 1), (2L, "AOQ", 1))
      .toDF("m_id", "m_name", "m_nk")
    val dirty = Seq((9L, "AOI", 1, 3)).toDF("in_id", "in_name", "nk", "ln")
    val loose = Matching.bestMatch(dirty, master).collect()
    assert(loose.head.getLong(1) === 2L && loose.head.getLong(2) === 1L,
      "two-key block should pick the lev-closest candidate")
    val out = Matching.bestMatch(dirty, master,
      confusion = Some(("OIZE", "0123"))).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L && out.head.getLong(2) === 2L,
      "normalized key must exclude the confusion-unreachable candidate")
  }

  test("empty block yields no row (explicit no-match, not a null match)") {
    import spark.implicits._
    val dirty = Seq((9L, "AAAAAAAAAA", 99, 10)).toDF("in_id", "in_name", "nk", "ln")
    assert(Matching.bestMatch(dirty, masters()).count() === 0)
  }

  test("registry query: every dirty record matches, and most recover their source") {
    val out = SparkEntry.queries("q_er_match")(spark, Sf)
      .agg(count(lit(1)).as("n"),
        sum(when(col("in_id") === col("m_id"), 1L).otherwise(0L)).as("n_self"))
      .collect().head
    val n = out.getLong(0)
    assert(n > 0)
    // with the confusion-normalized blocking key (round 13) every
    // dirty record's block contains exactly its source (TPC-H names
    // are unique and carry no O/I/Z/E, so normalized forms stay
    // distinct): all records recover their source, where the two-key
    // block's dense tie-space only guaranteed a majority
    assert(out.getLong(1) === n,
      s"${n - out.getLong(1)} of $n dirty records missed their source")
  }

  test("blocking-quality report: completeness 1 on the fixture, " +
      "near-total comparison-space reduction") {
    val r = SparkEntry.queries("q_er_blocking_eval")(spark, Sf)
      .collect() match {
        case Array(row) => row
        case other => fail(s"expected one report row, got ${other.length}")
      }
    val (nIn, nMaster, nCand) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nIn > 0 && nMaster > nIn)
    // every dirty record's true source must be inside its block —
    // the property the confusion-normalized key exists to guarantee
    assert(r.getDouble(3) === 1.0, s"pair completeness ${r.getDouble(3)}")
    // and the block is a real cut of the |in|x|master| space
    assert(nCand >= nIn)
    assert(r.getDouble(4) > 0.99, s"reduction ratio ${r.getDouble(4)}")
  }

  test("survivorship: field-wise priority wins with provenance, one golden row per key") {
    val golden = SparkEntry.queries("q_er_survivorship")(spark, Sf).collect()
    val master = Tables.customer(spark, Sf)
      .select(col("c_custkey"), col("c_name"),
        Tables.dec(col("c_acctbal")).cast("decimal(18,2)").as("bal"),
        col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDecimal(2), r.getString(3)))
      .toMap
    assert(golden.length === master.size, "one golden row per entity")
    golden.foreach { r =>
      val key = r.getLong(0)
      val (cName, cBal, cSeg) = master(key)
      // name: web has none, so CRM (prio 2) always wins — never the
      // OCR-corrupted variant
      assert(r.getString(1) === cName)
      assert(r.getLong(4) === 2L, s"$key name_src")
      // balance: web feed (prio 1, +10.00) wins for %5 keys, CRM else
      if (key % 5 == 0) {
        assert(r.getDouble(2) ===
          cBal.add(new java.math.BigDecimal("10.00")).doubleValue(),
          s"$key fresh balance")
        assert(r.getLong(5) === 1L, s"$key bal_src")
      } else {
        assert(r.getDouble(2) === cBal.doubleValue())
        assert(r.getLong(5) === 2L, s"$key bal_src")
      }
      assert(r.getString(3) === cSeg)
    }
  }
}
