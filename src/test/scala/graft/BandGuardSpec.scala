package graft

import org.apache.spark.sql.functions._

import graft.queries.{SimOps, TextOps}

/** Mega-bucket guard (operators/BandGuard): a degenerate LSH bucket — a
  * viral duplicate cluster — must produce LINEAR, not quadratic, pair
  * output, while keeping the cluster connected for the components pass. */
class BandGuardSpec extends SparkSuite {

  private def identicalDocs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
  }

  test("minhash: an over-cap bucket emits only hub-star pairs") {
    val docs = identicalDocs(1000)
    val pairs = TextOps
      .minhashShingleCandidates(docs, numHashes = 16, bands = 8, bucketCap = 64)
      .collect()
    // identical docs share every band; first-band dedup + the guard
    // leave exactly the star around the minimum id: n−1 pairs, not n²/2
    assert(pairs.length === 999)
    assert(pairs.forall(_.getLong(0) == 1L), "hub must be the bucket min id")
    assert(pairs.map(_.getLong(1)).toSet === (2L to 1000L).toSet)
  }

  test("minhash: under-cap buckets still pair all-to-all") {
    val docs = identicalDocs(30)
    val pairs = TextOps
      .minhashShingleCandidates(docs, numHashes = 16, bands = 8, bucketCap = 64)
      .collect()
    assert(pairs.length === 30 * 29 / 2)
  }

  test("star pairs keep the cluster one component") {
    val pairs = TextOps
      .minhashShingleCandidates(identicalDocs(300), numHashes = 16,
        bands = 8, bucketCap = 32)
    val comps = TextOps.connectedComponents(pairs.select(col("d1"), col("d2")))
    assert(comps.select(col("comp")).distinct().count() === 1)
    assert(comps.count() === 300)
  }

  test("guard bound: pair output stays exactly at the cap law across a size sweep") {
    // The guard's contract is a closed-form bound, not just "smaller":
    // a bucket of m members emits m(m−1)/2 pairs at or under the cap
    // and exactly m−1 (the hub star) above it. Regression-test the law
    // itself across the cap boundary so a future rewrite can't quietly
    // re-quadratify one branch (the 100 TB failure mode) or drop pairs
    // from compliant buckets (the recall failure mode).
    val cap = 32
    for (m <- Seq(2, 31, 32, 33, 64, 500)) {
      val n = TextOps
        .minhashShingleCandidates(identicalDocs(m), numHashes = 16,
          bands = 8, bucketCap = cap)
        .count()
      val bound = if (m <= cap) m.toLong * (m - 1) / 2 else (m - 1).toLong
      assert(n === bound, s"bucket of $m with cap $cap emitted $n pairs")
    }
  }

  test("guard bound: mixed bucket sizes are each bounded independently") {
    import spark.implicits._
    // Three disjoint-vocabulary clusters land in disjoint buckets; the
    // guard must judge each against the cap on ITS OWN membership —
    // small clusters keep full recall while the viral one is starred.
    val docs = Seq(5 -> "alpha", 40 -> "beta", 200 -> "gamma")
      .flatMap { case (m, w) =>
        (1 to m).map(i => ((w.hashCode.abs.toLong << 16) + i,
          s"${w}1 ${w}2 ${w}3 ${w}4 ${w}5 ${w}6 ${w}7 ${w}8"))
      }.toDF("doc_id", "text")
    val n = TextOps
      .minhashShingleCandidates(docs, numHashes = 16, bands = 8, bucketCap = 32)
      .count()
    assert(n === (5L * 4 / 2) + (40 - 1) + (200 - 1),
      "per-bucket cap law violated on a mixed-size corpus")
  }

  test("embedding LSH: over-cap bucket emits hub-star pairs") {
    import spark.implicits._
    val vec = Array.tabulate(64)(i => (i % 7).toFloat - 3f)
    val emb = (1 to 500).map(i => (i.toLong, vec)).toDF("vec_id", "embedding")
    val pairs = SimOps
      .lshCandidatePairs(emb, dim = 64, planes = 5, tables = 8, bucketCap = 32)
      .collect()
    assert(pairs.length === 499)
    assert(pairs.forall(_.getLong(0) == 1L))
  }
}
