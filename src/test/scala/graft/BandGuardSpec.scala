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
