package graft

import org.apache.spark.sql.functions._

import graft.queries.SimOps

/** [[SimOps.coresetSelect]] (farthest-point k-center) on planted
  * cluster structure, plus q_dedup_lsh_eval's report invariants. */
class CoresetSpec extends SparkSuite {

  // 4 tight clusters at orthogonal corners of the 64-d cube, 10
  // points each with small deterministic jitter
  private def clustered() = {
    import spark.implicits._
    (0 until 40).map { i =>
      val c = i % 4
      val base = Array.tabulate(64)(d =>
        if (d / 16 == c) 10.0f else 0.0f)
      val jit = noiseVec(i.toLong, 64).toArray
      (i.toLong, base.indices.map(d => base(d) + 0.01f * jit(d)).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("k=4 centers land one per planted cluster") {
    val centers = SimOps.coresetSelect(clustered(), 4)
    assert(centers.length === 4)
    val clustersHit = centers.map(_._1 % 4).toSet
    assert(clustersHit.size === 4,
      s"centers ${centers.map(_._1)} missed a cluster")
  }

  test("selection distances are non-increasing (farthest-first invariant)") {
    val d = SimOps.coresetSelect(clustered(), 6).map(_._2)
    assert(d.head === 0.0) // seed center
    d.tail.zip(d.tail.tail).foreach { case (a, b) =>
      assert(a >= b, s"selection distance increased: $a -> $b")
    }
  }

  test("deterministic across partitionings; seed is the min vec_id") {
    import spark.implicits._
    val df = clustered()
    val a = SimOps.coresetSelect(df.repartition(1), 5)
    val b = SimOps.coresetSelect(df.repartition(7), 5)
    assert(a === b)
    assert(a.head._1 === 0L)
  }

  test("k >= n returns every point") {
    import spark.implicits._
    val tiny = (0 until 3).map(i =>
      (i.toLong, noiseVec(i.toLong, 8).map(_.toFloat))).toDF("vec_id", "embedding")
    val centers = SimOps.coresetSelect(tiny, 5)
    assert(centers.map(_._1).toSet === Set(0L, 1L, 2L))
  }

  test("q_sample_coreset registry query returns k rows") {
    val out = SparkEntry.queries("q_sample_coreset")(spark, Sf).collect()
    assert(out.length === 8)
  }

  test("q_dedup_lsh_eval: counts consistent, ratios in range") {
    val r = SparkEntry.queries("q_dedup_lsh_eval")(spark, Sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (nTrue, nCand, nHit) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nHit <= nTrue && nHit <= nCand)
    assert(row.getDouble(3) >= 0.9,
      s"minhash recall collapsed: ${row.getDouble(3)}") // 16 hashes / 8 bands on a near-dup-dense corpus
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) <= 1.0)
  }
}
