package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnBudget

/** [[AnnBudget]] — the calibrated ANN serving-budget policy (round
  * 18, VERDICT r17 #3). The recall COMPLIANCE checks live where the
  * data is (IndexEvalSpec's target floor, AnnDrift's day-0 assert);
  * this suite pins the policy ARITHMETIC: the scaling rules, the
  * floors, and the exact constants the calibration artifact
  * (tools/anncalib_r18.json) was read against — a silent constant
  * edit must fail a test, not just stale the scaladoc. */
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
}
