package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** PageRank has no DuckDB oracle (iterative FP mat-vec), so this suite
  * IS its correctness gate: exact recurrence parity on a known graph,
  * probability-mass conservation, and bit-determinism across
  * partitionings (the decimal contribution sum is the load-bearing
  * piece — a double sum drifts with partition order).
  */
class PageRankSpec extends SparkSuite {

  private def edgesOf(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val df = pairs.toDF("src", "dst")
    df.unionAll(df.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("path graph matches the scalar recurrence exactly") {
    // undirected path 1 - 2 - 3: deg(1)=1, deg(2)=2, deg(3)=1
    val got = PageRank(edgesOf((1L, 2L), (2L, 3L)), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same recurrence in plain scala doubles (same op order per node)
    var r = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 10) {
      val w1 = r(1L) / 1; val w2 = r(2L) / 2; val w3 = r(3L) / 1
      r = Map(
        1L -> (0.15 + 0.85 * w2),
        2L -> (0.15 + 0.85 * (w1 + w3)),
        3L -> (0.15 + 0.85 * w2))
    }
    assert(got.keySet == r.keySet)
    // decimal-summed contributions round once per iteration; allow ulps
    r.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12,
      s"node $k: got ${got(k)}, want $v") }
    // the ends are symmetric, the middle dominates
    assert(got(1L) == got(3L) && got(2L) > got(1L))
  }

  test("rank mass is conserved (no dangling nodes on symmetrized input)") {
    val edges = edgesOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val total = PageRank(edges, iterations = 5)
      .agg(sum(col("rank"))).collect()(0).getDouble(0)
    assert(math.abs(total - 4.0) < 1e-9, s"mass $total != node count 4")
  }

  test("reliable checkpoint mode: bit-identical ranks, no leaked snapshots") {
    import graft.operators.{Ckpt, CkptMode}
    val edges = edgesOf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (2L, 4L))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.orderBy(col("id")).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val local = rows(PageRank(edges, iterations = 7, ckEvery = 3))
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-pr-ck").toString)
    val rel = PageRank(edges, iterations = 7, ckEvery = 3, ckpt = CkptMode.Reliable)
    assert(rows(rel) == local,
      "reliable snapshots must be bit-identical to local ones")
    // the loop released every superseded snapshot (edge tables, interim
    // rank vectors); only the returned frame's snapshot remains —
    // release it and the checkpoint dir must be empty of rdd-* dirs
    Ckpt.release(rel, CkptMode.Reliable)
    val root = new java.io.File(spark.sparkContext.getCheckpointDir.get)
    val leaked = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("rdd-"))
    assert(leaked.isEmpty, s"leaked checkpoint dirs: ${leaked.mkString(", ")}")
  }

  test("bit-identical ranks across partitionings") {
    import spark.implicits._
    val pairs = (1L to 40L).flatMap(i => Seq((i, i % 7 + 100L), (i, i % 5 + 200L)))
    val df = pairs.toDF("src", "dst")
    val sym = df.unionAll(df.select(col("dst").as("src"), col("src").as("dst")))
    def run(parts: Int): Seq[(Long, Double)] =
      PageRank(sym.repartition(parts), iterations = 6)
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(3) == run(13), "ranks must not depend on partitioning")
  }
}
