package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeTrain, CkptMode}
import graft.queries.SimOps

/** [[graft.operators.CkptMode.Reliable]] parity for the remaining
  * iterative operators (PageRank and connectedComponents have their
  * reliable cases in PageRankSpec/ComponentsSpec): the durable
  * checkpoint path must be a pure storage-location change — every
  * result bit-identical to the default executor-resident mode. The
  * file round-trip exercises the exact recovery surface: what the
  * loop reads back after a truncation IS what an executor-loss
  * recovery would re-read. */
class ReliableCkptSpec extends SparkSuite {

  /** The shared session may or may not have a checkpoint dir from
    * another suite; point it at a fresh temp dir for these tests. */
  private def freshCkDir(): Unit =
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-rck").toString)

  test("BpeTrain merge table is bit-identical under reliable checkpoints") {
    import spark.implicits._
    freshCkDir()
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wide wider widest west the the",
      "the newest of the lowest").toDF("text")
    def run(mode: CkptMode): Seq[(Int, String, String, String)] =
      BpeTrain(docs, numMerges = 12, ckpt = mode)
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(run(CkptMode.Local) == run(CkptMode.Reliable))
  }

  test("kmeansRefine and pqTrain codebooks are bit-identical under reliable checkpoints") {
    import spark.implicits._
    freshCkDir()
    val rng = new scala.util.Random(7)
    val emb = Seq.tabulate(60)(i =>
        (i.toLong, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
      .localCheckpoint() // freeze the fixture so both runs read one copy
    val (seed, _) = SimOps.ivfAssign(emb, 4)
    def refine(mode: CkptMode): Seq[(Long, Seq[Float])] =
      SimOps.kmeansRefine(emb, seed, iters = 3, ckpt = mode)
        .orderBy(col("cell_id")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    assert(refine(CkptMode.Local) == refine(CkptMode.Reliable))
    def pq(mode: CkptMode): Seq[(Int, Long, Seq[Float])] =
      SimOps.pqTrain(emb, m = 2, k = 4, iters = 2, dim = 8,
          sampleOneIn = 1, ckpt = mode)
        .orderBy(col("seg"), col("cell_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2))).toSeq
    assert(pq(CkptMode.Local) == pq(CkptMode.Reliable))
  }
}
