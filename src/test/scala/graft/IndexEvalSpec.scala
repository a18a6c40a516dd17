package graft

import org.apache.spark.sql.functions._

import graft.queries.SimOps

/** [[SimOps.indexEval]] — the recall-drift report that triggers ANN
  * index retrains (round-13, VERDICT r12 item 7): report shape, a
  * recall floor on the fixture, and the degenerate exactness bound
  * (probe every cell + corpus-size rerank ⇒ the served answer IS
  * brute force, so measured recall must be exactly 1 — the same bound
  * SimilaritySpec proves for the search path itself). */
class IndexEvalSpec extends SparkSuite {

  private val m = 4; private val k = 16; private val dim = 64

  test("registry report: one row, sane bounds, fixture recall floor") {
    val rows = SparkEntry.queries("q_sim_index_eval")(spark, Sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val nProbes = r.getLong(0)
    val recall = r.getDouble(1)
    val minRecall = r.getDouble(2)
    assert(nProbes > 0)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(minRecall >= 0.0 && minRecall <= recall + 1e-12,
      "min recall cannot exceed the mean")
    assert(r.getLong(3) <= nProbes)
    // round 18: the registry report serves the calibrated AnnBudget
    // policy, so its recall row IS the policy's compliance check —
    // the floor is the declared target, not the old 0.2 family floor
    // (which the uncalibrated nprobe-4/rerank-50 literals barely beat)
    assert(recall >= graft.operators.AnnBudget.TargetRecall,
      s"fixture recall@5 $recall below the AnnBudget target")
  }

  test("forIndex heals a stale meta.n: budgets from max(meta.n, " +
      "invlists count), so a crashed append refresh can only " +
      "OVER-budget (round-20 ADVICE)") {
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/repo/target/fixtures") + "/sf0.001/ann_stale_meta"
    // an append landed 2000 invlists rows but crashed before the meta
    // refresh: meta.n still reads the pre-append 100
    (0L until 2000L).map(i => (i, (i % 45).toInt))
      .toDF("vec_id", "cell_id")
      .write.mode("overwrite").parquet(s"$dir/invlists")
    Seq((100L, dim, 16, 45, 0.107))
      .toDF("n", "dim", "m", "cells", "margin")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val (np, rr) = graft.operators.AnnBudget.forIndex(spark, dir, topK = 5)
    assert(np === 34, "isotropic margin: nprobe = ceil(0.75 * 45)")
    // stale meta.n = 100 would floor rerank at 50 (recall starvation,
    // the unsafe direction); the healed budget serves the true corpus
    assert(rr === 100,
      s"rerank must budget the 2000-row invlists corpus (0.05*2000), got $rr")
  }

  test("exactness bound: nprobe = k with corpus-size rerank measures " +
      "recall exactly 1 for every probe") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/repo/target/fixtures") + "/sf0.001/ann_index_eval_exact"
    val emb = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"))
    SimOps.saveAnnIndex(emb, dir, m, k, dim)
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val n = emb.count().toInt
    val r = SimOps.indexEval(spark, dir, probes, m, dim,
      nprobe = k, rerank = n, topK = 5).collect().head
    assert(r.getDouble(1) === 1.0, s"mean recall ${r.getDouble(1)}")
    assert(r.getDouble(2) === 1.0, s"min recall ${r.getDouble(2)}")
    assert(r.getLong(3) === 0L)
  }
}
