package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Serving-budget calibration sweep (round 18, VERDICT r17 next #3):
  * recall@5 over the nprobe × rerank grid on the 1× corpus index —
  * the committed evidence behind [[graft.operators.AnnBudget]]'s
  * constants. One index build (the AnnDrift day-0 shape: sf0.1
  * embeddings, 2,000 × 64-dim, cells = 16, m = 4), then one
  * [[graft.queries.SimOps.indexEval]] per grid point; the artifact
  * records every point plus the cheapest point meeting
  * [[graft.operators.AnnBudget.TargetRecall]] under a
  * served-volume cost proxy (nprobe/cells corpus read + rerank exact
  * scores per probe).
  *
  * Env: SPARK_GRAFT_SCALE_BASE, SPARK_GRAFT_CPUS.
  * Output: target/anncalib.json (also printed).
  */
object AnnCalib {

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)

    val oneDir = "target/scale/x1"
    ScaleBench.synthesize(spark, baseDir, oneDir, 1)
    val dim = 64; val topK = 5
    val emb = spark.read.parquet(s"$oneDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val probes = emb.filter(col("vec_id") % 37 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))

    // BUILD SHAPES sweep too (round 18): the first grid pass (m=4,
    // cells=16) showed even nprobe=ALL + rerank=0.4n topping out at
    // 0.88 recall — the 4-segment PQ's approximate ORDER was the
    // bottleneck, and no serving budget fixes a quantizer. m controls
    // ADC fidelity (segments × 16 centroids); cells controls the IVF
    // pruning granularity (≈√n is the standard shape).
    val shapes = Seq((4, 16), (8, 16), (8, 45), (16, 45))
    val npShares = Seq(0.25, 0.5, 0.75, 1.0)
    val reranks = Seq(100, 200, 400, 800)
    val rows = for {
      (m, cells) <- shapes
      dir = s"target/scale/ann_calib_m${m}_c$cells"
      _ = graft.queries.SimOps.saveAnnIndex(emb, dir, m, cells, dim)
      nps <- npShares
      np = math.max(1, math.ceil(cells * nps).toInt)
      rr <- reranks
    } yield {
      val r = graft.queries.SimOps.indexEval(spark, dir, probes, m, dim,
        np, rr, topK).collect()(0)
      val recall = r.getAs[Double]("recall_at_k")
      val below = r.getAs[Long]("n_probes_below_half")
      // served-volume proxy per probe: candidate codes read + exact
      // re-rank rows (both in corpus-row units)
      val cost = n.toDouble * np / cells + rr
      println(f"[anncalib] m=$m%2d cells=$cells%2d nprobe=$np%2d " +
        f"rerank=$rr%4d recall@$topK=$recall%.4f below_half=$below " +
        f"cost=$cost%.0f")
      (m, cells, np, rr, recall, below, cost)
    }
    val target = graft.operators.AnnBudget.TargetRecall
    val best = rows.filter(_._5 >= target).sortBy(_._7).headOption
    val grid = rows.map { case (m, cells, np, rr, rec, bl, c) =>
      f"""{"m":$m,"cells":$cells,"nprobe":$np,"rerank":$rr,""" +
        f""""recall_at_k":$rec%.6f,"n_probes_below_half":$bl,""" +
        f""""cost_proxy":$c%.1f}"""
    }.mkString("[", ",", "]")
    val bestJson = best.map { case (m, cells, np, rr, rec, _, c) =>
      f"""{"m":$m,"cells":$cells,"nprobe":$np,"rerank":$rr,""" +
        f""""recall_at_k":$rec%.6f,"cost_proxy":$c%.1f,""" +
        f""""nprobe_share":${np.toDouble / cells}%.4f,""" +
        f""""rerank_share":${rr.toDouble / n}%.4f}"""
    }.getOrElse("null")
    val doc = s"""{"base":"$baseDir","n":$n,""" +
      s""""dim":$dim,"topk":$topK,"target_recall":$target,""" +
      s""""grid":$grid,"cheapest_meeting_target":$bestJson}"""
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/anncalib.json"),
      doc.getBytes(StandardCharsets.UTF_8))
    println(doc)
    spark.stop()
  }
}
