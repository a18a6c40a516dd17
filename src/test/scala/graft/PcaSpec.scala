package graft

import org.apache.spark.sql.functions._

import graft.models.Pca

/** Contract of the PCA embedding-compression model (models.Pca, round
  * 12). Declared no-oracle (iterative eigensolver), so this suite
  * carries the correctness weight: orthonormal components, descending
  * nonnegative eigenvalues whose total matches the covariance trace,
  * bit-determinism across partitionings, recovery of a planted
  * low-rank structure, and persisted-model parity. */
class PcaSpec extends SparkSuite {

  private val Dim = 64

  test("components are orthonormal; eigenvalues descend, are " +
      "nonnegative, and sum to at most the trace") {
    val emb = Tables.embeddings(spark, Sf)
    val m = Pca.fit(emb, "embedding", Dim, k = 8)
    assert(m.components.length === 8)
    for (a <- 0 until 8; b <- a until 8) {
      val d = (0 until Dim).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<v$a, v$b> = $d, want $want")
    }
    assert(m.eigenvalues.toSeq.sliding(2).forall(p => p.head >= p.last),
      s"eigenvalues not descending: ${m.eigenvalues.toSeq}")
    assert(m.eigenvalues.forall(_ >= -1e-12),
      s"negative eigenvalue: ${m.eigenvalues.toSeq}")
    // top-k mass cannot exceed the total variance (trace of C),
    // computed independently from per-coordinate variances
    val x = emb.select(col("embedding").cast("array<double>").as("x"))
    val n = x.count().toDouble
    val trace = x.select(posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg(sum(col("xi").cast("decimal(38,18)")).cast("double").as("s"),
        sum((col("xi") * col("xi")).cast("decimal(38,18)")).cast("double").as("s2"))
      .collect().map(r => r.getDouble(2) / n - math.pow(r.getDouble(1) / n, 2))
      .sum
    assert(m.eigenvalues.sum <= trace + 1e-9,
      s"top-8 mass ${m.eigenvalues.sum} exceeds trace $trace")
    assert(m.eigenvalues.sum > 0.05 * trace,
      "top-8 captures almost nothing — eigensolver suspect")
  }

  test("the fitted model is bit-identical across partitionings") {
    val emb = Tables.embeddings(spark, Sf)
    def fingerprint(df: org.apache.spark.sql.DataFrame) = {
      val m = Pca.fit(df, "embedding", Dim, k = 4)
      (m.mean.toSeq, m.eigenvalues.toSeq, m.components.map(_.toSeq).toSeq)
    }
    assert(fingerprint(emb) === fingerprint(emb.repartition(13)),
      "PCA model must not depend on partitioning (decimal moment sums)")
  }

  test("planted low-rank structure is recovered: 3 dominant directions") {
    import spark.implicits._
    // x = a*e0 + b*e1 + c*e2 + tiny noise: variance concentrates in a
    // known 3-d subspace; PCA must put ~all mass in its top 3
    def u(x: Long): Double = ((mix64(x) & 0x3ff).toDouble / 1024.0) - 0.5
    val rows = (0 until 800).map { i =>
      val (a, b, c) = (u(i * 7L + 1) * 3, u(i * 7L + 2) * 2, u(i * 7L + 3))
      val v = Array.tabulate(Dim) { d =>
        val signal = d match {
          case 0 => a
          case 1 => b
          case 2 => c
          case _ => 0.0
        }
        (signal + u(i * 131L + d) * 0.01).toFloat
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", Dim, k = 6)
    val top3 = m.eigenvalues.take(3).sum
    val rest = m.eigenvalues.drop(3).sum
    assert(top3 > 50 * rest,
      s"planted 3-d structure not recovered: top3 $top3 vs rest $rest")
    // each of the top-3 components aligns with a planted axis
    for (cIdx <- 0 until 3) {
      val comp = m.components(cIdx)
      val mass3 = comp.take(3).map(x => x * x).sum
      assert(mass3 > 0.99,
        s"component $cIdx leaks outside the planted subspace: $mass3")
    }
  }

  test("projection from the persisted model equals the in-session model") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR",
      "/root/repo/target/fixtures") + "/sf0.001/pca_roundtrip"
    val emb = Tables.embeddings(spark, Sf)
    val m = Pca.fit(emb, "embedding", Dim, k = 5)
    Pca.save(spark, m, dir)
    val back = Pca.load(spark, dir)
    assert(back.mean.toSeq === m.mean.toSeq)
    assert(back.eigenvalues.toSeq === m.eigenvalues.toSeq)
    assert(back.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq)
    val a = emb.select(Pca.projectExpr(col("embedding"), m).as("p"))
      .collect().map(_.getSeq[Double](0))
    val b = emb.select(Pca.projectExpr(col("embedding"), back).as("p"))
      .collect().map(_.getSeq[Double](0))
    assert(a.zip(b).forall { case (x, y) => x == y },
      "persisted model projects differently")
  }

  test("registry row: per-label rollup with positive top-k variance") {
    val r = SparkEntry.queries("q_embed_pca")(spark, Sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getDouble(4) > 0), "top-k variance not positive")
  }
}
