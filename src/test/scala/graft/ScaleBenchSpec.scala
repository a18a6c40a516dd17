package graft

import java.io.File

import org.apache.spark.sql.functions._

/** [[ScaleBench]]'s corpus synthesis — the properties the measured
  * scaling curve (BASELINE.md round 14, tools/scalecurve_r14.json)
  * depends on, machine-guarded so the curve cannot silently measure
  * the wrong workload:
  *
  *   - volume scales exactly k× for every fact table, dimensions 1×;
  *   - keys stay unique across copies (the shifts never collide);
  *   - the per-copy content BIJECTION preserves within-copy structure
  *     (each copy contributes exactly the base corpus's true-pair
  *     volume) while cross-copy rows never alias — dup pairs scale
  *     k×, NOT k²·base the way verbatim duplication would, which
  *     would change the TRUE answer's growth rate and prove nothing
  *     about the plans.
  */
class ScaleBenchSpec extends SparkSuite {

  private val base = "/root/testdata/sf0.001"
  private val root = {
    val dir = new File("target/test-fixtures/scalebench")
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dir); dir.mkdirs()
    dir.getPath
  }
  private val k = 3

  private lazy val dirs: (String, String) = {
    val one = s"$root/x1"
    val kd = s"$root/x$k"
    ScaleBench.synthesize(spark, base, one, 1)
    ScaleBench.synthesize(spark, base, kd, k)
    (one, kd)
  }

  test("fact tables scale exactly kx with unique keys; dims stay 1x") {
    val (one, kd) = dirs
    val keyOf = Map(
      "customer" -> "c_custkey", "orders" -> "o_orderkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    for (t <- ScaleBench.ScaledTables) {
      val n1 = spark.read.parquet(s"$one/$t.parquet").count()
      val dk = spark.read.parquet(s"$kd/$t.parquet")
      assert(dk.count() === n1 * k, s"$t row count must scale $k x")
      keyOf.get(t).foreach { key =>
        assert(dk.select(key).distinct().count() === n1 * k,
          s"$t.$key must stay unique across copies")
      }
    }
    for (t <- ScaleBench.DimTables) {
      assert(spark.read.parquet(s"$kd/$t.parquet").count() ===
        spark.read.parquet(s"$one/$t.parquet").count(),
        s"dimension $t must not scale")
    }
  }

  test("the affine letter family is injective across copies: pairwise " +
      "distinct tables, agreement on at most one letter (round-15 " +
      "VERDICT #6 — the Caesar family aliased copy 26 onto copy 1)") {
    val tables = (1 to ScaleBench.MaxK - 1).map(ScaleBench.affineTable)
    assert(tables.distinct.size === tables.size,
      "two copies share a permutation table")
    // mod 26 is not a field: two affine maps agree where Δa·x ≡ Δb,
    // which has gcd(Δa, 26) ≤ 2 solutions for this family (Δa is even
    // and never a multiple of 13) — so aliasing would need a text
    // whose ENTIRE alphabet sits inside a ≤2-letter agreement set; no
    // fixture document is a one-or-two-distinct-letter text, and the
    // corpus-level disjointness is asserted directly below and by
    // ScaleVerify's exact k× dup counts
    for (i <- tables.indices; j <- (i + 1) until tables.size) {
      val agree = tables(i).zip(tables(j)).count { case (a, b) => a == b }
      assert(agree <= 2,
        s"copies ${i + 1} and ${j + 1} agree on $agree letters — any " +
          "text over that alphabet subset would alias across copies")
    }
    // no table is the identity (copy i must never equal copy 0)
    assert(!tables.contains("abcdefghijklmnopqrstuvwxyz"))
    // each table is a true permutation (bijective on the alphabet)
    tables.foreach(t => assert(t.sorted === "abcdefghijklmnopqrstuvwxyz"))
  }

  test("copy 26 no longer aliases copy 1: cross-copy texts stay disjoint " +
      "at the old Caesar period boundary") {
    val d = Tables.documents(spark, base).select(col("doc_id"), col("text"))
    def texts(i: Int) = ScaleBench.copyOf(d, "documents", i)
      .select(col("text")).collect().map(_.getString(0)).toSet
    val t1 = texts(1)
    val t26 = texts(26)
    assert(t1.intersect(t26).isEmpty,
      "copies 1 and 26 share texts — the bijection family has a period")
    assert(t1.intersect(texts(27)).isEmpty && texts(2).intersect(t26).isEmpty)
  }

  test("synthesize refuses k beyond the injective range") {
    val e = intercept[IllegalArgumentException] {
      ScaleBench.synthesize(spark, base, s"$root/x-overflow",
        ScaleBench.MaxK + 1)
    }
    assert(e.getMessage.contains("injective"))
  }

  test("x1 is the base fixture verbatim (copy 0 identity)") {
    val (one, _) = dirs
    val a = Tables.documents(spark, base).orderBy(col("doc_id")).collect()
    val b = Tables.documents(spark, one).orderBy(col("doc_id")).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("exact-dup structure scales kx: the true answer grows linearly, " +
      "never quadratically (cross-copy rows never alias)") {
    val (one, kd) = dirs
    // exact dedup: groups-of-identical-text
    def dupPairs(dir: String): Long =
      Tables.documents(spark, dir)
        .groupBy(col("text")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)
    assert(dupPairs(kd) === dupPairs(one) * k,
      "exact dup pairs must scale linearly — verbatim copies would square")
    // embedding EXACT matches likewise (rotation decorrelates copies)
    def vecDupes(dir: String): Long = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      e.count() - e.select(col("embedding")).distinct().count()
    }
    assert(vecDupes(kd) === vecDupes(one) * k,
      "embedding exact dupes must scale linearly")
    // ER blocking: candidate volume per incoming record must not grow
    // with k (names re-derive from shifted keys, so the normalized-
    // name key separates copies the way genuinely new records would)
    def erCandidates(dir: String): Long =
      SparkEntry.queries("q_er_blocking_eval")(spark, dir)
        .select(col("n_candidates")).collect()(0).getLong(0)
    val c1 = erCandidates(one)
    val ck = erCandidates(kd)
    assert(ck <= c1 * k * 2,
      s"ER candidates grew superlinearly: $c1 -> $ck at ${k}x " +
        "(blocking keys alias across copies)")
  }
}
