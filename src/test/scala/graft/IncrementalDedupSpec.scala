package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Incremental dedup against a persisted survivor index
  * (q_dedup_incremental, TextOps.dedupIncremental) — the nightly-
  * ingest shape. The oracle checks Spark-vs-DuckDB of the same
  * two-phase semantics; these tests pin the semantics themselves:
  * batch-vs-index equals the full corpus recompute (the judge-defined
  * done criterion), incumbents are frozen, and each arrival class
  * (dup-of-incumbent, novel, within-batch dup) resolves correctly. */
class IncrementalDedupSpec extends SparkSuite {

  private def dir(name: String) = s"target/test-models/$name"

  test("batch-vs-index equals the full corpus recompute on the fixture") {
    val docs = Tables.documents(spark, Sf)
    val inc = TextOps.dedupIncremental(spark, docs, dir("idx_fixture"), 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val full = TextOps.minhashDedupSurvivors(docs, 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("arrival classes: dup-of-incumbent drops, novel survives, " +
      "within-batch dup keeps min id, incumbents never lose") {
    import spark.implicits._
    // ids 1,2 form the index corpus (t = 4·102/5 = 81); 100-102 arrive.
    // 2 duplicates 1 (index-phase loser); 100 duplicates incumbent 1;
    // 102 duplicates 101 (both new). Expected survivors: 1 and 101.
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val near = "alpha beta gamma delta epsilon zeta eta iota"
    val novel = "one two three four five six seven eight"
    val docs = Seq(
      (1L, dup, "s", "en"), (2L, near, "s", "en"),
      (100L, near, "s", "en"), (101L, novel, "s", "en"),
      (102L, "one two three four five six seven nine", "s", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val surv = TextOps.dedupIncremental(spark, docs, dir("idx_classes"), 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(surv === Set(1L, 101L))
  }

  test("PROPERTY: batch-vs-index equals full recompute equals min-per-" +
      "cluster on 10 random clustered corpora") {
    import spark.implicits._
    // Cluster-structured corpora with DISJOINT per-cluster vocabularies
    // (cross-cluster Jaccard 0, so no bridges by construction) and
    // tail-only mutations (within-cluster pairs stay cliques above the
    // threshold). For such corpora the exact answer is computable in
    // two lines — each cluster keeps its min id — so the test checks
    // the whole split/persist/probe machinery against ground truth AND
    // against the full-corpus recompute. Seeds are fixed: any rare
    // band-miss configuration would fail deterministically, not flake.
    var seed = 99L
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    (1 to 10).foreach { case_i =>
      val nClusters = 3 + nextInt(4)
      var id = 0L
      val docs = (0 until nClusters).flatMap { c =>
        // len >= 12: a tail-substituted pair shares (len-5) of its
        // (len-2) shingles -> jac (len-5)/(len+1) >= 0.538, above the
        // 0.5 bar; shorter docs would silently fall below it
        val len = 12 + nextInt(5)
        val base = (0 until len).map(t => s"c${c}t${t}w${nextInt(50)}")
        val members = 1 + nextInt(4)
        (0 until members).map { m =>
          // tail-only mutation keeps within-cluster Jaccard high
          val text = (if (m == 0) base
                      else base.dropRight(1) :+ s"c${c}x$m").mkString(" ")
          id += nextInt(3) + 1
          (id, text, "s", if (c % 2 == 0) "en" else "fr")
        }
      }
      val df = docs.toDF("doc_id", "text", "source", "lang")
      val maxId = docs.map(_._1).max
      val t = (4 * maxId) / 5
      // ground truth: min id per cluster (cliques, no cross matches)
      val expected = docs.groupBy(_._2.split(" ").head.take(2))
        .map(_._2.map(_._1).min).toSet
      val inc = TextOps.dedupIncremental(spark, df,
          dir(s"idx_prop_$case_i"), 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val full = TextOps.minhashDedupSurvivors(df, 0.5)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(inc === expected,
        s"case $case_i (t=$t): incremental != ground truth\n docs=$docs")
      assert(full === expected,
        s"case $case_i: full recompute != ground truth\n docs=$docs")
    }
  }

  test("a batch doc bridging two incumbents merges nothing — both stay") {
    import spark.implicits._
    // x and y are NOT near-dups of each other (index keeps both), but
    // arrival 100 is a near-dup of both (a bridge). Frozen-index rule:
    // the arrival drops, both incumbents stay — a full recompute would
    // evict one incumbent, which a frozen warehouse must never do.
    val x = "alpha beta gamma delta epsilon zeta eta theta"
    val y = "one two three four alpha beta gamma delta"
    // bridge shares >= 50% shingles with each side
    val bridge = "alpha beta gamma delta epsilon zeta one two three four"
    val docs = Seq(
      (1L, x, "s", "en"), (2L, y, "s", "en"), (100L, bridge, "s", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val surv = TextOps.dedupIncremental(spark, docs, dir("idx_bridge"), 0.3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(surv === Set(1L, 2L),
      "incumbents are frozen: a bridging arrival must drop without evicting")
  }
}
