package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** [[TextOps.repeatedWindows]] (exact-substring dedup at k-token
  * window granularity) on planted corpora: the window count formula,
  * detection of a shared run, locality (a shared run of length L
  * marks exactly L−k+1 windows), and the all-unique null case. */
class SubstringDedupSpec extends SparkSuite {

  private val K = 4

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("per-doc window count is len - k + 1; short docs drop out") {
    val out = TextOps.repeatedWindows(docs(
      (1L, "a b c d e f"),         // 6 tokens -> 3 windows of 4
      (2L, "a b c"),               // 3 tokens -> below k, absent
      (3L, "p q r s")), K)         // exactly k -> 1 window
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 3L -> 1L))
  }

  test("a shared k-run is flagged in BOTH docs; unique docs score zero") {
    val shared = "w x y z" // the 4-token run planted in docs 1 and 2
    val out = TextOps.repeatedWindows(docs(
      (1L, s"a b $shared c d"),
      (2L, s"e f g $shared"),
      (3L, "m n o p q r s t")), K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    val byDoc = out.map(t => t._1 -> t._3).toMap
    assert(byDoc(1L) === 1L && byDoc(2L) === 1L,
      s"shared run not flagged once per doc: $out")
    assert(byDoc(3L) === 0L)
  }

  test("a shared run of length L marks exactly L - k + 1 windows per doc") {
    val run = "r1 r2 r3 r4 r5 r6" // L=6 -> 3 repeated windows of k=4
    val out = TextOps.repeatedWindows(docs(
      (1L, s"a b $run"),
      (2L, s"$run c d")), K)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L))
  }

  test("repeats WITHIN one doc only do not count (cross-doc containment)") {
    val out = TextOps.repeatedWindows(docs(
      (1L, "a b c d x a b c d"), // "a b c d" twice, same doc
      (2L, "p q r s t u v w")), K)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }

  test("removal: exactly the covered positions vanish; short docs and " +
      "within-doc repeats pass through untouched") {
    val shared = "w x y z" // planted cross-doc 4-token run
    val out = TextOps.removeRepeatedWindows(docs(
      (1L, s"a b $shared c d"),
      (2L, s"e f g $shared"),
      (3L, "a b c"),                 // below k: no windows, untouched
      (4L, "p q r s t p q r s t")), // within-doc repeat only: untouched
      K)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) === ((8L, 4L, "a b c d")))
    assert(out(2L) === ((7L, 4L, "e f g")))
    assert(out(3L) === ((3L, 0L, "a b c")))
    assert(out(4L) === ((10L, 0L, "p q r s t p q r s t")))
  }

  test("removal: overlapping repeated windows delete the union of " +
      "their spans, and a fully-repeated doc empties") {
    val run = "r1 r2 r3 r4 r5" // L=5 shared run -> 2 overlapping windows
    val out = TextOps.removeRepeatedWindows(docs(
      (1L, s"a $run b"),
      (2L, run)), K)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) === ((7L, 5L, "a b")), "union of overlapping spans")
    assert(out(2L) === ((5L, 5L, "")), "fully-repeated doc must empty")
  }

  test("removal conserves tokens: n_tokens - n_removed = cleaned length " +
      "on the fixture, and removal only ever shrinks") {
    val out = SparkEntry.queries("q_dedup_substring_clean")(spark, Sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, rm, cleaned) = (r.getLong(1), r.getLong(2), r.getString(3))
      val keptLen = if (cleaned.isEmpty) 0 else cleaned.split(" ").length
      assert(n - rm === keptLen.toLong, s"doc ${r.getLong(0)} conservation")
      assert(rm >= 0 && rm <= n)
    }
  }

  test("registry query returns sane ratios on the fixture") {
    val out = SparkEntry.queries("q_dedup_substring")(spark, Sf)
    val bad = out.filter(col("n_repeated") > col("n_windows") ||
      col("repeat_ratio") < 0 || col("repeat_ratio") > 1).count()
    assert(bad === 0)
    assert(out.count() > 0)
  }
}
