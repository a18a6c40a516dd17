package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Line-level exact dedup (q_dedup_lines, TextOps.lineDedup) — the
  * production newline semantics the fixture can't exercise (its docs
  * are newline-free): docs with real newlines split on them, the rest
  * re-line into fixed token chunks, and both kinds dedup in the same
  * keyed space with keep-first by (doc_id, position). */
class LineDedupSpec extends SparkSuite {

  test("mixed corpus: newline docs split on \\n, others re-line; " +
      "keep-first is global across both") {
    import spark.implicits._
    val docs = Seq(
      (1L, "header line\nbody one\nbody two"),
      (2L, "header line\nbody three"),
      (3L, "a b c d e f g h i j"),
      (4L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs, chunkTokens = 8).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1: all three lines first occurrences, rebuilt with \n
    assert(got(1L) === (("header line\nbody one\nbody two", 3L)))
    // doc 2: shares "header line" with doc 1 — only its own body stays
    assert(got(2L) === (("body three", 1L)))
    // doc 3: newline-free → 8-token chunks, rebuilt with spaces
    assert(got(3L) === (("a b c d e f g h i j", 2L)))
    // doc 4 duplicates doc 3 chunk-for-chunk → vanishes entirely
    assert(!got.contains(4L))
  }

  test("chunk width is a real parameter") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val n4 = TextOps.lineDedup(docs, chunkTokens = 4).collect().head.getLong(2)
    val n2 = TextOps.lineDedup(docs, chunkTokens = 2).collect().head.getLong(2)
    assert(n4 === 2L) // "a b c d" + "e f g h"
    assert(n2 === 4L)
  }

  test("a doc whose every line occurred earlier vanishes — including " +
      "across separator styles") {
    import spark.implicits._
    // doc 2's newline lines equal doc 1's chunk lines exactly: the
    // key space is shared, so doc 2 fully dedups away
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d\ne f g h")
    ).toDF("doc_id", "text")
    val got = TextOps.lineDedup(docs, chunkTokens = 4).collect()
      .map(r => r.getLong(0)).toSet
    assert(got === Set(1L))
  }
}
