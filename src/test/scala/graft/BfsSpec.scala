package graft

import org.apache.spark.sql.functions._

import graft.queries.Curation

/** [[Curation.bfsHops]] — frontier-expansion BFS: exact hop distances
  * on planted graphs (min-hop under multiple paths, hop cap,
  * disconnected components absent) plus registry sanity; full value
  * correctness is the DuckDB recursive-CTE oracle's job. */
class BfsSpec extends SparkSuite {

  private def hops(edges: Seq[(Long, Long)], cap: Int): Map[Long, Long] = {
    import spark.implicits._
    Curation.bfsHops(edges.toDF("p1", "p2"), cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("min-hop wins when a long and a short path reach the same node") {
    // 5-cycle: every node has degree 2, so the max-degree tiebreak
    // picks min id 1; nodes 3 and 4 are reachable in 2 hops through
    // either neighbor, never 3
    val got = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L)), 8)
    assert(got === Map(1L -> 0L, 2L -> 1L, 5L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("source is the max-degree node; hop cap bounds the reach; " +
      "disconnected components never appear") {
    // star source: 6 has degree 3, everything else <= 2
    val g = Seq((6L, 1L), (6L, 2L), (6L, 3L), (3L, 4L), (10L, 11L))
    val full = hops(g, 8)
    assert(full === Map(6L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    assert(!full.contains(10L) && !full.contains(11L),
      "the 10-11 component is unreachable from the source")
    val capped = hops(g, 1)
    assert(capped === Map(6L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("registry query: source at hop 0, hops contiguous from 0") {
    val got = SparkEntry.queries("q_graph_bfs")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty)
    val byHop = got.map(_._2).groupBy(identity).view.mapValues(_.length)
    val maxHop = got.map(_._2).max
    assert(byHop(0L) === 1, "exactly one source at hop 0")
    (0L to maxHop).foreach(h =>
      assert(byHop.getOrElse(h, 0) > 0, s"hop $h empty but $maxHop reached"))
    assert(got.map(_._1).distinct.length === got.length, "duplicate nodes")
  }
}
