package graft

import graft.operators.Triangles

/** Known-graph coverage for the distributed triangle enumeration. */
class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("p1", "p2")

  test("K4 has four triangles, every vertex in three") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(Triangles.enumerate(k4).count() === 4)
    val counts = Triangles.perNode(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a 4-cycle has no triangles") {
    val c4 = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(Triangles.enumerate(c4).count() === 0)
  }

  test("pendant edges do not join triangles and their vertices are absent") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L))
    val counts = Triangles.perNode(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge count both incident vertices twice") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val counts = Triangles.perNode(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}
