package graft

import org.apache.spark.sql.functions._

import graft.queries.Curation

/** [[Curation.kCore]] — iterative k-core peel: exact parity with a
  * driver-side brute-force peel on a planted graph and on the real
  * fixture graph, plus the two defining invariants (every survivor's
  * core degree ≥ k; the core is the MAXIMAL such subgraph — adding
  * any peeled node back would violate the floor). */
class KCoreSpec extends SparkSuite {

  /** Reference peel: repeatedly drop nodes with degree < k. */
  private def bruteCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val es2 = es.filter(e => keep(e._1) && keep(e._2))
      changed = es2.size != es.size
      es = es2
    }
    es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size }
  }

  test("planted graph: a 4-clique survives k=3, its tail chain peels " +
      "even though the chain touches the clique") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + chain 4-5-6 (5 and 6 can never reach
    // degree 3, and after they peel, 4 still has its 3 clique edges)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = Curation.kCore(edges.toDF("p1", "p2"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cascade: peeling one node can unravel an entire chain") {
    import spark.implicits._
    // path 1-2-3-4-5: at k=2 every interior node has degree 2 until
    // an endpoint peels — then the whole path unravels round by round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(Curation.kCore(edges.toDF("p1", "p2"), 2).count() === 0)
    // a 5-cycle at k=2 is stable (every node keeps exactly 2)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    val got = Curation.kCore(cyc.toDF("p1", "p2"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 5L).map(_ -> 2L).toMap)
  }

  test("registry query equals the brute-force peel on the fixture " +
      "co-purchase graph; floor and maximality hold") {
    import spark.implicits._
    val li = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val b = li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("p2"))
    val fixtureEdges = li.join(b,
        col("l_orderkey") === col("ok2") && col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = bruteCore(fixtureEdges, 3).view.mapValues(_.toLong).toMap
    val got = SparkEntry.queries("q_graph_kcore")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.forall(_ >= 3L), "core degree floor violated")
    // maximality: no peeled node retains >= k edges INTO the core
    val core = got.keySet
    val peeled = fixtureEdges.flatMap(e => Seq(e._1, e._2)).toSet -- core
    peeled.foreach { p =>
      val into = fixtureEdges.count(e =>
        (e._1 == p && core(e._2)) || (e._2 == p && core(e._1)))
      assert(into < 3, s"node $p peeled with $into core edges")
    }
  }
}
