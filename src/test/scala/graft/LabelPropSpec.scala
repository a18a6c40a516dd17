package graft

import org.apache.spark.sql.functions._

import graft.operators.LabelProp

/** [[LabelProp]] on planted graphs: the two-cliques-one-bridge
  * separation that distinguishes frequency voting from connected
  * components, determinism, and boundary cases. */
class LabelPropSpec extends SparkSuite {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  /** K5 on nodes [base, base+4]. */
  private def clique(base: Long): Seq[(Long, Long)] =
    (for { i <- 0 until 5; j <- i + 1 until 5 }
      yield (base + i, base + j))

  test("two cliques joined by one bridge settle into TWO communities") {
    val g = edges(clique(0L) ++ clique(100L) :+ (4L -> 100L): _*)
    val labels = LabelProp.run(g, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (0L to 4L).map(labels)
    val right = (100L to 104L).map(labels)
    assert(left.distinct.size === 1, s"left clique split: $left")
    assert(right.distinct.size === 1, s"right clique split: $right")
    assert(left.head !== right.head,
      "bridge flooded both cliques into one community " +
        "(that is components semantics, not label propagation)")
    // components on the same graph WOULD merge them — the contrast
    val comp = graft.queries.TextOps.connectedComponents(
      g.toDF("d1", "d2")).select(col("comp")).distinct().count()
    assert(comp === 1L)
  }

  test("a single clique converges to one community labeled by its min node") {
    val labels = LabelProp.run(edges(clique(10L): _*), rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet === Set(10L))
  }

  test("deterministic across input partitioning and edge order") {
    import spark.implicits._
    val es = clique(0L) ++ clique(100L) ++ clique(200L) ++
      Seq(4L -> 100L, 104L -> 200L)
    val a = LabelProp.run(es.toDF("a", "b").repartition(1), 5)
      .orderBy("node").collect()
    val b = LabelProp.run(es.reverse.toDF("a", "b").repartition(13), 5)
      .orderBy("node").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("self-loops are ignored; isolated edge pair is its own community") {
    val labels = LabelProp.run(edges((1L, 1L), (2L, 3L)), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(2L -> 2L, 3L -> 2L))
  }

  test("registry query: bounded output, community sizes positive") {
    val out = SparkEntry.queries("q_graph_labelprop")(spark, Sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getLong(1) >= 1))
  }
}
