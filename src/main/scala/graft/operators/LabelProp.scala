package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation community detection (Raghavan et al.
  * 2007), deterministic variant: every node starts labeled with its
  * own id; each round it adopts the MODE of its neighbors' labels PLUS
  * its own (ties → smallest label), all nodes updating simultaneously
  * from the previous round's labels. The self-vote damps the
  * synchronous-update oscillation a bare neighbor vote exhibits on
  * bipartite-ish structures (a 2-node edge would swap labels forever).
  * Unlike connected components (min-label convergence — one label
  * floods each connected region), frequency voting lets DENSE regions
  * keep their own label across a sparse bridge, so two cliques joined
  * by one edge settle into two communities (LabelPropSpec plants
  * exactly that, and shows components merging the same graph).
  *
  * Scale: per round, one edge⋈labels equi-join (edge-sized), a
  * (node, label) count aggregate with map-side combine, and a per-node
  * argmax window whose partitions are each node's DISTINCT NEIGHBOR
  * LABEL set (degree-bounded, shrinking as communities form — never
  * graph-sized). Rounds chain lazily; `rounds` is a small fixed
  * constant (labelprop is known to stabilize in a few sweeps), so plan
  * depth is bounded and Ckpt-style truncation is unnecessary.
  */
object LabelProp {

  /** @param edges undirected edge list, one row per edge in either
    *              orientation (first two columns = endpoints);
    *              self-loops ignored
    * @return (node, label) — community label per node after `rounds`
    *         synchronous sweeps */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    val sym = edges.toDF("a", "b").filter(col("a") =!= col("b"))
    val und = sym.unionAll(sym.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val nodes = und.select(col("a").as("node")).distinct()
    // each node also "hears" itself — the oscillation damper
    val voteEdges = und.unionAll(
      nodes.select(col("node").as("a"), col("node").as("b")))
    var labels = nodes.select(col("node"), col("node").as("label"))
    var r = 0
    while (r < rounds) {
      val votes = voteEdges
        .join(labels.select(col("node").as("b2"), col("label")),
          col("b") === col("b2"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("a"))
        .orderBy(col("n").desc, col("label").asc)
      labels = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("a").as("node"), col("label"))
      r += 1
    }
    labels
  }
}
