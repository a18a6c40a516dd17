package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Damped PageRank over an edge list, bit-deterministic at any
  * partitioning: per-iteration contributions are cast to
  * DECIMAL(38,18) BEFORE the destination sum (order-independent
  * merge — a double sum here drifts with partition order, against the
  * repo's determinism rules), closed back to double once per
  * iteration.
  *
  * 100 TB design: each of the k fixed rounds is one equi-join
  * (edges ⋈ ranks on src) plus one dst-keyed aggregate — the sparse
  * mat-vec product, all shuffles on graph keys, nothing collected to
  * the driver. Rank state is localCheckpoint'ed every round so lineage
  * (and analysis time) stays flat, the same discipline as
  * [[graft.queries.TextOps.connectedComponents]].
  *
  * Dangling mass: callers pass an UNDIRECTED (symmetrized) edge list;
  * every node then has out-degree >= 1, so no teleport-correction pass
  * over dangling nodes is needed. With no dangling mass the total rank
  * equals the node count at every iteration (asserted in
  * PageRankSpec).
  *
  * Reproduces the link-centrality analytics the reference's warehouse
  * users run downstream of export
  * (/root/reference/Unity_to_BigQuery.py:129-137 ships raw tables; the
  * graph rollup is the BI layer's job — here it is a first-class
  * operator).
  */
object PageRank {

  private val D = DecimalType(38, 18)

  /** @param edges undirected edge list with long columns (src, dst) —
    *              both orientations present for every edge
    * @return (id, rank) with sum(rank) == distinct node count */
  def apply(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = deg.select(col("id"), lit(1.0).as("rank")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val weighted = ranks.join(deg, "id")
        .select(col("id").as("w_src"),
          (col("rank") / col("deg")).cast(D).as("w"))
      ranks = edges.join(weighted, col("src") === col("w_src"))
        .groupBy(col("dst").as("id"))
        .agg((lit(1.0 - damping) +
          lit(damping) * sum(col("w")).cast("double")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
