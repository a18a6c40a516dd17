package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
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
    // materialize the edge list ONCE: the caller's upstream (joins,
    // distinct, symmetrize) must not re-execute inside every
    // iteration — without this the k rounds each replay the full edge
    // derivation (measured at sf0.1)
    val e = edges.localCheckpoint()
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // Attach the out-degree to each edge ONCE and pre-partition by the
    // join key: per round, the big side then joins exchange-free (its
    // hash partitioning survives localCheckpoint) and only the
    // node-count-sized rank vector shuffles. rank/deg divides with the
    // SAME operands as a node-side division would, so the per-edge
    // decimal contribution — and every rank — is bit-identical to the
    // two-join formulation; the shuffle_hash hint keeps the probe
    // sort-free (never broadcast: ranks grows with the graph).
    val eD = e.join(deg, col("src") === col("id"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .localCheckpoint()
    var ranks = deg.select(col("id"), lit(1.0).as("rank")).localCheckpoint()
    // eD/ranks now hold everything the iterations read; the raw edge and
    // degree checkpoints are dead weight in the block manager — at scale
    // each is edge-/node-count-sized. Same discipline per round below:
    // localCheckpoint is eager, so once the new state is materialized the
    // superseded round's blocks are unreachable and must be released.
    Bridge.unpersistCheckpoint(e)
    Bridge.unpersistCheckpoint(deg)
    for (_ <- 1 to iterations) {
      val prev = ranks
      ranks = eD.join(ranks.hint("shuffle_hash"), col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("deg")).cast(D).as("w"))
        .groupBy(col("dst").as("id"))
        .agg((lit(1.0 - damping) +
          lit(damping) * sum(col("w")).cast("double")).as("rank"))
        .localCheckpoint()
      Bridge.unpersistCheckpoint(prev)
    }
    Bridge.unpersistCheckpoint(eD)
    ranks
  }
}
