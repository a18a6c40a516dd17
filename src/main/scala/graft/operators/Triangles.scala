package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration over an ORIENTED edge list.
  *
  * Input: (p1, p2) with p1 < p2, distinct. Orientation makes each
  * triangle {a < b < c} appear exactly once as the two-hop path
  * e1 = (a,b), e2 = (b,c) closed by e3 = (a,c) — the standard
  * shuffle-join triangle algorithm: one equi-join on the middle vertex,
  * one on the closing pair. No broadcast hints (the edge list is an
  * unbounded aggregate upstream); AQE may broadcast at runtime if it
  * measures small. At 100 TB the degree-bounding knobs are upstream
  * (support thresholds) or a degree-based orientation (low-degree →
  * high-degree), which bounds per-vertex fan-out in e1⋈e2 by the max
  * out-degree — the numeric orientation used here is the id-ordered
  * special case.
  */
object Triangles {

  /** Each triangle once, as (x, y, z) with x < y < z. */
  def enumerate(edges: DataFrame): DataFrame =
    edges.as("e1")
      .join(edges.as("e2"), col("e1.p2") === col("e2.p1"))
      .join(edges.as("e3"),
        col("e1.p1") === col("e3.p1") && col("e2.p2") === col("e3.p2"))
      .select(col("e1.p1").as("x"), col("e1.p2").as("y"), col("e2.p2").as("z"))

  /** Per-vertex triangle participation counts (vertices in no triangle
    * are absent). */
  def perNode(edges: DataFrame): DataFrame =
    enumerate(edges)
      .select(explode(array(col("x"), col("y"), col("z"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_tri"))
}
