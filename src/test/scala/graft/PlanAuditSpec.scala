package graft

/** Anti-pattern sweep over EVERY registered query's physical plan:
  * nothing may plan a CartesianProduct, and nested-loop joins are only
  * allowed where they are the deliberate design (tiny cross products /
  * single-row broadcast probes). Guards against a future edit silently
  * turning a blocked join into an all-pairs scan. */
class PlanAuditSpec extends SparkSuite {

  // Deliberate nested-loop shapes: region×nation (125 rows), one-row
  // broadcast probes (q_sim_topk, q_sim_ann_ivf's probe + k-row
  // centroid table), and q_win_ntile's one-row broadcast of the global
  // count.
  private val nestedLoopAllowed =
    Set("q_join_cross", "q_sim_topk", "q_sim_ann_ivf", "q_win_ntile")

  test("no CartesianProduct anywhere; BNLJ only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, Sf).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopAllowed.contains(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
