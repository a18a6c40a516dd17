package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Physical/optimized-plan assertions (SURVEY.md §4.2): the claims the
  * scaladoc makes about pushdown, join strategy, top-k, and
  * partition-safe windows must hold in the actual plans.
  */
class PlanSpec extends SparkSuite {

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  test("filters are pushed to the parquet scan") {
    val plan = executedPlan("q_filter_compound")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(!plan.contains("PushedFilters: []"), plan.take(2000))
  }

  test("projection prunes the scan schema") {
    val plan = executedPlan("q_project_compute")
    // Only the 4 referenced columns reach ReadSchema, not all 11.
    assert(plan.contains("l_extendedprice"), plan.take(2000))
    assert(!plan.contains("l_shipdate"), "unexpected column read\n" + plan.take(2000))
  }

  test("q_join_broadcast plans a broadcast hash join") {
    assert(executedPlan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_sortmerge honors the merge hint") {
    assert(executedPlan("q_join_sortmerge").contains("SortMergeJoin"))
  }

  test("q_join_theta stays a hash join with residual range filter") {
    val plan = executedPlan("q_join_theta")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q_topk_global plans TakeOrderedAndProject (no global sort)") {
    assert(executedPlan("q_topk_global").contains("TakeOrderedAndProject"))
  }

  test("partitioned window specs everywhere data-scale windows run") {
    // Every Window over table-sized input must carry a partitionSpec.
    // q_win_ntile is exempt BY DESIGN: its GlobalRank offsets window
    // ranges over one row per shuffle partition (metadata-scale).
    val dataScale = Seq("q_win_rank", "q_win_lag", "q_win_runsum",
      "q_win_range", "q_win_firstlast", "q_topk_group", "q_join_asof",
      "q_sim_join", "q_dedup_exact")
    val offenders = dataScale.filter { name =>
      val plan = SparkEntry.queries(name)(spark, Sf).queryExecution.optimizedPlan
      plan.collect { case w: Window if w.partitionSpec.isEmpty => w }.nonEmpty
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: $offenders")
  }
}
