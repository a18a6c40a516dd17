package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the graded mains (Verify,
  * Bench, ExplainTool) and the test harness — ONE place for the
  * session config so every entry point runs identically. Installs
  * [[graft.plans.GraftExtensions]], so a user-written HOF cosine is
  * rewritten to the codegen'd expression in the graded paths too, not
  * only where RuleSpec installs the rule by hand (EntrySpec asserts
  * the rewrite fires under exactly this config). */
object GraftSession {

  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** Local session sized by the SPARK_GRAFT_CPUS contract. */
  def local(cpus: String): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  // Round 20: an `enumFanout` session clone (newSession +
  // spark.sql.adaptive.coalescePartitions.enabled=false, scoped to
  // the three prefix-family pair listers) was built here as the third
  // candidate fix for the AQE input-byte-coalesced enumeration join
  // and REVERTED on a 5-run same-box A/B — no win on containment,
  // a loss on ngram (the coalescing pass is also what splits the hot
  // buckets; numbers recorded at the q_dedup_prefix registry entry
  // and in BASELINE.md). The session-clone SCOPING mechanism itself
  // is sound (builder-level configs are inherited; EntrySpec's
  // rewrite contract holds in a clone) — reach for it if a future
  // per-query conf change measures a real win.
}
