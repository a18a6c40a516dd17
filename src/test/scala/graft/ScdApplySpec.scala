package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.ScdApply

/** Type-2 MERGE semantics (operators.ScdApply, round-12 VERDICT gap):
  * closing the open interval, inserting the new version, no-op'ing
  * value-equal deltas, inserting brand-new keys, preserving historical
  * intervals verbatim, and idempotence under batch replay. The
  * registry query q_scd2_apply runs the same operator against the
  * events-derived dimension with a DuckDB oracle; this suite pins the
  * operator's contract on a hand-built history where every case is
  * visible. */
class ScdApplySpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Base SCD2 table with a deliberate GAP for key 1 (history rows
    * must survive verbatim — no lead() recompute may "repair" it). */
  private def base() = {
    import spark.implicits._
    Seq(
      // key 1: two closed versions with a gap, one open
      (1L, 10.0, ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00"))),
      (1L, 11.0, ts("2024-03-01 00:00:00"), Some(ts("2024-04-01 00:00:00"))),
      (1L, 12.0, ts("2024-04-01 00:00:00"), None),
      // key 2: single open version
      (2L, 20.0, ts("2024-01-15 00:00:00"), None),
      // key 3: single open version (will be a no-op delta)
      (3L, 30.0, ts("2024-01-20 00:00:00"), None))
      .toDF("k", "v", "eff_from", "eff_to")
  }

  private def delta() = {
    import spark.implicits._
    Seq(
      (1L, 99.0, ts("2024-06-01 00:00:00")),  // change
      (3L, 30.0, ts("2024-06-01 00:00:00")),  // value-equal no-op
      (7L, 70.0, ts("2024-06-01 00:00:00")))  // brand-new key
      .toDF("k", "v", "eff_from")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "eff_from", "eff_to")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
      .toSet

  test("apply closes, inserts, no-ops and preserves history verbatim") {
    val out = ScdApply(base(), delta(), "k", "v", "eff_from", "eff_to")
    val got = rows(out)
    val expected = Set(
      // key 1 history untouched (gap intact), open version closed at
      // the delta ts, new open version inserted
      (1L, 10.0, ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00"))),
      (1L, 11.0, ts("2024-03-01 00:00:00"), Some(ts("2024-04-01 00:00:00"))),
      (1L, 12.0, ts("2024-04-01 00:00:00"), Some(ts("2024-06-01 00:00:00"))),
      (1L, 99.0, ts("2024-06-01 00:00:00"), None),
      // key 2 untouched (no delta row)
      (2L, 20.0, ts("2024-01-15 00:00:00"), None),
      // key 3 untouched (value-equal no-op)
      (3L, 30.0, ts("2024-01-20 00:00:00"), None),
      // key 7 inserted open
      (7L, 70.0, ts("2024-06-01 00:00:00"), None))
    assert(got === expected)
    // exactly one open version per present key
    val opens = out.filter(col("eff_to").isNull)
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(opens.forall(_._2 == 1L), s"multiple open versions: ${opens.toSeq}")
  }

  test("apply is idempotent under batch replay (at-least-once ingest)") {
    val once = ScdApply(base(), delta(), "k", "v", "eff_from", "eff_to")
      .localCheckpoint()
    val twice = ScdApply(once, delta(), "k", "v", "eff_from", "eff_to")
    assert(rows(twice) === rows(once),
      "replaying the same batch changed the dimension")
  }
}
