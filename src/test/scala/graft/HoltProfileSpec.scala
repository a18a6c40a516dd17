package graft

import org.apache.spark.sql.functions._

/** Round-12b statistical operators: q_events_holt (level+trend
  * smoothing) against a driver-side sequential reference fold —
  * bit-equality, since both execute the same IEEE double expression
  * chain in the same order — and invariant checks for
  * q_profile_summary / q_anon_kanon / q_text_collocations (their
  * value-level correctness is the DuckDB oracle's job). */
class HoltProfileSpec extends SparkSuite {

  test("q_events_holt matches a sequential per-user reference fold bit-for-bit") {
    val out = SparkEntry.queries("q_events_holt")(spark, Sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap

    // independent reference: read the fixture directly, sort each
    // user's values by (ts-micros, event_id, value), fold sequentially
    val rows = graft.Tables.events(spark, Sf)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
    val ref = rows.groupBy(_._1).map { case (uid, g) =>
      val vals = g.map(_._2).sortBy(identity).map(_._3)
      var l = vals.head
      var t = 0.0
      vals.tail.foreach { x =>
        val l2 = 0.2 * x + 0.8 * (l + t)
        val t2 = 0.3 * (0.2 * x + 0.8 * (l + t) - l) + 0.7 * t
        l = l2; t = t2
      }
      uid -> ((l, t, l + t))
    }
    assert(out.keySet === ref.keySet)
    ref.foreach { case (uid, (l, t, f)) =>
      val (ol, ot, of) = out(uid)
      assert(ol === l && ot === t && of === f,
        s"user $uid: spark ($ol,$ot,$of) != ref ($l,$t,$f)")
    }
  }

  test("q_events_holt: a single-event user has level=x, trend=0") {
    // guaranteed by the first-element-init fold; probe the registry
    // output for consistency instead of assuming the fixture has one
    val out = SparkEntry.queries("q_events_holt")(spark, Sf)
      .filter(col("n_events") === 1).collect()
    out.foreach { r =>
      assert(r.getDouble(3) === 0.0 && r.getDouble(2) === r.getDouble(4))
    }
  }

  test("q_profile_summary: one row per profiled column, stats consistent") {
    val out = SparkEntry.queries("q_profile_summary")(spark, Sf).collect()
    assert(out.map(_.getString(0)).sorted.toSeq ===
      Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    val n = graft.Tables.orders(spark, Sf).count()
    out.foreach { r =>
      assert(r.getLong(1) === n)           // n
      assert(r.getLong(2) <= n)            // n_nonnull
      assert(r.getLong(3) <= r.getLong(2)) // n_distinct <= n_nonnull
    }
    val status = out.find(_.getString(0) == "o_orderstatus").get
    assert(status.getString(4) <= status.getString(5)) // min_v <= max_v
  }

  test("q_anon_kanon: risk counts are internally consistent") {
    val out = SparkEntry.queries("q_anon_kanon")(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (groups, small, atRisk, minK) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(small <= groups)
      assert(atRisk <= 4 * small) // each small group holds < 5 rows
      assert(atRisk >= small)     // ... and at least 1
      assert(minK >= 1)
      assert((small == 0) === (minK >= 5))
    }
  }

  test("q_text_collocations: floor, ordering, and bounded output") {
    val out = SparkEntry.queries("q_text_collocations")(spark, Sf).collect()
    assert(out.nonEmpty && out.length <= 15)
    assert(out.forall(_.getLong(2) >= 20), "support floor violated")
    val lifts = out.map(_.getDouble(3)).toSeq
    assert(lifts === lifts.sorted.reverse, "not ordered by lift desc")
  }
}
