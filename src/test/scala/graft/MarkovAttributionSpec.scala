package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.EventsAnalytics

/** [[EventsAnalytics.markovAttribution]] — hand-computed absorption
  * probabilities on a planted chain, truncation-at-first-conversion
  * semantics, and the registry report's invariants. */
class MarkovAttributionSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "sec", "event_type")
      .select(col("user_id"), col("event_id"),
        col("sec").cast("timestamp").as("ts"), col("event_type"))
  }

  test("planted chain: removal effects match the hand-computed " +
      "absorption probabilities") {
    // u1 view->purchase, u2 view->(null), u3 click->purchase:
    // base P = 1/3·1 + 2/3·(1/2) = 2/3; removing either channel
    // leaves P = 1/3, so both effects are 0.5 and credit splits evenly
    val events = ev(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"),
      (2L, 3L, 1L, "view"),
      (3L, 4L, 1L, "click"), (3L, 5L, 2L, "purchase"))
    val out = EventsAnalytics.markovAttribution(events, "purchase")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet === Set("view", "click"))
    out.values.foreach { case (base, _, _, _) =>
      assert(math.abs(base - 2.0 / 3.0) < 1e-12)
    }
    val (_, viewRemoved, viewEffect, viewShare) = out("view")
    assert(math.abs(viewRemoved - 1.0 / 3.0) < 1e-12)
    assert(math.abs(viewEffect - 0.5) < 1e-12)
    assert(math.abs(viewShare - 0.5) < 1e-12)
    val (_, _, clickEffect, clickShare) = out("click")
    assert(math.abs(clickEffect - 0.5) < 1e-12)
    assert(math.abs(clickShare - 0.5) < 1e-12)
  }

  test("truncation: events after the first conversion never count; a " +
      "dead-end channel earns zero credit") {
    // u1 converts at t2, then wanders to 'promo' — which must NOT
    // become a channel; u2's 'promo' path never converts
    val events = ev(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "purchase"), (1L, 3L, 3L, "promo"),
      (2L, 4L, 1L, "promo"),
      (3L, 5L, 1L, "view"), (3L, 6L, 2L, "purchase"))
    val out = EventsAnalytics.markovAttribution(events, "purchase")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set("view", "promo"))
    assert(out("promo") === ((0.0, 0.0)), "dead-end channel earned credit")
    assert(out("view")._1 > 0.99, "sole converting channel carries it all")
    assert(math.abs(out("view")._2 - 1.0) < 1e-12)
  }

  test("registry report: one base probability, effects in [0,1], " +
      "credit shares sum to 1") {
    val rows = SparkEntry.queries("q_events_attribution_markov")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val bases = rows.map(_.getDouble(1)).distinct
    assert(bases.length === 1 && bases.head > 0.0 && bases.head <= 1.0)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(!Set("__START__", "__NULL__", "purchase")(r.getString(0)))
    }
    val shareSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9 || shareSum == 0.0)
  }
}
