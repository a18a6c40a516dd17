package graft

import org.apache.spark.sql.functions._

/** Round-12b batch 2: q_events_twa against an exact BigDecimal
  * reference, q_events_cusum against a sequential reference fold
  * (bit-equality — same IEEE op order), and q_sample_balanced's
  * heap-vs-window equivalence + determinism. */
class TwaCusumSpec extends SparkSuite {

  private def eventRows() =
    graft.Tables.events(spark, Sf)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))

  test("q_events_twa matches an exact integer-cents reference bit-for-bit") {
    val out = SparkEntry.queries("q_events_twa")(spark, Sf)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val ref = eventRows().groupBy(_._1).flatMap { case (uid, g) =>
      val evs = g.map(_._2).sortBy(t => (t._1, t._2, t._3))
      val ivs = evs.zip(evs.tail).map { case ((f, _, v), (t, _, _)) =>
        (math.round(v * 100.0), t - f) // value is 2-decimal: cents exact
      }
      if (ivs.isEmpty) None
      else {
        val num = ivs.map { case (c, d) => c * d }.sum
        val den = ivs.map(_._2).sum
        Some(uid -> ((num.toDouble / den.toDouble / 100.0, den)))
      }
    }
    assert(out.keySet === ref.keySet)
    ref.foreach { case (uid, (twa, tot)) =>
      val (oTwa, oTot) = out(uid)
      assert(oTot === tot, s"user $uid duration")
      assert(oTwa === twa, s"user $uid: $oTwa vs $twa")
    }
  }

  test("q_events_cusum matches a sequential reference fold bit-for-bit") {
    val out = SparkEntry.queries("q_events_cusum")(spark, Sf)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val ref = eventRows().groupBy(_._1).map { case (uid, g) =>
      val vals = g.map(_._2).sortBy(identity).map(_._3)
      var s = 0.0
      var alarms = 0L
      vals.foreach { x =>
        s = math.max(0.0, s + (x - 50.0 - 5.0))
        if (s > 50.0) alarms += 1
      }
      uid -> ((s, alarms))
    }
    assert(out.keySet === ref.keySet)
    ref.foreach { case (uid, (s, a)) =>
      val (os, oa) = out(uid)
      assert(os === s && oa === a, s"user $uid: ($os,$oa) != ($s,$a)")
    }
  }

  test("q_events_backtest matches a sequential walk-forward reference bit-for-bit") {
    val out = SparkEntry.queries("q_events_backtest")(spark, Sf)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    val ref = eventRows().groupBy(_._1).flatMap { case (uid, g) =>
      val vals = g.map(_._2).sortBy(identity).map(_._3)
      if (vals.length < 2) None
      else {
        var l = vals.head
        var t = 0.0
        var errSum = 0.0
        vals.tail.foreach { x =>
          errSum += math.abs(x - (l + t)) // forecast BEFORE the update
          val l2 = 0.2 * x + 0.8 * (l + t)
          val t2 = 0.3 * (0.2 * x + 0.8 * (l + t) - l) + 0.7 * t
          l = l2; t = t2
        }
        Some(uid -> ((errSum / (vals.length - 1), l + t)))
      }
    }
    assert(out.keySet === ref.keySet)
    ref.foreach { case (uid, (mae, fc)) =>
      val (oMae, oFc) = out(uid)
      assert(oMae === mae && oFc === fc, s"user $uid: ($oMae,$oFc) != ($mae,$fc)")
    }
  }

  test("q_events_concurrency matches a sequential sweep reference") {
    val out = SparkEntry.queries("q_events_concurrency")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val HourUs = 3600L * 1000000L
    val ref = eventRows().groupBy(_._1).map { case (uid, g) =>
      // boundaries (time, delta, event_id), departures before arrivals
      // at equal times (delta -1 < +1) — half-open [t, t+1h)
      val bounds = g.map(_._2).flatMap { case (us, eid, _) =>
        Seq((us, 1, eid), (us + HourUs, -1, eid))
      }.sortBy(b => (b._1, b._2, b._3))
      var open = 0
      var mx = 0
      bounds.foreach { b => open += b._2; mx = math.max(mx, open) }
      uid -> mx.toLong
    }
    assert(out === ref)
  }

  test("q_sample_balanced: heap selection == the window form, capped per class") {
    val docs = graft.Tables.documents(spark, Sf)
    val out = SparkEntry.queries("q_sample_balanced")(spark, Sf).collect()
    out.foreach(r => assert(r.getLong(1) <= 50))
    // window-form reference on the fixture (fine at test scale)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy((col("doc_id") * lit(2654435761L)) % lit(1000000007L),
        col("doc_id"))
    val ref = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("min_id"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang")).collect()
    assert(out.toSeq === ref.toSeq)
  }

  test("q_sample_balanced is deterministic across runs") {
    val a = SparkEntry.queries("q_sample_balanced")(spark, Sf).collect()
    val b = SparkEntry.queries("q_sample_balanced")(spark, Sf).collect()
    assert(a.toSeq === b.toSeq)
  }
}
