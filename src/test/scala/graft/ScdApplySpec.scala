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

  private type Row4 = (Long, Double, Timestamp, Option[Timestamp])

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

  test("NULL value transitions apply (null-safe no-op comparison) and " +
      "multi-row-per-key batches fail loudly") {
    import spark.implicits._
    val b = Seq(
      (1L, Some(10.0), ts("2024-01-01 00:00:00"), None: Option[Timestamp]),
      (2L, None: Option[Double], ts("2024-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("k", "v", "eff_from", "eff_to")
    val d = Seq(
      (1L, None: Option[Double], ts("2024-06-01 00:00:00")), // value -> NULL
      (2L, Some(5.0), ts("2024-06-01 00:00:00")))            // NULL -> value
      .toDF("k", "v", "eff_from")
    val out = ScdApply(b, d, "k", "v", "eff_from", "eff_to")
      .select("k", "v", "eff_from", "eff_to").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getTimestamp(2),
        Option(r.getTimestamp(3)))).toSet
    val t6 = ts("2024-06-01 00:00:00")
    assert(out === Set(
      (1L, Some(10.0), ts("2024-01-01 00:00:00"), Some(t6)),
      (1L, None, t6, None),
      (2L, None, ts("2024-01-01 00:00:00"), Some(t6)),
      (2L, Some(5.0), t6, None)),
      s"NULL transitions mishandled: $out")
    // and a NULL -> NULL resubmission is a no-op, not a new version
    val noop = ScdApply(b, Seq((2L, None: Option[Double], t6))
        .toDF("k", "v", "eff_from"), "k", "v", "eff_from", "eff_to")
    assert(noop.count() === b.count(), "NULL==NULL resubmit must no-op")
    // documented precondition now enforced: two delta rows for one key
    val dup = Seq((1L, Some(5.0), t6), (1L, Some(6.0), t6))
      .toDF("k", "v", "eff_from")
    val e = intercept[IllegalArgumentException] {
      ScdApply(b, dup, "k", "v", "eff_from", "eff_to")
    }
    assert(e.getMessage.contains("pre-collapse"), e.getMessage)
  }

  test("random change batches match an in-memory reference model") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // reference semantics, straight from the scaladoc: value-equal
    // against the open version => no-op; else close the open version
    // at the delta ts and insert a new open one; absent keys insert
    def reference(b: Seq[Row4], d: Seq[(Long, Double, Timestamp)]): Set[Row4] = {
      val open = b.collect { case (k, v, _, None) => k -> v }.toMap
      val eff = d.filter { case (k, v, _) => !open.get(k).contains(v) }
      val effKeys = eff.map(_._1).toSet
      val closed = b.map {
        case (k, v, f, None) if effKeys.contains(k) =>
          (k, v, f, Some(eff.find(_._1 == k).get._3))
        case r => r
      }
      (closed ++ eff.map { case (k, v, f) => (k, v, f, None) }).toSet
    }
    val hourMs = 3600L * 1000
    val t0 = ts("2024-01-01 00:00:00").getTime
    // per key: 0-3 closed versions then possibly one open version,
    // at strictly increasing hours
    val histGen = Gen.sequence[Seq[Option[(Int, Boolean)]], Option[(Int, Boolean)]](
      (1 to 6).map(_ => Gen.option(Gen.zip(Gen.choose(1, 3), Gen.oneOf(true, false)))))
    val deltaGen = Gen.someOf(1 to 8).flatMap(ks =>
      Gen.sequence[Seq[(Int, Int)], (Int, Int)](
        ks.map(k => Gen.choose(0, 4).map(v => (k, v)))))
    val cases = (1 to 8).flatMap(i =>
      Gen.zip(histGen, deltaGen).apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 6)
    cases.foreach { case (hists, deltas) =>
      val baseRows: Seq[Row4] = hists.zipWithIndex.flatMap {
        case (None, _) => Seq.empty
        case (Some((nVers, hasOpen)), i) =>
          val k = (i + 1).toLong
          val versions = (0 until nVers).map { j =>
            (k, (j * 10 + i).toDouble, new Timestamp(t0 + j * hourMs),
              Some(new Timestamp(t0 + (j + 1) * hourMs)))
          }
          if (hasOpen)
            versions :+ ((k, 99.0 + i, new Timestamp(t0 + nVers * hourMs),
              None: Option[Timestamp]))
          else versions
      }
      val deltaTs = new Timestamp(t0 + 100 * hourMs)
      val deltaRows = deltas.map { case (k, v) =>
        // v == 0 re-submits the open value when one exists (no-op path)
        val openV = baseRows.collectFirst {
          case (kk, vv, _, None) if kk == k.toLong => vv }
        (k.toLong, if (v == 0) openV.getOrElse(7.5) else v * 100.0, deltaTs)
      }
      val got = rows(ScdApply(
        spark.createDataFrame(baseRows)
          .toDF("k", "v", "eff_from", "eff_to"),
        spark.createDataFrame(deltaRows).toDF("k", "v", "eff_from"),
        "k", "v", "eff_from", "eff_to"))
      val want = reference(baseRows, deltaRows)
      assert(got === want,
        s"model mismatch: only-got=${(got -- want).take(3)} " +
          s"only-want=${(want -- got).take(3)} base=$baseRows delta=$deltaRows")
    }
  }
}
