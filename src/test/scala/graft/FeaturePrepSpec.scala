package graft

import org.apache.spark.sql.functions._

/** Feature-prep operators (round 12 batch 6): target encoding's
  * shrinkage property and equal-frequency binning's partition
  * property — the value-level cross-engine proof is the DuckDB
  * oracle's job. */
class FeaturePrepSpec extends SparkSuite {

  test("target encoding shrinks every category toward the global prior") {
    val rows = SparkEntry.queries("q_feature_target_encode")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // reconstruct the global mean from the output itself
    val gMean = rows.map { case (_, n, _, raw) => raw * n }.sum /
      rows.map(_._2).sum
    rows.foreach { case (cat, _, enc, raw) =>
      // enc lies strictly between raw mean and global mean (or equals
      // both when they coincide)
      val lo = math.min(raw, gMean)
      val hi = math.max(raw, gMean)
      assert(enc >= lo - 1e-9 && enc <= hi + 1e-9,
        s"$cat: enc $enc outside [$lo, $hi]")
      // and closer to the prior than the raw mean is
      assert(math.abs(enc - gMean) <= math.abs(raw - gMean) + 1e-9,
        s"$cat did not shrink toward the prior")
    }
  }

  test("benford audit: full digit coverage, shares sum to 1, expected matches log10") {
    val out = SparkEntry.queries("q_agg_benford")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSet === (1L to 9L).toSet)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-12)
    out.foreach { case (d, _, _, exp) =>
      assert(math.abs(exp - math.log10(1.0 + 1.0 / d)) < 1e-15,
        s"digit $d expected share drifted from Benford")
    }
    assert(out.map(_._2).sum === graft.Tables.orders(spark, Sf).count())
  }

  test("k-fold assignment is group-exclusive: every user in exactly one fold") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.events(spark, Sf)
      .select(col("user_id"),
        (col("user_id") % 1000003L * 2654435761L % 4294967296L % 5L)
          .as("fold"))
    val leaky = e.groupBy(col("user_id"))
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1).count()
    assert(leaky === 0L, "a user spans folds — grouped CV would leak")
    val out = SparkEntry.queries("q_feature_kfold")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).forall(f => f >= 0 && f <= 4))
    assert(out.map(_._3).sum === graft.Tables.events(spark, Sf).count())
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
    // user totals reconcile: folds partition the user set
    assert(out.map(_._2).sum ===
      graft.Tables.events(spark, Sf).select("user_id").distinct().count())
  }

  test("odds encoding: ratio is odds over global odds, smoothing keeps it finite") {
    val rows = SparkEntry.queries("q_feature_odds")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val gp = rows.map(_._2).sum.toDouble
    val gn = rows.map(_._3).sum.toDouble
    val gOdds = (gp + 0.5) / (gn + 0.5)
    rows.foreach { case (cat, pos, neg, odds, ratio) =>
      assert(odds > 0 && java.lang.Double.isFinite(odds),
        s"$cat odds $odds not finite-positive")
      assert(math.abs(odds - (pos + 0.5) / (neg + 0.5)) < 1e-12)
      assert(math.abs(ratio - odds / gOdds) < 1e-12, s"$cat ratio drifted")
    }
  }

  test("equal-frequency binning partitions all rows into near-equal deciles") {
    val out = SparkEntry.queries("q_feature_binning")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === (0L to 9L).toSet)
    val total = graft.Tables.orders(spark, Sf).count()
    assert(out.values.sum === total)
    // exact interpolated deciles of a (near-)distinct column give
    // counts within one row of total/10
    val expect = total / 10
    out.foreach { case (bin, n) =>
      assert(math.abs(n - expect) <= 1, s"bin $bin count $n vs ~$expect")
    }
  }
}
