package graft

import org.apache.spark.sql.functions._

/** q_skyline — the 2-D Pareto-frontier operator: the registered
  * query's algebraic plan (per-price-cell maxima + one running max
  * over the price domain) must equal the DEFINITION, an O(n²)
  * brute-force dominance check, recomputed driver-side on the
  * fixture. */
class SkylineSpec extends SparkSuite {

  test("algebraic skyline equals brute-force dominance on the fixture") {
    val demand = Tables.lineitem(spark, Sf)
      .groupBy(col("l_partkey"))
      .agg(sum(Tables.dec(col("l_quantity"))).cast("long").as("demand"))
    val pd = Tables.part(spark, Sf)
      .select(col("p_partkey"),
        (Tables.dec(col("p_retailprice")) * 100).cast("long").as("cents"))
      .join(demand, col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"), col("cents"), col("demand"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pd.length > 50, "fixture too small to exercise dominance")
    val expected = pd.filter { case (id, c, d) =>
      !pd.exists { case (id2, c2, d2) =>
        id2 != id && c2 <= c && d2 >= d && (c2 < c || d2 > d)
      }
    }.map { case (id, c, d) => (id, c.toDouble / 100.0, d) }
      .sortBy(_._1).toSeq

    val got = SparkEntry.queries("q_skyline")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the frontier is a real cut, not the whole table
    assert(got.nonEmpty && got.length < pd.length)
    // frontier invariant: sorted by price, demand strictly INCREASES
    // across distinct price levels — a pricier frontier point only
    // survives by being strictly more popular (else the cheaper one
    // dominates it)
    val byPrice = got.groupBy(_._2).view.mapValues(_.map(_._3).max)
      .toSeq.sortBy(_._1)
    byPrice.sliding(2).foreach {
      case Seq((p1, d1), (p2, d2)) =>
        assert(d2 > d1,
          s"frontier point at $p2 (demand $d2) is dominated by $p1 ($d1)")
      case _ =>
    }
  }
}
