package graft

import org.apache.spark.sql.functions._

import graft.operators.MgAgg

/** [[MgAgg]] — Misra–Gries guarantees against exact counts, under
  * multiple partitionings (the merge path), plus the registry query's
  * report invariants. Counts are merge-order dependent; the
  * GUARANTEES are what the operator promises. */
class HeavyHitterSpec extends SparkSuite {

  // 1500-token stream: "hot" 500 times, 1000 distinct fillers
  private def stream = (0 until 500).map(_ => "hot") ++
    (0 until 1000).map(i => s"f$i")

  private def summarize(parts: Int, k: Int): Map[String, Long] = {
    import spark.implicits._
    stream.toDF("tok").repartition(parts)
      .agg(MgAgg.udafColumn(k, col("tok")).as("mg"))
      .collect().head.getMap[String, Long](0).toMap
  }

  test("guarantees hold under 1, 4, and 32 partitions: bounded size, " +
      "no overestimate, n/(k+1) undercount, hot item present") {
    val k = 16
    val n = stream.length // 1500 -> budget 1500/17 = 88
    val budget = n / (k + 1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 4, 32).foreach { parts =>
      val mg = summarize(parts, k)
      assert(mg.size <= k, s"parts=$parts size ${mg.size}")
      mg.foreach { case (t, est) =>
        assert(est <= exact(t), s"parts=$parts $t overestimates")
        assert(exact(t) - est <= budget,
          s"parts=$parts $t undercount ${exact(t) - est} > $budget")
      }
      assert(mg.contains("hot"),
        s"parts=$parts: the >n/(k+1) item must be present")
      assert(mg("hot") >= 500L - budget)
    }
  }

  test("a uniform stream yields no false confidence: every estimate " +
      "stays within the undercount budget of its tiny true count") {
    import spark.implicits._
    val uni = (0 until 2000).map(i => s"u${i % 200}") // each exactly 10
    val mg = uni.toDF("tok").repartition(8)
      .agg(MgAgg.udafColumn(16, col("tok")).as("mg"))
      .collect().head.getMap[String, Long](0).toMap
    assert(mg.size <= 16)
    mg.values.foreach(est => assert(est <= 10L))
  }

  test("registry report: bounded rows, undercount non-negative and " +
      "within budget, ordered by exact count") {
    val rows = SparkEntry.queries("q_text_heavy_hitters")(spark, Sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val n = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("t")).count()
    val budget = n / 65 // k = 64
    rows.foreach { r =>
      val (est, exact, under) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(under === exact - est)
      assert(under >= 0L, s"${r.getString(0)} overestimates")
      assert(under <= budget, s"${r.getString(0)} undercount $under > $budget")
    }
    val exacts = rows.map(_.getLong(2))
    assert(exacts.sameElements(exacts.sortBy(-_)), "not ordered by exact")
  }
}
