package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // Optional comma-separated filter for fast single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    // Warm the JVM/codegen/parquet paths once so fixed session startup
    // (~4 s measured) is not attributed to whichever query runs first —
    // per-query numbers then reflect steady-state cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).collect()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try { selected(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0 // unmistakable in the JSON; excluded from totals
      }
    }
    val results = selected.map { case (name, _) => name -> run(name) }
    // Second pass for queries costing over a second: full-run totals on
    // this box swing ~2x with ambient load, so the artifact also
    // carries a per-query STEADY time — min of two runs — which is the
    // number to compare across rounds (plan changes move it; box load
    // mostly does not). Sub-second queries skip the re-run, and the
    // re-run set is greedily capped at ~90 s of first-pass time
    // (heaviest first) so the whole bench stays bounded — losing the
    // artifact to a harness timeout would cost more than a few
    // uncorrected mid-range numbers.
    val rerunSet = {
      var budget = 90.0
      results.toSeq.filter(_._2 >= 1.0).sortBy(-_._2).takeWhile { case (_, t) =>
        val ok = budget > 0; budget -= t; ok
      }.map(_._1).toSet
    }
    val steady = results.map { case (name, t) =>
      // a failed re-run (-1) must not mask a successful first run
      name -> (if (!rerunSet.contains(name)) t
               else { val t2 = run(name); if (t2 < 0) t else math.min(t, t2) })
    }
    def json(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val steadyTotal = steady.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(results)},"steady":${json(steady)},"steady_total":$steadyTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
