package graft

/** Plan inspector: prints the formatted physical plan (and optionally
  * times) for named queries. Usage:
  *   runMain graft.ExplainTool <sfDir> [--time] [--adaptive] <query> [query ...]
  *
  * `--adaptive` EXECUTES the query and prints the final AQE plan —
  * the one that shows ReusedExchange/ReusedSubquery nodes the static
  * explain cannot (exchange reuse is a runtime decision): the static
  * plan of a query whose builder references one frame N times shows N
  * copies of its subtree, while the executed plan reveals whether the
  * shuffle actually materialized once.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val time  = args.contains("--time")
    val adaptive = args.contains("--adaptive")
    val names = args.drop(1).filterNot(a => a == "--time" || a == "--adaptive")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      if (adaptive) {
        df.collect(): Unit
        println(s"----- $name: executed (adaptive) plan -----")
        println(df.queryExecution.executedPlan.toString)
      }
      if (time) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
