package graft

/** Plan inspector: prints the formatted physical plan (and optionally
  * times) for named queries. Usage:
  *   runMain graft.ExplainTool <sfDir> [--time] <query> [query ...]
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val time  = args.contains("--time")
    val names = args.drop(1).filterNot(_ == "--time")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
      if (time) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
