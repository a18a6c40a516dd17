package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** GlobalRank must agree exactly with the single-partition
  * Window.orderBy row_number it replaces, for any total order. */
class GlobalRankSpec extends SparkSuite {

  private def check(rows: Seq[(Double, Long)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("v", "id").repartition(4)
    val got = GlobalRank
      .withRowNumber(df, "rn", col("v").asc, col("id").asc)
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("matches Window.orderBy row_number on shuffled data") {
    val rng = new scala.util.Random(7)
    check(Seq.tabulate(500)(i => (rng.nextDouble(), i.toLong)))
  }

  test("handles duplicate sort values (id tiebreak) and tiny inputs") {
    check(Seq((1.0, 3L), (1.0, 1L), (1.0, 2L), (0.5, 4L)))
    check(Seq((42.0, 1L)))
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Double, Long)].toDF("v", "id")
    assert(GlobalRank.withRowNumber(df, "rn", col("v"), col("id")).count() == 0)
  }

  test("per-group variant matches Window.partitionBy row_number") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = Seq.tabulate(600)(i =>
      (s"g${i % 3}", rng.nextDouble(), i.toLong)).toDF("g", "v", "id")
      .repartition(4)
    val got = GlobalRank
      .withRowNumberPerGroup(df, "rn", Seq("g"), col("v").asc, col("id").asc)
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc))
        .cast("long"))
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // multi-column grouping, duplicate sort values, singleton group
    val df2 = Seq(("a", 1, 1.0, 1L), ("a", 1, 1.0, 2L), ("a", 2, 0.5, 3L),
      ("b", 1, 9.0, 4L)).toDF("g1", "g2", "v", "id")
    val got2 = GlobalRank
      .withRowNumberPerGroup(df2, "rn", Seq("g1", "g2"), col("v"), col("id"))
      .select(col("id"), col("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("count variant attaches the exact per-group total to every row") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = Seq.tabulate(500)(i =>
      (s"g${i % 4}", rng.nextDouble(), i.toLong)).toDF("g", "v", "id")
      .repartition(4)
    val got = GlobalRank
      .withRowNumberAndCountPerGroup(df, "rn", "n", Seq("g"), col("v"), col("id"))
    // every row's n equals its group's true cardinality, and ranks are
    // unchanged relative to the plain per-group variant
    val perGroup = got.groupBy(col("g")).agg(
      countDistinct(col("n")).as("ndist"), max(col("n")).as("nmax"),
      count(lit(1)).as("true_n"), max(col("rn")).as("rnmax")).collect()
    perGroup.foreach { r =>
      assert(r.getLong(1) == 1L, s"inconsistent n within group in $r")
      assert(r.getLong(2) == r.getLong(3), s"n != |group| in $r")
      assert(r.getLong(4) == r.getLong(3), s"rank broken in $r")
    }
  }

  test("withRunningSum matches the single-partition cumulative window") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val df = Seq.tabulate(500)(i =>
      (BigDecimal(rng.nextInt(100000)) / 100, i.toLong)).toDF("v", "id")
      .select(col("v").cast(d182).as("v"), col("id"))
      .repartition(4)
    val got = GlobalRank
      .withRunningSum(df, "cum", col("v"), col("v").desc, col("id").asc)
      .select(col("id"), col("cum").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = df
      .withColumn("cum", sum(col("v")).over(
        Window.orderBy(col("v").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    // partitioning independence: a different input layout, same sums
    val got2 = GlobalRank
      .withRunningSum(df.repartition(13), "cum", col("v"),
        col("v").desc, col("id").asc)
      .select(col("id"), col("cum").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == want)
  }

  test("withRunningSums: N sums from one pass match N reference windows") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val df = Seq.tabulate(400)(i =>
      (rng.nextInt(50).toLong, rng.nextInt(7).toLong, i.toLong))
      .toDF("a", "b", "id").repartition(5)
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("ra", sum(col("a")).over(w))
      .withColumn("rb", sum(col("b")).over(w))
      .select(col("id"), col("ra"), col("rb"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = GlobalRank
      .withRunningSums(df, Seq("ra" -> col("a"), "rb" -> col("b")), col("id"))
      .select(col("id"), col("ra"), col("rb"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // partitioning independence
    val got2 = GlobalRank
      .withRunningSums(df.repartition(11),
        Seq("ra" -> col("a"), "rb" -> col("b")), col("id"))
      .select(col("id"), col("ra"), col("rb"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2 == want)
  }

  test("withRunningSumPerGroup matches Window.partitionBy cumulative sums") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val df = Seq.tabulate(600)(i =>
      (s"g${i % 3}", BigDecimal(rng.nextInt(100000)) / 100, i.toLong))
      .toDF("g", "v", "id")
      .select(col("g"), col("v").cast(d182).as("v"), col("id"))
      .repartition(5)
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> r.getString(1)
    val got = GlobalRank
      .withRunningSumPerGroup(df, "cum", col("v"), Seq("g"),
        col("v").desc, col("id").asc)
      .select(col("id"), col("cum").cast("string")).collect().map(key).toMap
    val want = df
      .withColumn("cum", sum(col("v")).over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum").cast("string")).collect().map(key).toMap
    assert(got == want)
    val got2 = GlobalRank
      .withRunningSumPerGroup(df.repartition(11), "cum", col("v"), Seq("g"),
        col("v").desc, col("id").asc)
      .select(col("id"), col("cum").cast("string")).collect().map(key).toMap
    assert(got2 == want)
  }

  test("q_win_ntile matches the built-in ntile/percent_rank/cume_dist") {
    val got = SparkEntry.queries("q_win_ntile")(spark, Sf).collect()
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val want = Tables.customer(spark, Sf)
      .select(col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) => assert(g == e) }
  }
}
