package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.DecimalType

/** Dev-only profiling harness for the iterative-operator cost seam
  * (VERDICT r9 next-round #3): times PageRank round-state strategies
  * in one session so scheduler warmup is shared. Lives in the TEST
  * source set (ADVICE r10) so its deliberately-unsound eager-release
  * variant can never be mistaken for library API. Usage:
  * `sbt "Test/runMain graft.PageRankProbe <sfDir> [reps]"`
  */
object PageRankProbe {

  private val D = DecimalType(38, 18)

  def edges(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** Current production shape (operators.PageRank). */
  def variantCheckpoint(e0: DataFrame, iterations: Int): DataFrame =
    graft.operators.PageRank(e0, iterations)

  /** Per-round persist at `lvl` + count() materialize; lineage
    * truncated by localCheckpoint only every `ckEvery` rounds.
    * Probe-only: releases superseded rounds eagerly, so a recompute
    * after block eviction would fail — acceptable in a measurement
    * harness, not in the production operator. */
  def variantPersist(edges: DataFrame, iterations: Int, ckEvery: Int,
      lvl: StorageLevel): DataFrame = {
    val e = edges.localCheckpoint()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val eD = e.join(deg, col("src") === col("id"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .localCheckpoint()
    var ranks = deg.select(col("id"), lit(1.0).as("rank")).localCheckpoint()
    var ranksIsCk = true
    Bridge.unpersistCheckpoint(e)
    Bridge.unpersistCheckpoint(deg)
    for (i <- 1 to iterations) {
      val prev = ranks
      val prevCk = ranksIsCk
      val step = eD.join(ranks.hint("shuffle_hash"), col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("deg")).cast(D).as("w"))
        .groupBy(col("dst").as("id"))
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank"))
      if (i % ckEvery == 0 || i == iterations) {
        ranks = step.localCheckpoint(); ranksIsCk = true
      } else {
        ranks = step.persist(lvl)
        ranks.count(): Unit
        ranksIsCk = false
      }
      if (prevCk) Bridge.unpersistCheckpoint(prev)
      else { prev.unpersist(false): Unit }
    }
    Bridge.unpersistCheckpoint(eD)
    ranks
  }

  /** No per-round materialization at all: one lazy 10-round plan,
    * executed by the final action. Measures what the checkpoints buy
    * (or cost) at this scale. */
  def variantLazy(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.localCheckpoint()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val eD = e.join(deg, col("src") === col("id"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
    var ranks = deg.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = eD.join(ranks.hint("shuffle_hash"), col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("deg")).cast(D).as("w"))
        .groupBy(col("dst").as("id"))
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank"))
    }
    ranks
  }

  /** Lazy chaining with a lineage-truncating localCheckpoint every
    * `ckEvery` rounds — bounded analysis depth for arbitrary k, no
    * per-round job. */
  def variantLazyCk(edges: DataFrame, iterations: Int, ckEvery: Int): DataFrame = {
    val e = edges.localCheckpoint()
    // deg stays lazy: it feeds the (deferred) initial rank vector, so a
    // checkpoint released before the final action would be read-after-free
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val eD = e.join(deg, col("src") === col("id"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .localCheckpoint()
    var ranks = deg.select(col("id"), lit(1.0).as("rank"))
    var lastCk: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      ranks = eD.join(ranks.hint("shuffle_hash"), col("src") === col("id"))
        .select(col("dst"), (col("rank") / col("deg")).cast(D).as("w"))
        .groupBy(col("dst").as("id"))
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank"))
      if (i % ckEvery == 0 && i < iterations) {
        val ck = ranks.localCheckpoint()
        lastCk.foreach(Bridge.unpersistCheckpoint)
        lastCk = Some(ck)
        ranks = ck
      }
    }
    ranks
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => DataFrame): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val out = f
        val n = out.orderBy(col("rank").desc, col("id").asc).limit(20).collect().length
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $label rep=$r rows=$n time=$dt%.2fs")
        out.unpersist(false): Unit
      }
    }
    val e0 = edges(spark, sfDir)
    time("checkpoint-every-round")(variantCheckpoint(e0, 10))
    time("persist-mem-ck3")(variantPersist(e0, 10, 3, StorageLevel.MEMORY_ONLY))
    time("persist-memdisk-ck3")(
      variantPersist(e0, 10, 3, StorageLevel.MEMORY_AND_DISK))
    time("persist-mem-ck10")(variantPersist(e0, 10, 10, StorageLevel.MEMORY_ONLY))
    time("lazy-no-checkpoint")(variantLazy(e0, 10))
    time("lazy-ck5")(variantLazyCk(e0, 10, 5))
    time("lazy-ck4")(variantLazyCk(e0, 10, 4))
    spark.stop()
  }
}
