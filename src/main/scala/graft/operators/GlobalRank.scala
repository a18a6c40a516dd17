package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole
  * table into one task — correct at fixture scale, dead at 100 TB.
  * This computes the same total-order row number in two distributed
  * passes instead:
  *
  *   1. range-repartition on the sort keys (RangePartitioner sampling
  *      is seeded per-partition — deterministic for a given input) and
  *      rank rows *within* each range partition;
  *   2. compute per-partition row counts, turn them into cumulative
  *      offsets (a window over ≤ `spark.sql.shuffle.partitions` rows —
  *      driver-scale metadata, not data), broadcast-join them back and
  *      add `offset + local_rank`.
  *
  * The sort keys must define a TOTAL order (append a unique id as the
  * final tiebreak) — with ties across a range boundary the global rank
  * would otherwise depend on boundary placement.
  *
  * The offsets branch references the same ranged subtree as the main
  * branch; AQE's exchange reuse materializes the range shuffle ONCE at
  * runtime and serves both branches from it (verified: the executed
  * plan contains a ReusedExchange over the rangepartitioning
  * exchange), so no explicit cache is needed and both branches are
  * guaranteed to see identical partition assignments.
  */
object GlobalRank {

  def withRowNumber(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(parts, keys: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val local  = ranged.withColumn("__local_rn", row_number().over(localW))
    // One row per range partition: tiny by construction, so the
    // unpartitioned cumulative-sum window below is metadata-scale work.
    val offsetW = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(offsetW), lit(0L)))
      .select(col("__pid").as("__opid"), col("__offset"))
    local
      .join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn(rankCol, col("__offset") + col("__local_rn"))
      .drop("__pid", "__opid", "__local_rn", "__offset")
  }

  /** Scale-safe GLOBAL running sum (prefix sum) — same two-pass trick
    * as [[withRowNumber]], with per-partition SUMS instead of counts:
    * range-partition on the total-order keys, cumulative-sum within
    * each partition, then add the exclusive prefix of per-partition
    * totals (metadata-scale window + broadcast). Pass a DECIMAL value
    * column: the partial sums merge order-independently, so the
    * result is bit-identical on any partitioning — a double value
    * here would drift with partition boundaries (repo determinism
    * rules). Keys must define a total order (unique-id tiebreak). */
  def withRunningSum(df: DataFrame, sumCol: String, value: Column,
      keys: Column*): DataFrame =
    withRunningSums(df, Seq(sumCol -> value), keys: _*)

  /** Multi-column variant of [[withRunningSum]]: N global running
    * sums from ONE range shuffle. Two separate withRunningSum calls
    * would range-partition twice, and when AQE exchange reuse misses
    * the two passes can see DIFFERENT range boundaries (the
    * nested-call hazard documented on
    * [[withRowNumberAndCountPerGroup]]) — so sums that must be
    * mutually consistent per row (e.g. the two empirical CDFs of a KS
    * test) belong in one call. Values must merge order-independently
    * (integer or DECIMAL sums — never double; repo determinism
    * rules). Keys must define a total order. */
  def withRunningSums(df: DataFrame, sums: Seq[(String, Column)],
      keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val vNames = sums.indices.map(i => s"__v$i")
    val ranged = sums.zip(vNames).foldLeft(
      df.repartitionByRange(parts, keys: _*)
        .withColumn("__pid", spark_partition_id())) {
      case (d, ((_, v), n)) => d.withColumn(n, v)
    }
    val localW = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = vNames.foldLeft(ranged) {
      (d, n) => d.withColumn(s"__lc$n", sum(col(n)).over(localW))
    }
    val offsetW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vNames.foldLeft(
      local.groupBy(col("__pid")).agg(
        sum(col(vNames.head)).as(s"__ps${vNames.head}"),
        vNames.tail.map(n => sum(col(n)).as(s"__ps$n")): _*)) {
      (d, n) => d.withColumn(s"__off$n", sum(col(s"__ps$n")).over(offsetW))
    }.select(col("__pid").as("__opid") +: vNames.map(n => col(s"__off$n")): _*)
    val joined = local.join(broadcast(offsets), col("__pid") === col("__opid"))
    sums.zip(vNames).foldLeft(joined) {
      case (d, ((name, _), n)) =>
        d.withColumn(name, when(col(s"__off$n").isNull, col(s"__lc$n"))
          .otherwise(col(s"__off$n") + col(s"__lc$n")))
    }.drop(Seq("__pid", "__opid") ++ vNames ++
      vNames.map(n => s"__lc$n") ++ vNames.map(n => s"__off$n"): _*)
  }

  /** Per-GROUP running sum, scale-safe for FEW, HUGE groups — where
    * `Window.partitionBy(group)` would bound parallelism by group
    * cardinality (five groups = five tasks, whatever the data size).
    * Same structure as [[withRunningSum]]: range-partition on
    * (group ++ keys) so a huge group spans many consecutive range
    * partitions, cumulative-sum within (partition, group), then add
    * the exclusive per-(group, partition-run) offsets — one row per
    * (partition, group) pair, metadata-scale. DECIMAL value required
    * (order-independent partial merges). Keys must total-order rows
    * within a group. */
  def withRunningSumPerGroup(df: DataFrame, sumCol: String, value: Column,
      groupCols: Seq[String], keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val groupRefs = groupCols.map(col)
    val ranged = df
      .repartitionByRange(parts, (groupRefs ++ keys): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val localW = Window.partitionBy(col("__pid") +: groupRefs: _*)
      .orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local_cum", sum(col("__v")).over(localW))
    val offsetW = Window.partitionBy(groupRefs: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("__pid") +: groupRefs: _*).agg(sum(col("__v")).as("__psum"))
      .withColumn("__offset", sum(col("__psum")).over(offsetW))
      .select(col("__pid").as("__opid") +:
        groupCols.map(n => col(n).as(s"__og_$n")) :+ col("__offset"): _*)
    // null-safe group match: a NULL group key is a real group here —
    // plain === would never match it, hand every null-keyed row a null
    // __offset, and silently take the first-partition-run branch even
    // when the null group spans multiple range partitions
    val joinCond = groupCols.foldLeft(col("__pid") === col("__opid")) {
      (acc, n) => acc && (col(n) <=> col(s"__og_$n"))
    }
    local
      .join(broadcast(offsets), joinCond)
      .withColumn(sumCol, when(col("__offset").isNull, col("__local_cum"))
        .otherwise(col("__offset") + col("__local_cum")))
      .drop("__pid" +: "__opid" +: "__v" +: "__local_cum" +: "__offset" +:
        groupCols.map(n => s"__og_$n"): _*)
  }

  /** Per-GROUP row numbering with the same two-pass trick.
    *
    * `Window.partitionBy(group).orderBy(keys)` bounds parallelism by
    * group cardinality — five groups means five tasks sorting 20% of
    * the table each, however large it is. Here the range partitioner
    * sorts on (group ++ keys), so a huge group spans MANY consecutive
    * range partitions; ranks are local to (partition, group) and the
    * broadcast offset table (one row per (partition, group-run) —
    * bounded by partitions + groups, metadata-scale when a few huge
    * groups are the problem) restores the per-group global rank.
    * As with [[withRowNumber]], `keys` must total-order rows WITHIN a
    * group (append a unique id tiebreak).
    */
  def withRowNumberPerGroup(df: DataFrame, rankCol: String,
      groupCols: Seq[String], keys: Column*): DataFrame =
    perGroupImpl(df, rankCol, None, groupCols, keys)

  /** [[withRowNumberPerGroup]] plus the GROUP TOTAL as `countCol` on
    * every row, from the same single range shuffle: the offsets table
    * already holds per-(partition, group) counts, so the group total is
    * one more metadata-scale window over it — never a second ranking
    * pass (two GlobalRank calls see DIFFERENT range boundaries when
    * exchange reuse misses, mis-joining offsets — measured on nested
    * calls) and never a one-row-per-group count table built from the
    * data (unbounded broadcast, the PlanAuditSpec hazard). */
  def withRowNumberAndCountPerGroup(df: DataFrame, rankCol: String,
      countCol: String, groupCols: Seq[String], keys: Column*): DataFrame =
    perGroupImpl(df, rankCol, Some(countCol), groupCols, keys)

  private def perGroupImpl(df: DataFrame, rankCol: String,
      countCol: Option[String], groupCols: Seq[String], keys: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val groupRefs = groupCols.map(col)
    val ranged = df
      .repartitionByRange(parts, (groupRefs ++ keys): _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy(col("__pid") +: groupRefs: _*).orderBy(keys: _*)
    val local  = ranged.withColumn("__local_rn", row_number().over(localW))
    val offsetW = Window.partitionBy(groupRefs: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totalW = Window.partitionBy(groupRefs: _*)
    val offsets = local
      .groupBy(col("__pid") +: groupRefs: _*).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(offsetW), lit(0L)))
      .withColumn("__gn", sum(col("__cnt")).over(totalW))
      .select(col("__pid").as("__opid") +:
        groupCols.map(n => col(n).as(s"__og_$n")) :+ col("__offset") :+ col("__gn"): _*)
    // null-safe for the same reason as withRunningSumPerGroup above
    val joinCond = groupCols.foldLeft(col("__pid") === col("__opid")) {
      (acc, n) => acc && (col(n) <=> col(s"__og_$n"))
    }
    val joined = local
      .join(broadcast(offsets), joinCond)
      .withColumn(rankCol, col("__offset") + col("__local_rn"))
    countCol.fold(joined)(c => joined.withColumn(c, col("__gn")))
      .drop("__pid" +: "__opid" +: "__local_rn" +: "__offset" +: "__gn" +:
        groupCols.map(n => s"__og_$n"): _*)
  }
}
