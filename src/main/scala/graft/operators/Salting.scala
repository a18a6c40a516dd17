package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins: when one probe-side key carries a
  * disproportionate share of rows, a plain hash join sends that whole
  * key to one task. Salting splits each key into `n` sub-keys — the
  * probe side gets a DETERMINISTIC salt derived from carrier columns
  * that are unique per row (never `rand()`: retries/speculative tasks
  * must re-derive identical salts), and the build side is replicated
  * across all `n` salts — so the skewed key's rows spread over n tasks
  * at the cost of an n× build-side blowup (choose a small broadcastable
  * build side, or modest n).
  *
  * AQE's skew-join handles many cases at runtime; explicit salting
  * remains the tool when a single key exceeds what one task can hold
  * even after AQE splits, or when AQE is unavailable (e.g. inside
  * cached/bucketed subplans).
  */
object Salting {

  /** Default fan-out for [[saltedPairJoin]]: an over-cap bucket's
    * product spreads over 16² = 256 join groups. */
  val DefaultPairG = 16

  /** Default per-bucket product threshold for [[saltedPairJoin]]:
    * ~1M enumerated pairs is comfortable single-task work; anything
    * larger splits. */
  val DefaultPairCap: Long = 1L << 20

  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      saltCarrier: Seq[Column],
      n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val salted = probe.withColumn("__psalt",
      pmod(xxhash64(saltCarrier: _*), lit(n.toLong)))
    val replicated = build.withColumn("__bsalt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted
      .join(replicated,
        salted(probeKey) === replicated(buildKey) &&
        col("__psalt") === col("__bsalt"))
      .drop("__psalt", "__bsalt")
  }

  /** LOSSLESS two-sided product split for PAIR-ENUMERATION joins
    * (round 19, the prefix family's residual viral hot spot): a
    * bucket key shared by m left rows and n right rows enumerates an
    * m·n product inside ONE task of a plain equi-join — for a viral
    * duplicate cluster that single task serializes the whole
    * quadratic enumeration (measured: max-task ×92 on the k=10 viral
    * containment probe while total work grew only ×38). AQE's skew
    * split cannot help: it keys on shuffle INPUT bytes, and a
    * product-skewed bucket's input is tiny (m + n rows). BandGuard's
    * star split fixes the same shape by dropping to hub pairs — fine
    * for connectivity consumers, unacceptable for the EXACT pair
    * listers whose oracle hash is the losslessness proof.
    *
    * The split: left rows get a fixed `__ga = hash(id) % g` and
    * explode `__gb` over 0..g−1; right rows get fixed `__gb` and
    * explode `__ga`. Joining on (keys, __ga, __gb) matches every
    * (left, right) pair at EXACTLY ONE (ga(left), gb(right)) — no
    * pair lost, none duplicated — while the bucket's product spreads
    * over g² join groups. Replication (×g per side) is paid ONLY by
    * over-threshold buckets: per-key counts on both sides gate `g`
    * to 1 wherever the product is under `capProduct`, so the normal
    * sparse-corpus path adds two map-side-combinable count
    * aggregations and nothing else. Sides come back aliased `a` /
    * `b` for the caller's select, [[BandGuard.starSelfJoin]]'s
    * convention.
    *
    * MEASURED SCOPE (round 19): this split targets single-hot-KEY
    * concentration — one bucket serializing in one task while other
    * cores idle. It was wired into the prefix-dedup candidate joins
    * and REVERTED on A/B measurement: their viral shape is ~40 hot
    * keys already spread across all cores (output-bound, every
    * enumerated pair a true pair), where the salting only defeated
    * the downstream distinct's in-task partial aggregation (a pair's
    * per-token copies land in different (ga, gb) groups, so the
    * multiplicity that used to collapse map-side crossed the wire:
    * 905k → 25M shuffled records, 268 → 381 s wall at the k=10 viral
    * probe) — and the stage dump showed the actual parallelism
    * limiter there is AQE coalescing the enumeration join on its
    * tiny INPUT bytes (output-blind), which key salting cannot undo.
    * Use it where ONE bucket dominates and the pair stream is not
    * re-aggregated by a key the salt fragments. */
  def saltedPairJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftId: String, rightId: String,
      g: Int, capProduct: Long, cond: Column): DataFrame = {
    require(g > 1, "split fan-out must exceed 1")
    val kc = keys.map(col)
    val lc = left.groupBy(kc: _*).agg(count(lit(1)).as("__lc"))
    val rc = right.groupBy(kc: _*).agg(count(lit(1)).as("__rc"))
    val gTab = lc.join(rc, keys)
      .withColumn("__g",
        when(col("__lc") * col("__rc") > capProduct, lit(g.toLong))
          .otherwise(lit(1L)))
      .select(kc :+ col("__g"): _*)
    val aSide = left.join(gTab, keys)
      .withColumn("__ga", pmod(xxhash64(col(leftId)), col("__g")))
      .withColumn("__gb", explode(sequence(lit(0L), col("__g") - 1)))
      .drop("__g").as("a")
    val bSide = right.join(gTab, keys)
      .withColumn("__gb", pmod(xxhash64(col(rightId)), col("__g")))
      .withColumn("__ga", explode(sequence(lit(0L), col("__g") - 1)))
      .drop("__g").as("b")
    aSide.join(bSide,
      keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        col("a.__ga") === col("b.__ga") &&
        col("a.__gb") === col("b.__gb") && cond)
  }
}
