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
}
