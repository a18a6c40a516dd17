package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.InterleaveBits

/** Z-ordered data layout: sort the table by the Morton interleave of
  * two (min-max normalized) numeric columns before writing, so every
  * output file covers a TILE of the 2-D value space instead of a slab
  * of one dimension. Parquet min/max statistics then prune files and
  * row groups for predicates on EITHER OR BOTH columns — the layout
  * trick behind multi-dimensional pruning at 100 TB, where a
  * single-column sort only ever serves one predicate.
  *
  * The min/max normalization scan aggregates to ONE row (bounded —
  * never a data-scale collect); the write is one range shuffle on the
  * z-value. ZOrderSpec measures the actual effect: a filter on the
  * SECOND dimension reads a fraction of the rows a one-column-sorted
  * layout reads.
  */
object ZOrder {

  private val Bits = 21
  private val MaxVal = (1 << Bits) - 1

  /** Z-value column for two numeric columns given their min/max. */
  def zvalue(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double): Column = {
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0)
      else least(lit(MaxVal), greatest(lit(0),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(MaxVal)).cast("int")))
    InterleaveBits(norm(a, aMin, aMax), norm(b, bMin, bMax))
  }

  /** Write `df` z-ordered by (ca, cb) into `numFiles` parquet files.
    * An empty input (or all-null layout columns) degrades to a plain
    * unordered write — there is nothing to normalize against. */
  def write(df: DataFrame, ca: String, cb: String,
      path: String, numFiles: Int): Unit = {
    val r = df.agg(
      min(col(ca)).cast("double"), max(col(ca)).cast("double"),
      min(col(cb)).cast("double"), max(col(cb)).cast("double")).collect().head
    if (r.isNullAt(0) || r.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zvalue(col(ca), r.getDouble(0), r.getDouble(1),
      col(cb), r.getDouble(2), r.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
