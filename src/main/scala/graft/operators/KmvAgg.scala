package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable KMV (k-minimum-values) sketch state: the k smallest
  * DISTINCT hash values seen — the production shape of the KMV
  * distinct-count estimator (q_sketch_kmv). Where a
  * `distinct().orderBy().limit(k)` formulation pays an ndv-sized
  * exchange to dedup, this Aggregator dedups INSIDE the bounded
  * buffer: partial states combine map-side, so shuffle volume is
  * k · partitions whatever the row count or key cardinality — the
  * same bounded-summary discipline as [[TopKAgg]], plus the distinct
  * constraint KMV's order statistic requires.
  *
  * The buffer is an always-sorted ascending Seq of ≤ k distinct
  * longs; merge is one bounded duplicate-skipping merge-sort step.
  * Deterministic for any partitioning: the k smallest distinct
  * values of a set are partition-order-independent.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Seq[Long] = Nil

  // HOT PATH: called once per row. Once the buffer is full, any hash
  // ≥ the current θ_k (including duplicates of it) returns the buffer
  // UNCHANGED with zero allocation — after the first ~k·ln(n) rows of
  // a random stream virtually every row takes this branch, so the
  // per-row cost is one comparison, not an O(k) rebuild (the naive
  // merge(buf, Seq(x)) formulation measured 60× slower on the sf0.1
  // fixture). Qualifying rows insert by binary search; duplicates
  // anywhere in the buffer are detected by the same search.
  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = {
    val n = buf.length
    if (n == k && x >= buf(n - 1)) buf
    else {
      val arr = buf.toArray
      val pos = java.util.Arrays.binarySearch(arr, x)
      if (pos >= 0) buf // already present — distinct semantics
      else {
        val ins = -pos - 1
        val outLen = math.min(k, n + 1)
        val out = new Array[Long](outLen)
        System.arraycopy(arr, 0, out, 0, ins)
        out(ins) = x
        if (ins < outLen - 1)
          System.arraycopy(arr, ins, out, ins + 1, outLen - 1 - ins)
        scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      }
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length) { val v = a(i); i += 1; v }
        else if (i >= a.length) { val v = b(j); j += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (b(j) < a(i)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // equal: consume both
      // distinct: sorted inputs mean a duplicate can only be the
      // previous emitted value
      if (out.isEmpty || out.last != take) out += take
    }
    out.toSeq
  }

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvAgg {
  def udafColumn(k: Int, hash: Column): Column =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k), Encoders.scalaLong)
      .apply(hash)
}
