package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (value, id) candidate for the bounded top-k heap. */
case class Ranked(price: Double, key: Long)

/** Mergeable bounded top-k per group — the scale-correct alternative
  * to `row_number().over(partitionBy(g).orderBy(v)) <= k`: the window
  * form SORTS every group in full (all rows shuffle, then per-group
  * sort), while an `Aggregator` keeps only k candidates per group in
  * its partial state, combines MAP-SIDE before the shuffle, and merges
  * k-vs-k lists on the reduce side — shuffle volume is
  * groups × k, not rows. Order: price desc, key asc tiebreak
  * (deterministic for any tie pattern).
  *
  * The buffer is an always-sorted Seq capped at k (k is small by
  * definition of top-k; insertion into a ≤ k list is O(k), and a
  * sorted buffer makes merge a bounded merge-sort step).
  */
class TopKAgg(k: Int) extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {
  require(k > 0, "k must be positive")

  private def lt(a: Ranked, b: Ranked): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  override def zero: Seq[Ranked] = Nil

  // HOT PATH: once the buffer is full, a candidate that does not beat
  // the current k-th element returns the buffer unchanged with zero
  // allocation — the overwhelmingly common case after warm-up, and
  // the same fix that took KmvAgg's sf0.1 cost from 292 s to 17 s
  // (the per-row merge(buf, Seq(x)) rebuild was the entire cost).
  // Ties with the k-th element skip too: merge would place the
  // incumbent-equal candidate at position k and drop it.
  override def reduce(buf: Seq[Ranked], x: Ranked): Seq[Ranked] =
    if (buf.length == k && !lt(x, buf(buf.length - 1))) buf
    else merge(buf, Seq(x))

  override def merge(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] = {
    // bounded merge of two sorted lists
    val out = scala.collection.mutable.ArrayBuffer.empty[Ranked]
    var (i, j) = (0, 0)
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && lt(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  override def finish(r: Seq[Ranked]): Seq[Ranked] = r

  override def bufferEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
  override def outputEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ranked]]()
}

object TopKAgg {
  /** Aggregation column over any (value, id) column pair (a product
    * input encoder binds one argument per Ranked field). */
  def udafColumn(k: Int, value: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[Ranked])
      .apply(value, id)
}
