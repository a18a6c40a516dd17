package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary — the frequent-items analog of
  * [[KmvAgg]]: a MERGEABLE, bounded (≤ k entries) counter map that
  * finds every item with frequency > n/(k+1) without a full groupBy
  * over the key space (at 100 TB, "what are the hot tokens/URLs" must
  * not pay a vocabulary-sized shuffle; this summary's partials
  * map-side-combine and the exchange carries ≤ k·partitions rows).
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable summaries", PODS 2012): estimates never exceed true
  * counts, undercount by at most n/(k+1) total stream length, and
  * every item with true frequency > n/(k+1) is PRESENT in the final
  * summary. Counts are merge-order dependent (only the GUARANTEES are
  * deterministic), so the consuming query is a declared no-oracle row
  * — HeavyHitterSpec asserts the guarantees against exact counts
  * under multiple partitionings.
  *
  * Hot path: a present key or an open slot costs one persistent-map
  * update; the decrement step (all counters −1, zeros dropped) rebuilds
  * the k-entry map but can fire at most n/(k+1) times over any stream
  * — amortized O(1) per row (the KmvAgg allocation-discipline lesson).
  */
class MgAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all: consumes k+1 stream mass, so it fires at most
        // n/(k+1) times — the undercount budget
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything, keep the
      // positives, deterministic (count desc, token) cut on ties
      val cut = sum.valuesIterator.toArray.sorted(Ordering.Long.reverse)
        .apply(k)
      val kept = sum.collect { case (t, c) if c > cut => t -> (c - cut) }
      if (kept.size <= k) kept
      else kept.toSeq.sortBy { case (t, c) => (-c, t) }.take(k).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MgAgg {
  def udafColumn(k: Int, item: Column): Column =
    org.apache.spark.sql.functions.udaf(new MgAgg(k), Encoders.STRING)
      .apply(item)
}
