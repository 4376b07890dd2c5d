package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** A Misra-Gries frequent-items summary: at most `m` counters plus the
  * exact number of items observed. `counts` UNDERCOUNTS true frequencies
  * by at most `n / (m + 1)`, so every item with true count > n/(m+1) is
  * guaranteed to hold a counter (possibly alongside false positives —
  * which is why the query layer re-counts candidates exactly).
  */
case class MGSummary(counts: Map[String, Long], n: Long)

/** Misra-Gries heavy-hitters sketch as a typed Aggregator with BOUNDED
  * state: the accumulator never holds more than `m` counters, on the map
  * side or the reduce side (the [[TopKAggregator]] discipline applied to
  * the frequent-items problem).
  *
  * Why this exists next to a plain `groupBy(token).count`: the exact
  * count shuffles ONE ROW PER DISTINCT KEY — at 100 TB of text that is
  * billions of distinct tokens crossing the exchange to answer a
  * question whose output is a handful of frequent items. This aggregator
  * reduces each map task's slice to ≤ m counters, so the shuffle carries
  * at most `m × tasks` rows regardless of key cardinality. The candidate
  * set it emits is then confirmed by an EXACT re-count restricted to the
  * ≤ m candidate keys (broadcast semi-join), so the final answer is
  * deterministic and partitioning-invariant even though the sketch
  * contents are not.
  *
  * Guarantee (Misra-Gries 1982): a stream summary with m counters
  * undercounts any item by at most n/(m+1) — each of the ≤ n/(m+1)
  * "decrement-all" steps consumes m+1 stream items. Merging (Agarwal et
  * al., "Mergeable Summaries", PODS 2012): add counters pointwise, then
  * subtract the (m+1)-th largest value from all and drop non-positives —
  * the subtraction adds at most that round's n/(m+1) to the undercount,
  * so the bound telescopes across any merge tree. Hence after ANY
  * partitioning of the input, every item with true count > n/(m+1)
  * survives in the merged summary.
  */
class MisraGriesAggregator(m: Int)
    extends Aggregator[String, MGSummary, MGSummary] {
  require(m > 0, s"m must be positive, got $m")

  override def zero: MGSummary = MGSummary(Map.empty, 0L)

  override def reduce(acc: MGSummary, item: String): MGSummary = {
    val c = acc.counts
    c.get(item) match {
      case Some(v) => MGSummary(c.updated(item, v + 1L), acc.n + 1L)
      case None if c.size < m => MGSummary(c.updated(item, 1L), acc.n + 1L)
      case None =>
        // Full and the item is new: decrement every counter (the arriving
        // item's +1 cancels against its own decrement, so it is dropped).
        MGSummary(
          c.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap, acc.n + 1L)
    }
  }

  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    val combined = b.counts.foldLeft(a.counts) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    val n = a.n + b.n
    if (combined.size <= m) MGSummary(combined, n)
    else {
      // Subtract the (m+1)-th largest counter value from all counters:
      // at most m values stay positive, and the undercount this adds is
      // covered by the merged streams' combined n/(m+1) budget.
      val sorted = combined.valuesIterator.toArray
      java.util.Arrays.sort(sorted)
      val d = sorted(combined.size - (m + 1))
      MGSummary(
        combined.view.mapValues(_ - d).filter(_._2 > 0L).toMap, n)
    }
  }

  override def finish(acc: MGSummary): MGSummary = acc

  override def bufferEncoder: Encoder[MGSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MGSummary]()
  override def outputEncoder: Encoder[MGSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MGSummary]()
}
