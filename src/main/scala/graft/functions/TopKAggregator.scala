package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One ranked entry: `rank` orders DESCENDING (bigger first); `(id, sub)`
  * break ties ASCENDING so the top-k set is total-ordered and therefore
  * deterministic across partitionings.
  */
case class RankedEntry(rank: Double, id: Long, sub: Long)

/** Typed top-k aggregator with BOUNDED per-group state: the accumulator
  * never holds more than k entries, on the map side or the reduce side.
  *
  * Why this exists next to `Relational.topKPerGroup` (window row_number):
  * the window form must co-locate EVERY row of a group before ranking —
  * the shuffle carries the full table (rank-limit pushdown trims
  * partitions, but only after a sort). This aggregator is a true partial
  * aggregate: each map task reduces its slice to ≤ k entries per group, so
  * the shuffle carries at most `k × groups × tasks` rows regardless of
  * input size — the right shape when groups are huge and k is small
  * (top-3 documents per cluster over 100 TB). It is the Spark-idiomatic
  * expression of a bounded-heap "top-N per key" operator, running as
  * `ObjectHashAggregate` with map-side combine.
  *
  * Determinism: entries are totally ordered (rank DESC, id ASC, sub ASC),
  * so reduce/merge order cannot change the result. The rank comparison
  * follows SQL `ORDER BY rank DESC` semantics exactly — NaN sorts as the
  * GREATEST double (kept first, where a naive negate-and-compare would
  * evict it) and -0.0 equals 0.0 — so the result matches the
  * window-function form on every input, not just finite ranks.
  */
class TopKAggregator(k: Int)
    extends Aggregator[RankedEntry, List[RankedEntry], Seq[RankedEntry]] {
  require(k > 0, s"k must be positive, got $k")

  // SQL-faithful: java.lang.Double.compare puts NaN above +Inf; the zero
  // normalization makes -0.0 == 0.0 as SQL comparison does.
  private def normZero(d: Double): Double = if (d == 0.0d) 0.0d else d
  private val ord: Ordering[RankedEntry] = new Ordering[RankedEntry] {
    override def compare(a: RankedEntry, b: RankedEntry): Int = {
      val byRank = java.lang.Double.compare(normZero(b.rank), normZero(a.rank))
      if (byRank != 0) byRank
      else {
        val byId = java.lang.Long.compare(a.id, b.id)
        if (byId != 0) byId else java.lang.Long.compare(a.sub, b.sub)
      }
    }
  }

  override def zero: List[RankedEntry] = Nil

  override def reduce(acc: List[RankedEntry], e: RankedEntry): List[RankedEntry] =
    BoundedInsert(acc, e, k)(ord)

  override def merge(a: List[RankedEntry], b: List[RankedEntry]): List[RankedEntry] =
    b.foldLeft(a)(BoundedInsert(_, _, k)(ord))

  override def finish(acc: List[RankedEntry]): Seq[RankedEntry] = acc

  override def bufferEncoder: Encoder[List[RankedEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[RankedEntry]]()
  override def outputEncoder: Encoder[Seq[RankedEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedEntry]]()
}

/** Insert into a ≤k sorted list: O(k) per row, no allocation beyond the
  * list cells — the accumulator is the bounded "heap". ONE copy shared
  * by [[TopKAggregator]] and [[WeightedSampleAggregator]] (they differed
  * only in the Ordering), so a future improvement — e.g. an early-exit
  * compare against a full accumulator's tail — lands in both.
  */
private[functions] object BoundedInsert {
  def apply[A](acc: List[A], e: A, k: Int)(ord: Ordering[A]): List[A] = {
    val (before, after) = acc.span(x => ord.lt(x, e))
    val merged = before ::: (e :: after)
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }
}
