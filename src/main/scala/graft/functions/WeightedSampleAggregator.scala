package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One sampling candidate: `h` is the item's 60-bit deterministic hash
  * draw (the md5-derived "uniform"), `w` its positive sampling weight,
  * `id` the item id (tie-break + payload key).
  */
case class WeightedItem(h: Long, w: Long, id: Long)

/** Deterministic weighted sampling WITHOUT replacement (bottom-k /
  * priority sampling, Duffield–Lund–Thorup): keep the k items with the
  * SMALLEST h/w — an item with twice the weight effectively halves its
  * draw, so inclusion probability rises with weight, and because `h` is a
  * hash (not an RNG) the sample is a pure function of the data: stable
  * across runs, partitionings, and retries. This is the corpus-
  * subsampling primitive behind mixture-weighted training-data selection
  * (pair with q77's mixture weights): ONE pass, bounded state, no global
  * sort.
  *
  * The ranking h_a/w_a < h_b/w_b is decided EXACTLY by 128-bit cross
  * multiplication (`Math.multiplyHigh` + unsigned-low compare) — no
  * float ever forms, so there is no precision cliff where two near-equal
  * rationals compare differently on different merge orders. Residual
  * exact ties (h_a·w_b == h_b·w_a) break on id ascending, making the
  * sample total-ordered and therefore partition-invariant.
  *
  * Same bounded-state shape as [[TopKAggregator]]: the accumulator never
  * exceeds k entries on either the map or reduce side, so the shuffle
  * carries ≤ k × tasks rows regardless of input size — at 100 TB the
  * sample of a trillion-row corpus moves k rows per map task and nothing
  * else.
  */
class WeightedSampleAggregator(k: Int)
    extends Aggregator[WeightedItem, List[WeightedItem], Seq[WeightedItem]] {
  require(k > 0, s"k must be positive, got $k")

  /** Exact sign of (a.h/a.w − b.h/b.w): compare a.h·b.w with b.h·a.w in
    * 128 bits. Operands are non-negative longs (h is 60-bit, w positive),
    * so the signed high-word from multiplyHigh is the true high word.
    */
  private def cmpRational(a: WeightedItem, b: WeightedItem): Int = {
    val hiA = Math.multiplyHigh(a.h, b.w)
    val hiB = Math.multiplyHigh(b.h, a.w)
    val byHi = java.lang.Long.compare(hiA, hiB)
    if (byHi != 0) byHi
    else java.lang.Long.compareUnsigned(a.h * b.w, b.h * a.w)
  }

  private val ord: Ordering[WeightedItem] = new Ordering[WeightedItem] {
    override def compare(a: WeightedItem, b: WeightedItem): Int = {
      val byR = cmpRational(a, b)
      if (byR != 0) byR else java.lang.Long.compare(a.id, b.id)
    }
  }

  override def zero: List[WeightedItem] = Nil

  override def reduce(acc: List[WeightedItem], e: WeightedItem): List[WeightedItem] = {
    // a zero/negative weight has no defined inclusion probability — fail
    // loudly rather than silently rank it as "sample me first"
    require(e.w > 0 && e.h >= 0,
      s"weighted sample needs w > 0 and h >= 0, got w=${e.w} h=${e.h} id=${e.id}")
    BoundedInsert(acc, e, k)(ord)
  }

  override def merge(a: List[WeightedItem], b: List[WeightedItem]): List[WeightedItem] =
    b.foldLeft(a)(BoundedInsert(_, _, k)(ord))

  override def finish(acc: List[WeightedItem]): Seq[WeightedItem] = acc

  override def bufferEncoder: Encoder[List[WeightedItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[WeightedItem]]()
  override def outputEncoder: Encoder[Seq[WeightedItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WeightedItem]]()
}
