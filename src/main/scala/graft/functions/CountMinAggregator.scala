package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** A Count-Min sketch: `d` hash rows × `w` counters, flattened row-major,
  * plus the exact item total. Point estimates NEVER undercount (each row's
  * counter ≥ the true count; the min over rows is still ≥ true), and
  * overcount by at most `2n/w` per row with probability ≥ 1 − 2^−d
  * (Cormode & Muthukrishnan, J. Algorithms 2005).
  */
case class CmsSketch(table: Array[Long], n: Long)

object CountMin {
  /** Row-r hash of an item into [0, w): seeded MurmurHash3 (pure JVM,
    * deterministic across processes/partitions — the same portability
    * argument as the md5-derived hashing in Curation).
    */
  def slot(item: String, r: Int, w: Int): Int =
    Math.floorMod(MurmurHash3.stringHash(item, 0x9747b28c + r), w)

  /** Point estimate: min over the d row counters — an upper bound on the
    * true count for EVERY item, under any partitioning of the input.
    */
  def estimate(table: Array[Long], d: Int, w: Int, item: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val v = table(r * w + slot(item, r, w))
      if (v < best) best = v
      r += 1
    }
    best
  }
}

/** Count-Min sketch as a typed Aggregator with FIXED-SIZE state (`d·w`
  * longs, ~64 KB at the 4×2048 default), the [[MisraGriesAggregator]]
  * discipline applied to point-frequency queries.
  *
  * Where Misra-Gries keeps a candidate LIST (enumerable, but undercounts
  * and its contents depend on merge order), Count-Min keeps a counter
  * GRID: merges are pointwise adds, so the merged sketch is EXACTLY the
  * sketch of the concatenated stream — bit-identical under any
  * partitioning — and estimates never undercount. That one-sided error is
  * the lever at 100 TB: filter token instances by `estimate ≥ T`
  * MAP-SIDE (row-local against the broadcast sketch) and every true
  * heavy hitter survives with certainty; only the surviving sliver of
  * instances reaches the exact-confirm shuffle, which then discards the
  * bounded false positives. The final answer equals the plain
  * GROUP BY/HAVING oracle — deterministically, not just in expectation.
  */
class CountMinAggregator(d: Int, w: Int)
    extends Aggregator[String, CmsSketch, CmsSketch] {
  require(d >= 1 && d <= 16, s"need 1 <= d <= 16 hash rows, got $d")
  require(w >= 16, s"need w >= 16 counters per row, got $w")

  override def zero: CmsSketch = CmsSketch(new Array[Long](d * w), 0L)

  override def reduce(acc: CmsSketch, item: String): CmsSketch = {
    // a null item is absent, not a key: skip it rather than NPE inside
    // the hash — the query side (CmsEstimate) maps null to NULL, and the
    // MG aggregator tolerates the same input, so the build side must too
    if (item == null) return acc
    var r = 0
    while (r < d) {
      acc.table(r * w + CountMin.slot(item, r, w)) += 1L
      r += 1
    }
    CmsSketch(acc.table, acc.n + 1L)
  }

  override def merge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    val t = a.table
    var i = 0
    while (i < t.length) { t(i) += b.table(i); i += 1 }
    CmsSketch(t, a.n + b.n)
  }

  override def finish(acc: CmsSketch): CmsSketch = acc

  override def bufferEncoder: Encoder[CmsSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CmsSketch]()

  override def outputEncoder: Encoder[CmsSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CmsSketch]()
}
