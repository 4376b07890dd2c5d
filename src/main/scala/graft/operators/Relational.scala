package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks beyond the reference's surface — the pieces a
  * complete analytics engine needs (joins, top-k per group, set ops are
  * Catalyst built-ins; these helpers standardize the scalable idiom).
  */
object Relational {

  /** Top-k rows per group. Window row_number over (partition, order) — the
    * shuffle is on the group key only, and with rank pushdown
    * (spark.sql.optimizer.windowGroupLimitThreshold, on by default) each
    * partition keeps only k rows before the exchange, so this scales to
    * arbitrarily many groups. `order` must be total within a group for
    * determinism (append a unique tie-break).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], order: Seq[Column],
      k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Skew-resistant equi-join: salt the probe (left) side into `buckets`
    * sub-keys via a hash of its full row, and replicate the build (right)
    * side across every bucket value, so one hot key's rows spread over
    * `buckets` reducers instead of one. Row-identical to
    * `left.join(right, keys)` — only the physical distribution changes.
    * Use when a hot key dwarfs the rest and AQE's skew split doesn't apply
    * (it only rewrites sort-merge joins); cost is `buckets`× replication of
    * the right side, so keep the right side the smaller input.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.toSeq.map(col): _*), lit(buckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Skew-aware lookup join for Zipf-distributed keys: the `hotCount`
    * heaviest lookup rows (by `weightCol` — for a term-frequency table the
    * frequency IS the big side's key skew) join BROADCAST map-side, so the
    * shuffle never carries a hot key's rows; the cold remainder is a
    * normal keyed join. Row-identical to `big.join(lookup, key)` (inner) —
    * duplicate lookup keys included, since hotness is chosen per KEY —
    * only the physical distribution changes. With duplicate keys the
    * broadcast carries every row of the hot keys; size it accordingly.
    *
    * Complements `saltedJoin`: salting spreads a hot key over N reducers
    * but still shuffles every row; hot/cold removes the hot rows from the
    * shuffle entirely, at the cost of scanning `big` twice (both scans are
    * codegen'd column-pruned passes; the anti filter against the tiny hot
    * key set is itself broadcast). Use when hotness lives in a bounded
    * head (Zipf); `hotCount` caps the broadcast at `hotCount` KEYS.
    *
    * `maxHotRows >= 0` opts into a broadcast-size guard (duplicate lookup
    * keys can multiply rows past what `hotCount` suggests): ONE aggregate
    * job on the small lookup side both picks the hot keys and sums their
    * exact row counts, failing fast with a clear message instead of letting
    * the broadcast blow past executor/driver limits at runtime. The
    * collected key set is re-used as a local relation, so the guard job is
    * the only extra work. The default (-1) keeps the builder fully lazy —
    * no Spark job runs until the result is acted on.
    */
  def hotColdJoin(big: DataFrame, lookup: DataFrame, key: String,
      weightCol: String, hotCount: Int,
      maxHotRows: Long = -1L): DataFrame = {
    require(hotCount > 0, s"hotCount must be positive, got $hotCount")
    // hotness is decided at KEY granularity (max weight per key), never by
    // a row limit that could cut through a duplicate key's row group and
    // silently drop its remaining matches from both the hot and cold side
    val ranked = lookup.groupBy(col(key))
      .agg(max(col(weightCol)).as("_w"), count(lit(1)).as("_c"))
      .orderBy(col("_w").desc, col(key).asc).limit(hotCount)
    val hotKeys =
      if (maxHotRows < 0) ranked.select(col(key))
      else {
        val top = ranked.select(col(key), col("_c")).collect()
        val hotRows = top.iterator.map(_.getLong(1)).sum
        require(hotRows <= maxHotRows,
          s"hotColdJoin: hot side has $hotRows rows (> maxHotRows=" +
            s"$maxHotRows) across $hotCount hot keys — duplicate-key " +
            "blowup; lower hotCount or use saltedJoin for this lookup table")
        val spark = lookup.sparkSession
        val keySchema = org.apache.spark.sql.types.StructType(
          Seq(lookup.schema(key)))
        spark.createDataFrame(
          java.util.Arrays.asList(
            top.map(r => org.apache.spark.sql.Row(r.get(0))): _*),
          keySchema)
      }
    val hot = lookup.join(broadcast(hotKeys), Seq(key), "left_semi")
    val hotSide = big.join(broadcast(hot), Seq(key))
    val coldSide = big.join(broadcast(hotKeys), Seq(key), "left_anti")
      .join(lookup.join(broadcast(hotKeys), Seq(key), "left_anti"), Seq(key))
    hotSide.unionByName(coldSide)
  }

  /** Tagged disjoint comparison of two keyed sets: rows in both, only left,
    * only right. Three hash-aggregated branches over the same two inputs;
    * Catalyst reuses the exchange across branches.
    */
  def setCompare(a: DataFrame, b: DataFrame, tagCol: String = "tag"): DataFrame = {
    val both = a.intersect(b).withColumn(tagCol, lit("both"))
    val onlyA = a.except(b).withColumn(tagCol, lit("left_only"))
    val onlyB = b.except(a).withColumn(tagCol, lit("right_only"))
    both.unionByName(onlyA).unionByName(onlyB)
  }
}
