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

  /** Incremental JOIN maintenance — the classic view-maintenance algebra
    * (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ A⋈ΔB ∪ ΔA⋈B ∪ ΔA⋈ΔB applied to the
    * daily-batch economics: `oldResult` is yesterday's PERSISTED join
    * (never recomputed, never even rescanned beyond the union), and the
    * three delta terms each have at least one O(|Δ|) side — typically
    * broadcastable — so maintenance cost scales with the delta, not the
    * corpus. This is the q112 (aggregate) / q135 (dedup) / q142 (ANN
    * index) incremental pattern for the remaining big-state operator:
    * materialized JOINS. Insert-only deltas (append-only feeds); pair
    * with `snapshotDiff` upstream when updates must first be split into
    * retract+insert.
    */
  def deltaJoin(oldResult: DataFrame, oldA: DataFrame, deltaA: DataFrame,
      oldB: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame =
    oldResult
      .unionByName(oldA.join(deltaB, keys))
      .unionByName(deltaA.join(oldB, keys))
      .unionByName(deltaA.join(deltaB, keys))

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two ranked
    * retrieval lists — the standard hybrid-search combiner (lexical BM25 +
    * embedding cosine) because it needs NO score calibration between the
    * systems: each list contributes 1/(kConst + rank), items missing from
    * a list contribute 0, and kConst (=60 in the literature) damps the
    * head. One full-outer join on (query, id) + one window — both keyed on
    * the query id, so fusion cost is |lists|, independent of corpus size.
    * The fused score is a fixed two-term IEEE sum of exact rationals —
    * deterministic, engine-portable.
    */
  def rrfFuse(listA: DataFrame, listB: DataFrame, queryCol: String,
      idCol: String, rankACol: String, rankBCol: String, kConst: Int,
      k: Int): DataFrame = {
    val fused = listA.join(listB, Seq(queryCol, idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kConst) + col(rankACol)), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kConst) + col(rankBCol)), lit(0.0)), 6))
    topKPerGroup(fused, Seq(col(queryCol)),
        Seq(col("rrf").desc, col(idCol).asc), k, "rank")
      .select(col(queryCol), col(idCol),
        col("rank").cast("long").as("rank"), col("rrf"))
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

  /** Slowly-changing-dimension type 2: turn a history of per-key snapshots
    * into validity intervals. Each key's rows are ordered by `eventTime`
    * (ties broken by `tieBreak` — the order MUST be total within a key for
    * the intervals to be deterministic) and annotated with `version`
    * (1-based), `valid_from` (= the row's event time), `valid_to` (= the
    * NEXT version's event time, null on the latest) and `is_current`.
    *
    * One window over the key — a single shuffle on the key column(s), each
    * key's history sorted locally within its partition. No self-join: the
    * lead() formulation scales linearly where the classic
    * `a JOIN a ON a.v+1 = b.v` doubles the scan and shuffles twice.
    */
  def scd2(df: DataFrame, keys: Seq[String], eventTime: String,
      tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(eventTime) +: tieBreak.map(col)).map(_.asc): _*)
    df.withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(eventTime))
      .withColumn("valid_to", lead(col(eventTime), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Z-order (Morton) value: bit-interleave the low `bits` bits of each
    * column (column j contributes bit i to output position `i*k + j`), so
    * rows close in EVERY dimension are close in the one-dimensional sort
    * order. Sorting/range-partitioning a table by this value co-locates
    * multi-dimensional neighborhoods in the same files, which turns
    * per-file min/max statistics into effective data-skipping for
    * predicates on ANY interleaved dimension — the layout trick behind
    * Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain codegen'd column.
    *
    * Pure bit arithmetic (shifts + masks summed over disjoint bit
    * positions), entirely inside whole-stage codegen; engine-portable to
    * the DuckDB oracle as the same shift/mask sum. Caller quantizes
    * non-integral dimensions first; values must be non-negative.
    */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderValue needs at least one column")
    val k = cols.size
    // bits.toLong: an Int product could wrap negative and bypass the check
    require(bits > 0 && bits.toLong * k <= 63,
      s"bits*cols must fit a positive long, got $bits*$k")
    cols.zipWithIndex.flatMap { case (c, j) =>
      val long = c.cast("long")
      (0 until bits).map(i =>
        shiftleft(shiftright(long, i).bitwiseAND(lit(1L)), i * k + j))
    }.reduce(_ + _) // summing disjoint bit positions == bitwise OR
  }

  /** Blocked fuzzy self-match (entity resolution): candidate pairs share a
    * cheap `blockKey` (phonetic code, token, length band…) and survive if
    * their full strings are within `maxDist` edits. Returns
    * (id_a, id_b, txt_a, txt_b, dist) with id_a < id_b.
    *
    * The equi-join on the block key is the same bucketing idea as LSH
    * banding (Dedup.candidatePairs): quadratic work happens inside a
    * block, never across the corpus, so recall is a function of blocking
    * quality and cost is Σ|block|². `levenshtein` is a native codegen'd
    * expression — the distance filter runs inside the join's generated
    * loop, no UDF fence. Pick block keys so the hottest block stays
    * task-sized; layer multiple blockings (union + distinct) to trade
    * cost for recall.
    */
  def fuzzyMatch(df: DataFrame, idCol: String, textCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    // the LevenshteinBandRule rewrite (length-band prefilter + thresholded
    // early-exit DP) applies to the dist cutoff below
    graft.plans.GraftRules.register(df.sparkSession)
    val t = df.select(blockKey.as("_blk"), col(idCol).as("id"),
      col(textCol).as("txt"))
    val a = t.select(col("_blk"), col("id").as("id_a"), col("txt").as("txt_a"))
    val b = t.select(col("_blk"), col("id").as("id_b"), col("txt").as("txt_b"))
    a.join(b, Seq("_blk")).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("txt_a"), col("txt_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("txt_a"), col("txt_b"),
        col("dist").cast("long").as("dist"))
  }

  /** RELATIONAL DIVISION (Codd's ÷): the `a`-groups of `dividend` related
    * to EVERY row of `divisor` — "suppliers who stock ALL these parts",
    * "parts ordered under ALL priorities". The one classical operator SQL
    * never got a keyword for; the textbook double-NOT-EXISTS formulation
    * hides a nested anti-join pair the optimizer rarely unnests, so this
    * plans the counting formulation instead: distinct (a, b) pairs
    * restricted to divisor b's, grouped by a, kept where the per-group
    * distinct-b count equals the divisor's count. Two hash aggregates and
    * one equi-join; the divisor count rides along as a broadcast
    * single-row frame (no driver action, stays one lazy plan).
    *
    * Empty divisor follows the algebra: division by ∅ returns ALL
    * distinct `a` groups (vacuous truth), via a plan-level branch that
    * is empty whenever the divisor isn't.
    */
  def divide(dividend: DataFrame, aCols: Seq[String], bCols: Seq[String],
      divisor: DataFrame): DataFrame = {
    require(aCols.nonEmpty && bCols.nonEmpty,
      "divide needs at least one group column and one divisor column")
    val dv = divisor.select(bCols.map(col): _*).distinct()
    val total = broadcast(dv.agg(count(lit(1)).as("_total")))
    val full = dividend
      .select((aCols ++ bCols).map(col): _*).distinct()
      .join(dv, bCols) // b's outside the divisor don't count toward it
      .groupBy(aCols.map(col): _*).agg(count(lit(1)).as("_n"))
      .crossJoin(total)
      .filter(col("_n") === col("_total"))
      .select(aCols.map(col): _*)
    val vacuous = dividend.select(aCols.map(col): _*).distinct()
      .crossJoin(total).filter(col("_total") === 0)
      .select(aCols.map(col): _*)
    full.unionByName(vacuous)
  }

  /** SORTED-NEIGHBORHOOD entity-resolution blocking (Hernández &
    * Stolfo 1995, the merge/purge method): sort all records by a
    * similarity-preserving key and compare only records within `w`
    * positions of each other — O(n·w) comparisons instead of the
    * quadratic all-pairs, and unlike equality blocking ([[fuzzyMatch]]'s
    * `_blk`) it tolerates typos in the BLOCK KEY itself, because sort
    * order keeps near-misses adjacent rather than sending them to
    * different blocks.
    *
    * Scale shape: the global rank comes from range-sort +
    * `zipWithIndex` ([[graft.operators.IngestOps.globalSequence]] — no
    * single-partition window), and the neighborhood join is an
    * EQUI-join on rank buckets of width `w`: a pair at distance ≤ w
    * spans at most adjacent buckets, so the lower side fans out to
    * (bucket, bucket+1) and each qualifying pair meets in EXACTLY one
    * bucket (the upper rank's) — no distinct needed, no range join, no
    * skew beyond the key distribution itself. Candidates are verified
    * with `levenshtein(txt) <= maxDist` under the LevenshteinBandRule
    * rewrite (length-band prefilter + early-exit DP).
    *
    * Returns (id_a, id_b, txt_a, txt_b, dist) with id_a/id_b ordered by
    * rank (sort position), one row per verified pair.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, textCol: String,
      sortKey: Column, w: Int, maxDist: Int): DataFrame = {
    require(w >= 1, s"window w must be positive, got $w")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    graft.plans.GraftRules.register(df.sparkSession)
    // (sortKey, id) is total because id is unique — rank is deterministic
    val ranked = IngestOps.globalSequence(
      df.select(col(idCol).as("id"), col(textCol).as("txt"),
        sortKey.as("_sk")),
      Seq(col("_sk"), col("id")), "_rnk")
    val lower = ranked.select(col("id").as("id_a"), col("txt").as("txt_a"),
        col("_rnk").as("_ra"),
        explode(array(floor(col("_rnk") / w),
          floor(col("_rnk") / w) + 1)).as("_bkt"))
    val upper = ranked.select(col("id").as("id_b"), col("txt").as("txt_b"),
      col("_rnk").as("_rb"), floor(col("_rnk") / w).as("_bkt"))
    lower.join(upper, Seq("_bkt"))
      .filter(col("_rb") > col("_ra") && col("_rb") <= col("_ra") + w)
      .withColumn("dist", levenshtein(col("txt_a"), col("txt_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("txt_a"), col("txt_b"),
        col("dist").cast("long").as("dist"))
  }

  /** MERGE-style upsert: apply a changeset to a base table by key. Rows
    * present only in `changes` are inserts, present in both take the
    * change row WHOLESALE (row-level replacement — a change row's null is
    * an intentional null, never backfilled from base), present only in
    * base are kept. The `action` column tags each output row
    * insert/update/keep so downstream audit/CDC consumers don't re-derive
    * it. Schemas must match on name.
    *
    * Physical shape: one full-outer sort-merge join on the key — each side
    * shuffles once. Presence is detected via per-side indicator literals,
    * not data-column nullness, so all-null change rows still count as
    * present. At warehouse scale the changeset is usually ≪ base; the
    * outer-both-sides semantics rule out a broadcast, but AQE's skew
    * handling applies, and partitioned/bucketed base tables co-locate the
    * join. This is the batch analogue of Delta/Iceberg MERGE INTO —
    * including its multiple-match rule: a changeset with two rows for one
    * key would silently DUPLICATE that key in the output, so by default a
    * plan-level guard (window count + assert_true, no eager job; one
    * extra shuffle of the small changeset) fails the job loudly instead.
    * Pass `validateChanges = false` when the changeset is already proven
    * key-unique upstream.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame, key: String,
      validateChanges: Boolean = true): DataFrame = {
    require(base.columns.sorted.sameElements(changes.columns.sorted),
      s"schemas must match: base=${base.columns.toSeq.sorted} " +
        s"changes=${changes.columns.toSeq.sorted}")
    val others = base.columns.filter(_ != key).toSeq
    val checked =
      if (!validateChanges) changes
      else {
        // collision-proof internal name: a data column named "_dup" must
        // survive the guard untouched
        val dupCol = Iterator.from(0).map(i => s"_graft_dup$i")
          .find(!changes.columns.contains(_)).get
        changes
          .withColumn(dupCol, count(lit(1)).over(Window.partitionBy(col(key))))
          .filter(coalesce(assert_true(col(dupCol) === 1,
            lit(s"mergeUpsert: changeset has multiple rows for a '$key' value — " +
              "MERGE semantics require at most one change row per key")),
            lit(true)))
          .drop(dupCol)
      }
    val b = base.select((col(key) +: others.map(c => col(c).as(s"_b_$c"))) :+
      lit(1).as("_b_present"): _*)
    val c = checked.select((col(key) +: others.map(n => col(n).as(s"_c_$n"))) :+
      lit(1).as("_c_present"): _*)
    b.join(c, Seq(key), "full_outer")
      .select((col(key) +:
        others.map(n => when(col("_c_present").isNotNull, col(s"_c_$n"))
          .otherwise(col(s"_b_$n")).as(n))) :+
        when(col("_b_present").isNull, "insert")
          .when(col("_c_present").isNull, "keep")
          .otherwise("update").as("action"): _*)
  }

  /** Unordered co-occurring item pairs: for each group, every pair of
    * DISTINCT items seen together, counted by the number of groups
    * containing the pair. Returns (item_a, item_b, n_groups) with
    * item_a < item_b.
    *
    * Shape: ONE groupBy collects each group's distinct item set (map-side
    * partial collect_set, shuffle carries one set per group), then pairs
    * are generated ROW-LOCALLY from the sorted array (posexplode ×
    * slice-explode), and a second groupBy counts pairs. Compare the naive
    * `t JOIN t ON group` formulation: that shuffles the fact table TWICE
    * and materializes Σk² join rows through the exchange; here the pair
    * fan-out happens after the shuffle, from an array already in memory.
    * Within a group each unordered pair occurs exactly once (set + sort),
    * so count(*) ≡ count(DISTINCT group).
    *
    * Skew: a single group with k items fans out k(k-1)/2 pairs in one
    * task. Fine for bounded carts/orders (k ≤ dozens); for unbounded
    * groups cap upstream (filter size(set)) or fall back to a salted
    * pair join.
    */
  /** CDC between two snapshots of a keyed table: one full-outer sort-merge
    * join on the keys, classifying each key as insert (new only), delete
    * (old only), or update (both sides present, any compare column
    * null-safely different); unchanged keys are dropped. Presence is
    * tracked with explicit `_in_old`/`_in_new` markers, so null compare
    * values never masquerade as missing rows. Returns
    * (keys..., old_<c>..., new_<c>..., change_type) — the changeset shape
    * [[mergeUpsert]] consumes and [[applyAggDelta]] folds into aggregates.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs at least one key and one compare column")
    val o = oldSnap.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("_in_old"): _*)
    val n = newSnap.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("_in_new"): _*)
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_in_old").isNull, "insert")
          .when(col("_in_new").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .drop("_in_old", "_in_new")
  }

  /** Incremental view maintenance for a (group, n_rows, sum_val) aggregate:
    * fold a [[snapshotDiff]] changeset into the stored aggregate WITHOUT
    * rescanning the base table — deletes/update-olds contribute (-1, -v)
    * to their OLD group, inserts/update-news (+1, +v) to their NEW group
    * (so updates that move a row between groups maintain both sides), and
    * groups whose count reaches zero vanish exactly as a recompute would
    * drop them. Cost: O(|changes| + |groups|), never O(|base|) — at 100 TB
    * the base is re-read never, the aggregate table always.
    */
  def applyAggDelta(baseAgg: DataFrame, diff: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    // each diff row expands ROW-LOCALLY into its ≤2 signed delta rows (the
    // old group loses the row, the new group gains it) — one explode, so
    // the changeset lineage executes ONCE; a filter-union of +/- branches
    // would replay the (expensive) diff join per branch
    val deltas = diff.select(explode(array(
        when(col("change_type").isin("delete", "update"),
          struct(col(s"old_$groupCol").as(groupCol), lit(-1L).as("_n"),
            (-col(s"old_$valueCol")).as("_s"))),
        when(col("change_type").isin("insert", "update"),
          struct(col(s"new_$groupCol").as(groupCol), lit(1L).as("_n"),
            col(s"new_$valueCol").as("_s"))))).as("d"))
      .filter(col("d").isNotNull)
      .select(col(s"d.$groupCol"), col("d._n"), col("d._s"))
    baseAgg
      .select(col(groupCol), col("n_rows").cast("long").as("_n"),
        col("sum_val").cast("long").as("_s"))
      .unionByName(deltas)
      .groupBy(col(groupCol))
      .agg(sum(col("_n")).as("n_rows"), sum(col("_s")).as("sum_val"))
      .filter(col("n_rows") > 0)
  }

  /** Exclusive distributed running MIN over a globally-ordered column —
    * the segmented-scan construction `EventTime.globalRunningSum` uses for
    * sums, with min as the combine and an EXCLUSIVE frame (each row sees
    * the min of everything strictly before it; the first row sees
    * Long.MaxValue). Range-partition + local sort, pass 1 collects P
    * partition minima (P longs, not rows), their exclusive scan is
    * broadcast back as pass 2's per-partition seed. `orderCol` values must
    * be unique (pre-aggregate duplicates first). Returns
    * (orderCol, valueCol, prefix_min).
    */
  def exclusiveRunningMin(df: DataFrame, orderCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .select(col(orderCol).as("_t"), col(valueCol).cast("long").as("_v"))
      .repartitionByRange(col("_t"))
      .sortWithinPartitions(col("_t"))
      .localCheckpoint() // pin ONE partitioning for both passes
    val totals = ranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        var m = Long.MaxValue
        it.foreach(r => m = math.min(m, r.getLong(1)))
        Iterator((i, m))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(
      totals.scanLeft(Long.MaxValue)(math.min))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      ranged.schema.fields(0).copy(name = orderCol),
      org.apache.spark.sql.types.StructField(valueCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("prefix_min",
        org.apache.spark.sql.types.LongType)))
    val rows = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets.value(i)
      it.map { r =>
        val out = org.apache.spark.sql.Row(r.get(0), r.getLong(1), run)
        run = math.min(run, r.getLong(1))
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** 2-D skyline (Pareto frontier): rows not dominated on (x, y) — no other
    * row is <= on both dimensions and < on at least one. The naive form is
    * the O(n²) NOT EXISTS self-join (the oracle); the sorted form is
    * linear: a row is on the skyline iff its y equals the min y within its
    * own x group AND every strictly-smaller-x group has min y strictly
    * greater than its y. That second condition is an exclusive running min
    * over x-groups — [[exclusiveRunningMin]], so the scan parallelizes
    * across range partitions instead of funneling through one sorted task.
    * Shuffles: one (x) group-by, the range exchange, one equi-join back on
    * x. Ties on both dims are all kept (neither dominates the other).
    */
  def skyline2D(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val pts = df.select(col(idCol).as("_id"), col(xCol).cast("long").as("_x"),
      col(yCol).cast("long").as("_y"))
    val grp = pts.groupBy(col("_x")).agg(min(col("_y")).as("_gmin"))
    val scan = exclusiveRunningMin(grp, "_x", "_gmin")
    pts.join(scan, Seq("_x"))
      .filter(col("_y") === col("_gmin") && col("_y") < col("prefix_min"))
      .select(col("_id").as(idCol), col("_x").as(xCol), col("_y").as(yCol))
  }

  /** Frequent item TRIPLES by Apriori candidate generation (Agrawal &
    * Srikant, VLDB 1994): frequent pairs self-join on their first item
    * to propose (a,b,c), the third side (b,c) must itself be frequent
    * (anti-monotonicity — the prune that makes level-wise mining
    * feasible), and surviving candidates get their EXACT support from
    * three equi-joins against the distinct (group, item) instance table
    * keyed on (group, item) — never an array-containment nested loop.
    *
    * Scale shape: the candidate set after both prunes is tiny relative
    * to the data (it broadcasts into the first instance join); support
    * counting shuffles on (group ⋈ item) equi-keys only. The naive
    * 3-way basket self-join this replaces is the oracle's job.
    */
  def frequentTriples(df: DataFrame, groupCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val inst = df.select(col(groupCol).as("_g"),
      col(itemCol).cast("long").as("_it")).distinct()
    // cast BEFORE coOccurrence: its array_sort orders pairs by the column's
    // natural type, and the candidate self-join below assumes numeric order
    // — a raw string item column ('10' < '2' lexicographically) would
    // silently miss triples
    val longItems = df.withColumn(itemCol, col(itemCol).cast("long"))
    val f2 = coOccurrence(longItems, groupCol, itemCol)
      .filter(col("n_groups") >= minSupport)
      .select(col("item_a").cast("long").as("pa"),
        col("item_b").cast("long").as("pb"))
    val cand = f2.as("x")
      .join(f2.as("y"), col("x.pa") === col("y.pa") &&
        col("x.pb") < col("y.pb"))
      .select(col("x.pa").as("a"), col("x.pb").as("b"), col("y.pb").as("c"))
      .join(f2.select(col("pa").as("b"), col("pb").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    cand
      .join(inst.select(col("_g"), col("_it").as("a")), Seq("a"))
      .join(inst.select(col("_g"), col("_it").as("b")), Seq("b", "_g"))
      .join(inst.select(col("_g"), col("_it").as("c")), Seq("c", "_g"))
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val perGroup = df
      .groupBy(col(groupCol).as("_g"))
      .agg(array_sort(collect_set(col(itemCol))).as("_items"))
    perGroup
      .select(col("_items"), posexplode(col("_items")).as(Seq("_i", "item_a")))
      .select(col("item_a"),
        explode(slice(col("_items"), col("_i") + lit(2),
          size(col("_items")) - col("_i") - lit(1))).as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_groups"))
  }

  /** Per-group ordinary-least-squares fit in EXACT integer arithmetic.
    *
    * `xCol`/`yCol` must be integral; emits the sufficient statistics plus
    * the slope as the BIGINT rational `slope_num / slope_den`
    * (n·Σxy − Σx·Σy over n·Σx² − (Σx)²) — no float ever forms, so the
    * result is bit-identical across partition counts and engines, and the
    * caller divides (or compares cross-multiplied) at the precision it
    * wants. One partial-aggregated shuffle on the group key; the five Σs
    * are codegen'd running sums.
    *
    * Overflow headroom: |n·Σxy| ≤ n²·max|x|·max|y| — with day-scale x
    * (~10⁴) and cent-scale y (~10⁸), exact below ~10⁶ rows per group;
    * rescale x (e.g. days not seconds) before widening groups past that.
    */
  def olsExact(df: DataFrame, groupCols: Seq[Column], xCol: Column,
      yCol: Column): DataFrame = {
    val x = xCol.cast("long")
    val y = yCol.cast("long")
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sum_xy"), sum(x * x).as("sum_xx"))
      .select(groupCols ++ Seq(col("n"), col("sum_x"), col("sum_y"),
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).as("slope_num"),
        (col("n") * col("sum_xx") - col("sum_x") * col("sum_x")).as("slope_den")): _*)
  }

  /** ONE-PASS exact covariance-matrix sufficient statistics: for every
    * unordered pair (incl. diagonals) of the integerized `vars`, emits
    * (var_a, var_b, n, sum_a, sum_b, sum_ab) — the caller composes
    * covariance numerators (n·Σab − Σa·Σb), correlation ratios, or a Gram
    * matrix from them exactly, at whatever precision it wants. The
    * feature-correlation / redundancy screen over p metrics costs ONE scan
    * with p(p+1)/2 map-side-combined sums, one aggregated row total
    * shuffled — never p² passes, never a row-matrix collect.
    *
    * All sums are BIGINT over BIGINT-cast inputs — no float forms, so the
    * statistics are bit-identical at any parallelism ([[olsExact]]'s
    * contract, widened to a matrix). Overflow headroom: Σ|a·b| must stay
    * under 2⁶³ — scale the inputs (dollars not cents, percent not ppm)
    * so max|a|·max|b|·rows ≲ 9·10¹⁸; past that, cast the products to
    * DECIMAL(38,0) at +30% shuffle width.
    */
  def covarianceStats(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    require(vars.nonEmpty, "vars must be non-empty")
    require(vars.map(_._1).distinct.size == vars.size,
      s"duplicate var names in ${vars.map(_._1)}")
    val named = vars.map { case (n, c) => n -> c.cast("long") }
    // internal aliases are INDEX-based: name-concatenation ("_p_a_b_c")
    // would collide for distinct-but-underscore-ambiguous names like
    // ("a","b_c") vs ("a_b","c"), failing analysis on valid input
    val pairs = for {
      i <- named.indices; j <- i until named.size
    } yield (i, j)
    val aggs = named.zipWithIndex.map { case ((_, c), i) =>
      sum(c).as(s"_s_$i") } ++
      pairs.map { case (i, j) =>
        sum(named(i)._2 * named(j)._2).as(s"_p_${i}_$j") } :+
      count(lit(1)).as("_n")
    val one = df.groupBy().agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (i, j) =>
      struct(lit(named(i)._1).as("var_a"), lit(named(j)._1).as("var_b"),
        col("_n").as("n"),
        col(s"_s_$i").as("sum_a"), col(s"_s_$j").as("sum_b"),
        col(s"_p_${i}_$j").as("sum_ab"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Equi-width histogram over an integral column: `nBins` buckets spanning
    * [min, max], bin = ((v − min) · nBins) div (max − min + 1) — pure
    * integer arithmetic, so bin edges cannot drift between engines.
    *
    * Two passes: a 2-value global (min, max) aggregate broadcast into the
    * binning scan, then one aggregate on bin id — O(nBins) output rows
    * regardless of input size. Empty bins are absent (not zero-filled);
    * each emitted bin carries its actual value range, which is more
    * informative than the theoretical edges.
    */
  def equiWidthHistogram(df: DataFrame, valueCol: Column, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val v = df.select(valueCol.cast("long").as("v"))
    val mm = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    v.crossJoin(broadcast(mm))
      .select(expr(s"((v - mn) * $nBins) div (mx - mn + 1)").as("bin"), col("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  /** Exact weighted median per group: the smallest value v with
    * 2·Σ weight(≤ v) ≥ Σ weight — pure BIGINT comparisons, no float.
    *
    * Rows first collapse to (group, value) weight sums (the heavy,
    * map-side-combined shuffle), then one keyed window cumsum over the
    * distinct values finds the crossing — so the sort runs on distinct
    * values per group, not raw rows.
    */
  def weightedMedian(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      weightCol: Column): DataFrame = {
    // null values are excluded from the distribution (SQL percentile
    // semantics), mirroring exactQuantiles
    val byValue = df.filter(valueCol.isNotNull)
      .groupBy(groupCols :+ valueCol.cast("long").as("_v"): _*)
      .agg(sum(weightCol.cast("long")).as("_w"))
    val part = Window.partitionBy(groupCols: _*)
    val cum = part.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byValue
      .withColumn("_cum", sum(col("_w")).over(cum))
      .withColumn("_tot", sum(col("_w")).over(part))
      .filter(col("_cum") * 2 >= col("_tot"))
      .groupBy(groupCols: _*)
      .agg(min(col("_v")).as("wmedian"), max(col("_tot")).as("total_weight"))
  }

  /** Replay a [[snapshotDiff]] change log onto the base snapshot: deletes
    * and updates remove their old row (one left-anti on the key), inserts
    * and updates add their new values — the CDC time-travel primitive.
    * Cost is O(|base| + |changes|) with the anti-join's single key
    * shuffle; the hash match against the target snapshot proves
    * replay == snapshot (no drift, no lost or resurrected rows).
    */
  def applyChangeLog(base: DataFrame, diff: DataFrame, keyCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    val removed = diff.filter(col("change_type").isin("delete", "update"))
      .select(keyCols.map(col): _*)
    val added = diff.filter(col("change_type").isin("insert", "update"))
      .select(keyCols.map(col) ++ valCols.map(c => col(s"new_$c").as(c)): _*)
    base.join(removed, keyCols, "left_anti").unionByName(added)
  }

  /** Exact discrete quantiles per group: for each requested
    * `(name, num, den)`, the smallest value v with
    * `cum(v) · den ≥ num · total`. Null values are EXCLUDED from the
    * distribution (SQL percentile semantics — bare nulls-first ordering
    * would otherwise inflate the cumulative counts invisibly). Pure
    * BIGINT comparisons; the per-value collapse + ONE shared cumulative
    * frame serve every requested quantile (the conditional `min` ignores
    * rows below each threshold), so k quantiles cost the same shuffle and
    * sort as one. Returns one row per group with one column per name.
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      quantiles: Seq[(String, Long, Long)]): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile required")
    quantiles.foreach { case (n, num, den) =>
      require(num >= 0 && den > 0 && num <= den,
        s"quantile $n must satisfy 0 <= num/den <= 1, got $num/$den")
    }
    val byValue = df.filter(valueCol.isNotNull)
      .groupBy(groupCols :+ valueCol.cast("long").as("_v"): _*)
      .agg(count(lit(1)).as("_w"))
    val part = Window.partitionBy(groupCols: _*)
    val cum = part.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aggs = quantiles.map { case (name, num, den) =>
      min(when(col("_cum") * den >= col("_tot") * num, col("_v"))).as(name)
    }
    byValue
      .withColumn("_cum", sum(col("_w")).over(cum))
      .withColumn("_tot", sum(col("_w")).over(part))
      .groupBy(groupCols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group EQUI-DEPTH histogram: bin edges at the exact type-1
    * i/nBins quantiles ([[exactQuantiles]] — BIGINT data values, no
    * interpolated floats), every row assigned to
    * bin = #{edges strictly below it}, then (count, lo, hi) per bin.
    * The complement of [[equiWidthHistogram]]: equal POPULATION per bin
    * instead of equal width — the histogram an optimizer/skew detector
    * actually wants (a hot key shows up as a bin whose lo == hi).
    *
    * Scale shape: the edge table is O(groups · nBins) and broadcast; bin
    * assignment is a row-local sum of comparisons inside codegen, and
    * the final aggregate partial-aggregates map-side. The quantile pass
    * itself windows over DISTINCT (group, value) pairs, not rows.
    */
  def equiDepthHistogram(df: DataFrame, groupCol: Column, valueCol: Column,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 64, s"nBins must be in [2, 64], got $nBins")
    val base = df.select(groupCol.as("_g"), valueCol.cast("long").as("_v"))
      .filter(col("_v").isNotNull)
    val qs = (1 until nBins).map(i => (s"_e$i", i.toLong, nBins.toLong))
    val edges = exactQuantiles(base, Seq(col("_g")), col("_v"), qs)
    val binExpr = (1 until nBins)
      .map(i => when(col("_v") > col(s"_e$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    base.join(broadcast(edges), Seq("_g"))
      .withColumn("bin", binExpr)
      .groupBy(col("_g"), col("bin"))
      .agg(count(lit(1)).as("n_rows"), min(col("_v")).as("lo"),
        max(col("_v")).as("hi"))
      .select(col("_g").as("group"), col("bin"), col("n_rows"),
        col("lo"), col("hi"))
  }

  /** Single-quantile convenience form of [[exactQuantiles]] (`q_value`). */
  def exactQuantile(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      num: Long, den: Long): DataFrame =
    exactQuantiles(df, groupCols, valueCol, Seq(("q_value", num, den)))

  /** Per-group mode (most frequent value) with a deterministic tie-break:
    * among equally-frequent values the smallest wins. Two hash aggregates
    * (rows → per-value counts → per-group argmax); the second operates on
    * distinct (group, value) pairs only, so the heavy shuffle is the first
    * — and it partial-aggregates map-side.
    */
  def modeExact(df: DataFrame, groupCols: Seq[Column], valueCol: Column): DataFrame = {
    val counts = df.groupBy(groupCols :+ valueCol.as("mode_value"): _*)
      .agg(count(lit(1)).as("n_occurrences"))
    // asc_nulls_last: SQL ORDER BY ... ASC puts nulls last (the oracle
    // form), while Spark's bare .asc puts them first — a null tying with a
    // real value must lose the tie-break in both engines
    topKPerGroup(counts, groupCols,
      Seq(col("n_occurrences").desc, col("mode_value").asc_nulls_last), 1, "_rnk")
      .drop("_rnk")
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

  /** Item-based collaborative-filtering top-k (Sarwar et al., WWW 2001;
    * the Amazon item-to-item shape): `owned` is the distinct (user, item)
    * interaction set, `coEdges` the canonical co-occurrence relation
    * (item_a < item_b, integer weight). Each user's candidate items are
    * the co-neighbors of items they already hold, scored by the INTEGER
    * sum of co-occurrence weights over their held items (plus the count
    * of distinct held items contributing — the support), already-held
    * items anti-joined away, top-k per user by (score desc, item asc).
    * All-integer scoring → bit-identical at any parallelism.
    *
    * Scale shape: candidates form by ONE equi-join of the interaction set
    * against the symmetric co-edge list on the held item — fan-out is
    * Σ_held deg(item), the same bounded wedge economics as
    * [[graft.operators.Graph.linkPredictRA]] (cap hub items upstream via
    * a weight floor when degrees skew). Then one (user, candidate)
    * aggregate, one anti-join on the same key pair, and the rank-pushdown
    * top-k window. No driver data, no cartesian anywhere.
    */
  def itemCfRecommend(owned: DataFrame, userCol: String, itemCol: String,
      coEdges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val held = owned
      .select(col(userCol).cast("long").as("user"),
        col(itemCol).cast("long").as("item")).distinct()
    val sym = coEdges.select(col("item_a").as("item"),
        col("item_b").as("cand"), col("n_groups").as("w"))
      .union(coEdges.select(col("item_b").as("item"),
        col("item_a").as("cand"), col("n_groups").as("w")))
    val scored = held.join(sym, Seq("item"))
      .groupBy(col("user"), col("cand").as("item"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_sources"))
      .join(held, Seq("user", "item"), "left_anti")
    topKPerGroup(scored, Seq(col("user")),
        Seq(col("score").desc, col("item").asc), k, "rnk")
      .select(col("user"), col("item"), col("score"), col("n_sources"),
        col("rnk").cast("long").as("rnk"))
  }
}
