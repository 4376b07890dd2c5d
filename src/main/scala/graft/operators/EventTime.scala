package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Iterate._

/** Event-time windowing operators — tumbling/sliding/session over an
  * event-time column. These are thin, typed wrappers over Spark's native
  * `window`/`session_window` (already watermark-compatible in streaming);
  * the value added is a fixed output contract (start/end/n/sum) shared by
  * batch queries, the streaming pipeline, and the oracles.
  */
object EventTime {

  /** Tumbling or sliding window aggregation. One shuffle on
    * (window, keys); with slide < duration each event lands in
    * duration/slide windows (generated row-locally before the shuffle).
    */
  def windowedAgg(df: DataFrame, ts: String, duration: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "windowedAgg needs at least one aggregate")
    df.groupBy(window(col(ts), duration, slide).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start"))
      .withColumn("window_end", col("w.end"))
      .drop("w")
  }

  /** EXACT distinct-key count over a trailing `windowDays`-day window, for
    * every day that has activity. Spark's window functions cannot express
    * `COUNT(DISTINCT) OVER (RANGE ...)` at all, and the textbook
    * days×window self-join rescans every raw event W times; this
    * linearizes the problem with the SPAN trick:
    *
    * 1. dedupe to (key, active-day) pairs — at 100 TB this frame is
    *    |keys × active days|, orders of magnitude under the raw events;
    * 2. per key, each active day covers the window-end days
    *    `[day, min(day + W−1, next_active_day − 1)]` — exactly the ends
    *    where THIS activity is the key's latest in-window one, so every
    *    (key, window-end) is claimed by exactly one span;
    * 3. explode the spans (bounded by min(W, gap) rows each — a key
    *    active daily expands 1×, not W×) and count per end day.
    *
    * One distinct shuffle, one per-key window, one count shuffle; no
    * self-join, no re-scan. `dayCol` is an integral epoch-day column
    * (the q109 convention); output is (day, n_distinct) for days present
    * in the input.
    */
  def slidingDistinct(df: DataFrame, keyCol: Column, dayCol: Column,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    // NULL keys are excluded, matching COUNT(DISTINCT key) semantics —
    // .distinct() alone would keep one NULL row per active day and count
    // it as a key, one higher than any SQL oracle forever after
    val dp = df.select(keyCol.as("_k"), dayCol.cast("long").as("_day"))
      .filter(col("_k").isNotNull)
      .distinct()
    val wnd = Window.partitionBy(col("_k")).orderBy(col("_day"))
    val spans = dp
      .withColumn("_next", lead(col("_day"), 1).over(wnd))
      .withColumn("_end",
        least(col("_day") + (windowDays - 1),
          coalesce(col("_next") - 1, col("_day") + (windowDays - 1))))
    val contrib = spans
      .select(explode(sequence(col("_day"), col("_end"))).as("day"))
    contrib.groupBy(col("day"))
      .agg(count(lit(1)).as("n_distinct"))
      .join(dp.select(col("_day").as("day")).distinct(), Seq("day"),
        "left_semi")
  }

  /** Self range-join: all pairs of rows sharing `key` whose event times lie
    * within `maxGapMicros` of each other, WITHOUT a quadratic cross join.
    * The bin trick: bucket rows by floor(time / gap); a qualifying pair's
    * bins differ by at most 1, so probing each row's bin and its two
    * neighbors finds every pair exactly once (the probe hits the partner's
    * concrete bin exactly once). The join is a plain equi-join on
    * (key, bin) — shuffle-partitioned, 3× replication of one side, no
    * BroadcastNestedLoop. Pairs are emitted once with idA < idB and the
    * signed time delta.
    */
  def selfRangeJoinBinned(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, maxGapMicros: Long): DataFrame = {
    require(maxGapMicros > 0)
    val binned = df.select(col(keyCol), col(idCol),
      unix_micros(col(tsCol)).as("_us"))
      .withColumn("_bin", floor(col("_us") / maxGapMicros))
    val a = binned.select(col(keyCol), col(idCol).as("id_a"),
      col("_us").as("us_a"), col("_bin"))
    val b = binned
      .withColumn("_bin", explode(array(col("_bin") - 1, col("_bin"),
        col("_bin") + 1)))
      .select(col(keyCol), col(idCol).as("id_b"), col("_us").as("us_b"),
        col("_bin"))
    a.join(b, Seq(keyCol, "_bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= maxGapMicros)
      .select(col(keyCol), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("dt_us"))
  }

  /** Session windows per key with a fixed inactivity gap: session ends when
    * `gap` passes with no event; session end = last event + gap (Spark
    * semantics: an event at exactly session end opens a NEW session).
    * In batch mode this shuffles once on the keys then sorts within
    * partitions; in streaming it runs on the session-window state store.
    */
  def sessionize(df: DataFrame, ts: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "sessionize needs at least one aggregate")
    df.groupBy(session_window(col(ts), gap).as("w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("w.start"))
      .withColumn("session_end", col("w.end"))
      .drop("w")
  }

  /** Ordered funnel conversion: how many users performed the steps IN
    * ORDER, each strictly after the previous one. Greedy min-time
    * semantics (deterministic): a user's anchor for step k is their
    * EARLIEST qualifying event after the step k-1 anchor — the standard
    * product-analytics funnel definition. Each stage is one keyed join +
    * min-aggregate on the user key (k-1 joins total, all partial-
    * aggregated map-side); no window over the full event stream, no
    * per-user event collection.
    *
    * Returns one row per step: (step, stage, n_users), n monotonically
    * non-increasing.
    */
  def funnel(ev: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGapSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSec.forall(_ > 0),
      s"maxGapSec must be positive when set, got $maxGapSec")
    // narrow AND rename up front: internal names can never collide with
    // caller columns (a caller-owned "_t" would make the join ambiguous)
    val e = ev.select(col(userCol).as("_u"), col(typeCol).as("_k"),
      col(tsCol).as("_ts"))
    val spark = ev.sparkSession
    import spark.implicits._
    var prev: DataFrame = null
    var prevCkpt: DataFrame = null
    // per-invocation job group: the per-stage checkpoint releases below
    // drain only THIS funnel's own jobs, so a concurrent stream in the
    // same session can't stall every stage the full 2 s drain bound
    // (round-15 verdict #3)
    val releaseGroup = s"graft-funnel-${System.nanoTime()}-" +
      ProcessHandle.current().pid()
    val rows = GraftSqlShims.withJobGroup(spark, releaseGroup) {
      steps.zipWithIndex.map { case (st, i) =>
      val cur =
        if (i == 0)
          e.filter(col("_k") === st)
            .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
        else {
          // greedy strict-funnel semantics: each step anchors on the
          // EARLIEST qualifying event after the previous step's anchor;
          // with a window, "qualifying" additionally means within
          // maxGapSec of that anchor (the standard conversion-window
          // funnel — deterministic, though not the max-completion
          // matching, which would need per-user backtracking)
          val after = col("_ts") > col("_pt")
          val inWindow = maxGapSec match {
            case Some(g) => after &&
              col("_ts") <= col("_pt") + expr(s"INTERVAL $g SECONDS")
            case None => after
          }
          e.filter(col("_k") === st)
            .join(prev.select(col("_u"), col("_t").as("_pt")), Seq("_u"))
            .filter(inWindow)
            .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
        }
      // materialize each stage's anchors ONCE: every stage is read twice
      // (its own count + the next stage's join), so a lazy chain re-runs
      // stages 1..i-1 inside stage i — O(k²) joins over the full event
      // table for a k-step funnel; the checkpoint makes it O(k), each
      // stage one join deep over the |users|-sized anchor frame. The
      // final stage has no successor join, so its count runs the (one)
      // join directly instead of paying a checkpoint write.
      prev = if (i == steps.size - 1) cur else cur.ckpt()
      val n = prev.agg(count(lit(1)).cast("long")).as[Long].head()
      // stage i-1's checkpoint is now dead: its successor (stage i's
      // anchors) is materialized and its own count is taken — release
      // it so a repeated serve loop doesn't accumulate O(calls·k)
      // anchor frames in the block manager (round-14 advisor; the same
      // ContextCleaner-starvation mode exactSubstrRemoveIncremental
      // fixed). Counts are therefore taken EAGERLY here and the result
      // assembled from literals: a lazy plan reading a released
      // checkpoint would fail with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
      if (prevCkpt != null)
        GraftSqlShims.unpersistCheckpoint(prevCkpt, Some(releaseGroup))
      prevCkpt = if (i == steps.size - 1) null else prev
      ((i + 1).toLong, st, n)
      }
    }
    if (prevCkpt != null)
      GraftSqlShims.unpersistCheckpoint(prevCkpt, Some(releaseGroup))
    rows.toDF("step", "stage", "n_users")
  }

  /** Stream-stream interval join: a left row matches right rows with the
    * same `key` whose event time lies in [leftTs + lowerSec, leftTs +
    * upperSec]. Both sides get a `delay` watermark, and the join condition
    * carries the explicit time interval — TOGETHER these let Spark compute
    * a state-eviction bound on BOTH join buffers (without the interval the
    * right buffer grows forever; without watermarks outer results never
    * emit). One shuffle per side, keyed on `key`.
    *
    * `joinType` "inner" emits as matches arrive; "leftOuter" additionally
    * emits (left, null) once the right watermark passes leftTs + upperSec —
    * i.e. outer results are delayed by design, not lost (asserted in
    * `StreamingSourcesSpec`). Batch analogue: the q54 binned range join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerSec: Long, upperSec: Long,
      delay: String, joinType: String = "inner"): DataFrame = {
    require(lowerSec <= upperSec,
      s"empty interval: lower $lowerSec > upper $upperSec")
    require(Set("inner", "leftOuter").contains(joinType),
      s"unsupported interval-join type: $joinType")
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") +
          expr(s"INTERVAL $lowerSec SECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") +
          expr(s"INTERVAL $upperSec SECONDS"),
      joinType)
      // keep ONE key column (the left one — non-null even on outer rows):
      // returning both sides' `key` under the same name makes the join key
      // unusable downstream (AMBIGUOUS_REFERENCE on select/groupBy)
      .drop(col(s"r.$key"))
  }

  /** Batch gap sessionization via the lag+cumsum idiom: per key, an event
    * starts a NEW session when it is the key's first event or arrives more
    * than `gapSec` after the previous one; the running count of
    * session-start flags is the session sequence number. Same session
    * semantics as `sessionize` (session_window) but exposes a stable
    * per-key ordinal `session_seq` and exact microsecond bounds — the form
    * downstream joins want (session_window's struct key is opaque).
    *
    * All times are exact epoch MICROSECONDS (integers end-to-end; no
    * timestamp formatting or float seconds can drift between engines).
    * Tied timestamps are flag-safe: a tie never opens a session (gap 0),
    * and a tie with the key's first event yields the same session ids
    * whichever row the sort visits first.
    *
    * Scale shape: ONE shuffle on the key, then a within-partition sort for
    * the two stacked window functions (lag, running sum — same frame, one
    * sort), then a (key, session) hash aggregate. No global sort, state
    * bounded per key.
    */
  def gapSessionize(ev: DataFrame, userCol: String, tsCol: String,
      gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val w = Window.partitionBy(col("_u")).orderBy(col("_us"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagUs = lag(col("_us"), 1).over(w)
    ev.select(col(userCol).as("_u"), unix_micros(col(tsCol)).as("_us"))
      .withColumn("_new",
        when(lagUs.isNull || col("_us") - lagUs > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(run))
      .groupBy(col("_u"), col("_sid"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("_us")).as("session_start_us"),
        max(col("_us")).as("session_end_us"))
      .select(col("_u").as(userCol), col("_sid").as("session_seq"),
        col("n_events"), col("session_start_us"), col("session_end_us"),
        (col("session_end_us") - col("session_start_us")).as("duration_us"))
  }

  /** Peak interval concurrency per group (sweep line): each half-open
    * interval [start, end) contributes +1 at its start and -1 at its end;
    * the running sum of per-timestamp NET deltas is the number of
    * concurrently open intervals, and the peak is its max (earliest
    * attaining timestamp as the deterministic tie-break). The
    * per-timestamp pre-aggregation makes the half-open convention exact:
    * an interval ending at t closes before one starting at t opens, with
    * no dependence on row order among ties.
    *
    * Scale: the sweep is a keyed window — one shuffle on `groupCol`, each
    * group's timeline sorted locally. That bounds parallelism at the
    * group count; for a GLOBAL sweep (one group spanning the cluster),
    * range-partition by time and prefix-sum the per-partition totals —
    * the segmented-scan construction — rather than one giant partition.
    */
  /** GLOBAL running sum without the single-partition window anti-pattern:
    * the distributed prefix-sum (segmented scan). Rows are range-
    * partitioned and locally sorted on `orderCol`; pass 1 computes each
    * partition's local total (collected to the driver — P numbers, not
    * rows); the exclusive scan of those totals becomes each partition's
    * offset, broadcast back for pass 2's local running sums. Both passes
    * read the SAME checkpointed partitioning, so the scan is consistent.
    * `Window.orderBy` with no partition key would funnel every row
    * through one task; this keeps all P partitions busy and moves only P
    * longs through the driver.
    *
    * `orderCol` values must be unique (pre-aggregate duplicates first —
    * ties would make the within-tie running order partition-dependent).
    * Returns (orderCol, valueCol, running_sum).
    */
  def globalRunningSum(df: DataFrame, orderCol: String,
      valueCol: String): DataFrame =
    globalRunningSums(df, orderCol, Seq(valueCol))
      .withColumnRenamed(s"running_$valueCol", "running_sum")

  /** Multi-column form of [[globalRunningSum]]: one range partitioning,
    * one pair of passes, k running sums (columns `running_<name>`) — the
    * k-statistic segmented scan (e.g. the two empirical CDFs of a KS
    * test) costs the same two passes as one.
    */
  def globalRunningSums(df: DataFrame, orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must not be empty")
    val spark = df.sparkSession
    val k = valueCols.size
    // a null order value or a value that casts('long') to null would NPE
    // in the per-partition getLong far from the cause — fail loudly with
    // the column named, the sibling peak-concurrency guard
    val guarded = df.filter(coalesce(assert_true(
      col(orderCol).isNotNull &&
        valueCols.map(c => col(c).cast("long").isNotNull).reduce(_ && _),
      lit(s"globalRunningSums: null/non-numeric value in " +
        s"($orderCol, ${valueCols.mkString(", ")})")), lit(true)))
    // positional working aliases (_v0, _v1, …): deriving them from value
    // column NAMES would collide with the _t order alias for a column
    // literally named "t"
    val ranged = guarded
      .select(col(orderCol).as("_t") +:
        valueCols.zipWithIndex.map { case (c, i) =>
          col(c).cast("long").as(s"_v$i")
        }: _*)
      .repartitionByRange(col("_t"))
      .sortWithinPartitions(col("_t"))
      .localCheckpoint() // pin ONE partitioning for both passes
    val totals = ranged.rdd
      .mapPartitionsWithIndex { (i, it) =>
        val s = new Array[Long](k)
        it.foreach { r =>
          var j = 0
          while (j < k) { s(j) += r.getLong(j + 1); j += 1 }
        }
        Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(
      totals.scanLeft(new Array[Long](k)) { (acc, t) =>
        Array.tabulate(k)(j => acc(j) + t(j))
      })
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields(0).copy(name = orderCol) +:
        (valueCols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.LongType)) ++
          valueCols.map(c => org.apache.spark.sql.types.StructField(
            s"running_$c", org.apache.spark.sql.types.LongType))))
    val rows = ranged.rdd.mapPartitionsWithIndex { (i, it) =>
      val run = offsets.value(i).clone()
      it.map { r =>
        var j = 0
        while (j < k) { run(j) += r.getLong(j + 1); j += 1 }
        org.apache.spark.sql.Row.fromSeq(
          r.get(0) +: (Seq.tabulate(k)(j => r.getLong(j + 1)) ++ run.toSeq))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Peak concurrency over ONE global timeline (no grouping key to
    * partition by): the sweep-line deltas pre-aggregated per timestamp,
    * then [[globalRunningSum]] — the construction peakConcurrency's
    * Scaladoc promises for the global case. Returns a single row
    * (peak, peak_at earliest).
    */
  def globalPeakConcurrency(df: DataFrame, startCol: String,
      endCol: String): DataFrame = {
    val guarded = df.filter(coalesce(assert_true(
      col(startCol).isNotNull && col(endCol).isNotNull,
      lit(s"globalPeakConcurrency: null interval endpoint in " +
        s"($startCol, $endCol)")), lit(true)))
    val net = guarded
      .select(col(startCol).as("_t"), lit(1L).as("_d"))
      .unionByName(guarded.select(col(endCol).as("_t"), lit(-1L).as("_d")))
      .groupBy(col("_t")).agg(sum(col("_d")).as("_net"))
    val conc = globalRunningSum(net, "_t", "_net")
    val peak = conc.agg(max(col("running_sum")).as("peak"))
    conc.join(broadcast(peak),
        conc("running_sum") === peak("peak"))
      .groupBy(col("peak"))
      .agg(min(col("_t")).as("peak_at"))
      .select(col("peak"), col("peak_at"))
  }

  /** Daily gap-fill with EXACT linear interpolation per key: aggregate the
    * value column to integer cents per (key, epoch-day), build each key's
    * dense daily spine from its first to its last observed day, and fill
    * missing days by interpolating between the nearest observed neighbors.
    * The interpolation is pure BIGINT arithmetic —
    * `(prev*(next_day-d) + next*(d-prev_day)) div (next_day-prev_day)` —
    * so the result is bit-identical across engines (no float lerp drift).
    * Every spine day strictly inside [first, last] has observed neighbors
    * on both sides by construction, so the fill is total.
    *
    * Scale shape: one shuffle to the (key, day) aggregate, one keyed
    * shuffle for the min/max bounds, spine rows generated ROW-LOCALLY by
    * `sequence` + `explode` (the spine never crosses an exchange at
    * spine-size granularity), then one keyed window sort for the
    * neighbor scan. Parallelism = key count; per-key state = day span.
    *
    * Returns (keyCol, day epoch-day BIGINT, is_observed, value_cents).
    */
  def gapFillDaily(ev: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val MicrosPerDay = 86400L * 1000000L
    val daily = ev
      .select(col(keyCol).as("_k"),
        expr(s"unix_micros($tsCol) div $MicrosPerDay").as("_d"),
        floor(col(valueCol) * 100).cast("long").as("_c"))
      .groupBy(col("_k"), col("_d")).agg(sum(col("_c")).as("_obs"))
    val spine = daily.groupBy(col("_k"))
      .agg(min(col("_d")).as("_lo"), max(col("_d")).as("_hi"))
      .select(col("_k"), explode(sequence(col("_lo"), col("_hi"))).as("_d"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_d"))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    spine.join(daily, Seq("_k", "_d"), "left")
      .withColumn("_pv", last(col("_obs"), ignoreNulls = true).over(before))
      .withColumn("_pd", last(when(col("_obs").isNotNull, col("_d")),
        ignoreNulls = true).over(before))
      .withColumn("_nv", first(col("_obs"), ignoreNulls = true).over(after))
      .withColumn("_nd", first(when(col("_obs").isNotNull, col("_d")),
        ignoreNulls = true).over(after))
      .select(col("_k").as(keyCol), col("_d").as("day"),
        col("_obs").isNotNull.as("is_observed"),
        when(col("_obs").isNotNull, col("_obs"))
          .otherwise(
            expr("(_pv * (_nd - _d) + _nv * (_d - _pd)) div (_nd - _pd)"))
          .as("value_cents"))
  }

  /** Event-type transition matrix (first-order Markov counts): per key,
    * order events by (time, id) — the id tie-break makes the sequence
    * deterministic under equal timestamps — pair each event with its
    * successor via `lead`, and count (src, dst) transitions. Probabilities
    * are exact parts-per-million: `cnt * 1000000 div row_total` (integer
    * division, no float normalization to drift between engines).
    *
    * Scale shape: one shuffle on the key, a within-partition sort for the
    * single `lead` window, then a partial-aggregated (src, dst) count —
    * the transition matrix is |types|² rows regardless of event volume.
    */
  def transitions(ev: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts"), col("_id"))
    val pairs = ev
      .select(col(keyCol).as("_k"), col(typeCol).as("_t"),
        col(tsCol).as("_ts"), col(idCol).as("_id"))
      .withColumn("_next", lead(col("_t"), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col("_t").as("src_type"), col("_next").as("dst_type"))
      .agg(count(lit(1)).as("cnt"))
    val wSrc = Window.partitionBy(col("src_type"))
    pairs
      .withColumn("_tot", sum(col("cnt")).over(wSrc))
      .select(col("src_type"), col("dst_type"), col("cnt"),
        expr("cnt * 1000000 div _tot").as("ppm"))
  }

  def peakConcurrency(df: DataFrame, groupCol: String, startCol: String,
      endCol: String): DataFrame = {
    // a null endpoint would sort NULLS FIRST into the sweep and zero out
    // the whole group's running sum — fail loudly at execution instead
    val guarded = df.filter(coalesce(assert_true(
      col(startCol).isNotNull && col(endCol).isNotNull,
      lit(s"peakConcurrency: null interval endpoint in ($startCol, $endCol) " +
        "— filter or repair open-ended intervals before the sweep")),
      lit(true)))
    val deltas = guarded
      .select(col(groupCol).as("_g"), col(startCol).as("_t"), lit(1L).as("_d"))
      .unionByName(guarded.select(col(groupCol).as("_g"), col(endCol).as("_t"),
        lit(-1L).as("_d")))
    val w = Window.partitionBy(col("_g")).orderBy(col("_t"))
    val conc = deltas
      .groupBy(col("_g"), col("_t")).agg(sum(col("_d")).as("_net"))
      .withColumn("_conc", sum(col("_net"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    conc
      .withColumn("_mx", max(col("_conc")).over(Window.partitionBy(col("_g"))))
      .filter(col("_conc") === col("_mx"))
      .groupBy(col("_g"))
      .agg(max(col("_mx")).as("peak"), min(col("_t")).as("peak_at"))
      .select(col("_g").as(groupCol), col("peak"), col("peak_at"))
  }

  /** Merge overlapping-or-touching intervals per key (interval union): the
    * gaps-and-islands construction. A row opens a new island iff its start
    * is strictly past the running max end of every EARLIER row (exclusive
    * 1-PRECEDING frame — the inclusive frame would compare a row against
    * itself and never open one); islands are the running count of openers.
    *
    * `tieCol` makes the sort total (rows tying on start AND end would
    * otherwise island nondeterministically only in id assignment, not in
    * membership — but a total order keeps the window single-valued under
    * AQE re-plans too). One shuffle on `keyCol`; both windows and the
    * final aggregate share its sort.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val order = Seq(col(startCol), col(endCol), col(tieCol))
    val before = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_pmax", max(col(endCol)).over(before))
      .withColumn("_nf",
        when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L)
          .otherwise(0L))
      .withColumn("_island", sum(col("_nf")).over(run))
      .groupBy(col(keyCol), col("_island").as("island"))
      .agg(min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_merged"))
  }

  /** Run-length encoding of consecutive equal values per key: each maximal
    * run of identical `valueCol` (in `orderCols` order) collapses to one
    * row with its length and start. Same lag+cumsum island shape as
    * [[gapSessionize]]; one shuffle on `keyCol`, runs never cross keys.
    */
  def runLength(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(valueCol), 1).over(w)
    df
      .withColumn("_nf",
        when(prev.isNull || col(valueCol) =!= prev, 1L).otherwise(0L))
      .withColumn("_run", sum(col("_nf")).over(run))
      .groupBy(col(keyCol), col("_run").as("run_id"))
      .agg(min(col(valueCol)).as("run_value"),
        count(lit(1)).as("run_len"),
        min(orderCols.head).as("run_start"))
  }

  /** One-sided CUSUM change-point detection per key, in exact integer
    * arithmetic. The textbook recurrence `S_i = max(0, S_{i−1} + x_i − μ
    * − k)` looks inherently sequential, but it has a closed prefix form:
    * with drifts `d_i = x_i − μ − k` and prefix sums `P_i = Σ_{j≤i} d_j`
    * (P₀ = 0), `S_i = P_i − min_{0≤j≤i} P_j` — a cumulative sum plus a
    * running min, i.e. two frames over ONE keyed window sort. That turns
    * the per-key scan into a standard distributed window pass instead of
    * a driver loop or a `mapGroups` over collected series.
    *
    * Division never happens: the per-key mean μ = total/n is kept as a
    * rational by scaling every drift by n — `n·d_i = n·x_i − total −
    * n·k` — so `s_scaled` is `n · S_i` exactly and the alarm test
    * `S_i ≥ h` becomes `s_scaled ≥ h·n`. BIGINT `+ * −` only:
    * bit-identical at any parallelism and in any engine. Overflow
    * headroom: |n·d_i| ≤ n·(max x + total), safe past 10⁹ rows per key
    * for count-like x.
    *
    * Output: one row per input row with `s_scaled`, the key's scale `n`,
    * and the alarm flag — downstream keeps alarms or joins back as it
    * pleases.
    *
    * @param k allowance (slack) in x units: drift below `μ + k` resets
    * @param h alarm threshold in x units
    */
  /** Two-sided [[cusum]]: the upward chart catches level RISES, a
    * mirrored chart with drift `μ − k − x` catches DROPS (traffic loss,
    * silent upstream filters) — both folds in their closed prefix form
    * over the SAME keyed window sort (four frames, one exchange, one
    * sort). `alarm` fires when either side crosses `h`.
    */
  def cusumTwoSided(df: DataFrame, keyCol: Column, orderCol: Column,
      xCol: Column, k: Long, h: Long): DataFrame = {
    require(h >= 1, s"alarm threshold h must be >= 1, got $h")
    val g = df.select(keyCol.as("key"), orderCol.as("t"),
      xCol.cast("long").as("x"))
    val wAll = Window.partitionBy(col("key"))
    val wCum = Window.partitionBy(col("key")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("x")).over(wAll))
      .withColumn("p_hi",
        sum(col("n") * col("x") - col("total") - col("n") * lit(k))
          .over(wCum))
      .withColumn("p_lo",
        sum(col("total") - col("n") * col("x") - col("n") * lit(k))
          .over(wCum))
      .withColumn("s_hi",
        col("p_hi") - least(lit(0L), min(col("p_hi")).over(wCum)))
      .withColumn("s_lo",
        col("p_lo") - least(lit(0L), min(col("p_lo")).over(wCum)))
      .select(col("key"), col("t"), col("x"), col("n"),
        col("s_hi"), col("s_lo"),
        (col("s_hi") >= col("n") * lit(h) ||
          col("s_lo") >= col("n") * lit(h)).as("alarm"))
  }

  def cusum(df: DataFrame, keyCol: Column, orderCol: Column, xCol: Column,
      k: Long, h: Long): DataFrame = {
    require(h >= 1, s"alarm threshold h must be >= 1, got $h")
    val g = df.select(keyCol.as("key"), orderCol.as("t"),
      xCol.cast("long").as("x"))
    val wAll = Window.partitionBy(col("key"))
    val wCum = Window.partitionBy(col("key")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("x")).over(wAll))
      .withColumn("p",
        sum(col("n") * col("x") - col("total") - col("n") * lit(k))
          .over(wCum))
      .withColumn("s_scaled", col("p") - least(lit(0L), min(col("p")).over(wCum)))
      .select(col("key"), col("t"), col("x"), col("n"), col("s_scaled"),
        (col("s_scaled") >= col("n") * lit(h)).as("alarm"))
  }
}
