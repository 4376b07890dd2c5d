package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.EventTime
import graft.sources.Tables

/** Event-time window queries over `events` (tumbling is q11): sliding and
  * session windows, oracle-checked against explicit window arithmetic /
  * gaps-and-islands SQL in DuckDB.
  */
object WindowQueries {

  private val Ts = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Inter-arrival BURSTINESS per user: CV² of the gap distribution in
    // exact ppm — CV² = n·Σd²/(Σd)² − 1 is ≥ 0 by Cauchy-Schwarz, 0 for
    // a metronome, ~1e6 for Poisson arrivals, larger = bursty (bot-vs-
    // human traffic triage; the q225 CUSUM's stationary-side companion).
    // Ties in the per-second timestamps contribute d = 0 regardless of
    // their internal order, so the gap MULTISET — and every aggregate —
    // is deterministic even though lag() over ties is not.
    "q287_burstiness" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("t_s"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t_s"))
      ev.withColumn("d", col("t_s") - lag(col("t_s"), 1).over(w))
        .filter(col("d").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("d")).as("sum_d"),
          sum(col("d") * col("d")).as("sum_d2"))
        .filter(col("n_gaps") >= 2)
        .select(col("user_id"), col("n_gaps"), col("sum_d"),
          expr("sum_d div n_gaps").as("mean_gap_s"),
          when(col("sum_d") > 0,
            graft.operators.Eval.stagedPpmDiv(col("n_gaps") * col("sum_d2"),
              col("sum_d") * col("sum_d")) - lit(1000000L))
            .as("cv2_ppm"))
    }),

    // Cohort retention matrix: users grouped by first-activity week,
    // counted per week offset — both engines truncate weeks to ISO Monday,
    // so offsets are exact multiples of 7 days (the /7 division is
    // integer-valued by construction).
    "q82_retention" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("week", col("ts"))).as("cohort"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      active.join(cohorts, Seq("user_id"))
        .withColumn("offset_w",
          (datediff(to_date(col("w")), to_date(col("cohort"))) / 7)
            .cast("long"))
        .groupBy(col("cohort"), col("offset_w"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("offset_w"), col("n_users"))
    }),

    // Ordered funnel: signup -> view -> click -> purchase, each step
    // strictly after the user's previous-step anchor (greedy min-time).
    "q83_funnel" -> ((s, d) =>
      EventTime.funnel(Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))),

    // q83's funnel with a 6-hour CONVERSION WINDOW: each step must land
    // within 6 h of the previous step's anchor (the product-analytics
    // "converted within" question q83's unbounded order can't answer) —
    // same greedy earliest-qualifying-event semantics, same one
    // user-keyed aggregate per step.
    "q207_windowed_funnel" -> ((s, d) =>
      EventTime.funnel(Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"),
        maxGapSec = Some(21600L))),

    // Conversion latency: first signup -> first subsequent purchase, delta
    // as exact microsecond BIGINTs; percentiles via the q41 recipe
    // (Spark percentile == DuckDB quantile_cont on exact ints, round 4).
    "q86_conversion_latency" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "purchase")
        .join(s1, Seq("user_id"))
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t2"))
      s2.select((unix_micros(col("t2")) - unix_micros(col("t1"))).as("d_us"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(d_us, 0.5)"), 4).as("med_us"),
          round(expr("percentile(d_us, 0.9)"), 4).as("p90_us"),
          min(col("d_us")).as("min_us"),
          max(col("d_us")).as("max_us"))
    }),

    // Semi-structured: JSON path extraction (string + typed) from
    // events.props, then an aggregation over the extracted field.
    "q49_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          count(when(col("k_str").isNull, 1)).as("n_missing"))),

    // Binned self range-join: same-user event pairs within 30 minutes —
    // the scalable non-equi time join (equi-join on (key, time-bin), 3x
    // replication, no nested loop).
    "q54_range_join" -> ((s, d) =>
      EventTime.selfRangeJoinBinned(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts")),
        "user_id", "ts", "event_id", 1800L * 1000000L)
        .select(col("user_id"), col("id_a"), col("id_b"), col("dt_us"))),

    // Sliding windows: 10s duration, 5s slide — every event in exactly 2.
    "q36_sliding_window" -> ((s, d) =>
      EventTime.windowedAgg(Tables.events(s, d), "ts", "10 seconds", "5 seconds",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value")))
        .select(date_format(col("window_start"), Ts).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))),

    // Session windows per user, 4-hour inactivity gap.
    "q37_session_window" -> ((s, d) =>
      EventTime.sessionize(Tables.events(s, d), "ts", "4 hours",
        Seq(col("user_id")),
        Seq(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value")))
        .select(col("user_id"),
          date_format(col("session_start"), Ts).as("session_start"),
          date_format(col("session_end"), Ts).as("session_end"),
          col("n_events"), col("sum_value"))),

    // Gap sessionization via lag+cumsum (6-hour gap): per-user session
    // ordinals and exact microsecond bounds — the join-friendly session
    // form that session_window's opaque struct key can't provide.
    "q90_gap_sessionize" -> ((s, d) =>
      EventTime.gapSessionize(Tables.events(s, d), "user_id", "ts", 21600L)),

    // Time-series gap-fill: dense per-user daily spend spine, missing days
    // linearly interpolated in exact BIGINT cents (no float lerp).
    "q109_gap_fill" -> ((s, d) =>
      EventTime.gapFillDaily(Tables.events(s, d), "user_id", "ts", "value")),

    // Burst detection: per event type, active days whose count more than
    // doubles the trailing-28-day daily average, as the exact integer
    // cross-multiplication cnt·28 > 2·Σtrailing (no float average ever
    // forms); requires ≥7 days of trailing history so a series' first
    // week can't self-declare a burst. One keyed range-window pass.
    "q183_burst_days" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rangeBetween(-28, -1)
      daily
        .withColumn("trail_sum", sum(col("cnt")).over(w))
        .withColumn("trail_days", count(col("cnt")).over(w))
        .filter(col("trail_days") >= 7 &&
          col("cnt") * 28 > col("trail_sum") * 2)
        .select(col("event_type"), col("day"), col("cnt"),
          col("trail_sum"), col("trail_days"))
    }),

    // Exact trailing-7-day distinct users per active day — the DAU/WAU
    // family's sliding cardinality, inexpressible as a Spark window
    // function, linearized by the span trick (each (user, active day)
    // claims the window-ends where it is the user's latest in-window
    // activity; see EventTime.slidingDistinct).
    "q178_sliding_distinct" -> ((s, d) =>
      EventTime.slidingDistinct(Tables.events(s, d), col("user_id"),
        expr("unix_micros(ts) div 86400000000"), windowDays = 7)),

    // First-order Markov transition matrix over each user's event-type
    // sequence, with exact parts-per-million row normalization.
    "q113_transitions" -> ((s, d) =>
      EventTime.transitions(Tables.events(s, d), "user_id", "event_type",
        "ts", "event_id")),

    // Interval union: each order open for 30 days, overlapping spans per
    // customer merged to coverage islands — the gaps-and-islands
    // construction with an exclusive running-max-end window.
    "q122_interval_merge" -> ((s, d) =>
      EventTime.mergeIntervals(
        Tables.orders(s, d).select(col("o_custkey"),
          col("o_orderdate").as("start_at"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("end_at"),
          col("o_orderkey")),
        "o_custkey", "start_at", "end_at", "o_orderkey")
        .select(col("o_custkey"), col("island"),
          date_format(col("merged_start"), Ts).as("merged_start"),
          date_format(col("merged_end"), Ts).as("merged_end"),
          col("n_merged"))),

    // Per-user modal event type, deterministic tie-break (most frequent,
    // then lexicographically smallest) — the categorical summary aggregate.
    "q123_mode" -> ((s, d) =>
      graft.operators.Relational.modeExact(
        Tables.events(s, d), Seq(col("user_id")), col("event_type"))),

    // Trending entities: top-3 most active users per sliding 1-day window
    // (12 h slide) — the leaderboard-over-time analytic composed from the
    // sliding-window aggregate + bounded top-k per window, deterministic
    // tie-break (count desc, user asc).
    "q140_trending" -> ((s, d) => {
      val win = EventTime.windowedAgg(Tables.events(s, d), "ts",
        "1 day", "12 hours", Seq(col("user_id")),
        Seq(count(lit(1)).as("n")))
      graft.operators.Relational.topKPerGroup(win,
          Seq(col("window_start")),
          Seq(col("n").desc, col("user_id").asc), 3, "rnk")
        .select(date_format(col("window_start"), Ts).as("window_start"),
          col("user_id"), col("n"), col("rnk").cast("long").as("rnk"))
    }),

    // User-journey mining: each user's first 5 event types as one path
    // string, counted across users — the funnel-discovery analytic. The
    // path builds from a per-user sorted struct array (row-local), so
    // collect_list's nondeterministic order cannot leak into the output.
    "q133_top_paths" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("seq", row_number().over(w))
        .filter(col("seq") <= 5)
        .groupBy(col("user_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("seq"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Run-length encoding of each user's event-type sequence: maximal
    // consecutive runs with exact lengths and start micros — the sequence
    // compression / dwell-analysis primitive.
    "q124_rle" -> ((s, d) =>
      EventTime.runLength(
        Tables.events(s, d).select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("event_type")),
        "user_id", Seq(col("us"), col("event_id")), "event_type")
        .select(col("user_id"), col("run_id"),
          col("run_value").as("event_type"), col("run_len"),
          col("run_start").as("run_start_us"))))

  val oracles: Map[String, String] = Map(
    // lag over (user, second); the tie order differs between engines but
    // the gap multiset does not.
    "q287_burstiness" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS t_s
        |  FROM events WHERE user_id IS NOT NULL
        |), g AS (
        |  SELECT user_id,
        |         t_s - lag(t_s) OVER (PARTITION BY user_id ORDER BY t_s)
        |           AS d
        |  FROM e
        |), a AS (
        |  SELECT user_id, count(*) AS n_gaps,
        |         CAST(sum(d) AS BIGINT) AS sum_d,
        |         CAST(sum(d * d) AS BIGINT) AS sum_d2
        |  FROM g WHERE d IS NOT NULL GROUP BY 1
        |)
        |SELECT user_id, n_gaps, sum_d,
        |       CAST(sum_d // n_gaps AS BIGINT) AS mean_gap_s,
        |       CASE WHEN sum_d > 0 THEN
        |         CAST(CAST(n_gaps * sum_d2 AS HUGEINT) * 1000000
        |              // (CAST(sum_d AS HUGEINT) * sum_d) - 1000000
        |           AS BIGINT)
        |       END AS cv2_ppm
        |FROM a WHERE n_gaps >= 2""".stripMargin,

    "q86_conversion_latency" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, s1.t1, min(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1, 2
        |), d AS (
        |  SELECT epoch_us(t2) - epoch_us(t1) AS d_us FROM s2
        |)
        |SELECT count(*) AS n_converted,
        |       round(quantile_cont(d_us, 0.5), 4) AS med_us,
        |       round(quantile_cont(d_us, 0.9), 4) AS p90_us,
        |       CAST(min(d_us) AS BIGINT) AS min_us,
        |       CAST(max(d_us) AS BIGINT) AS max_us
        |FROM d""".stripMargin,

    "q83_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
        |), s4 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
        |)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,

    // q83's cascade with the 6 h window bound on each hop.
    "q207_windowed_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t
        |    AND e.ts <= s1.t + INTERVAL 21600 SECOND GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s2.t
        |    AND e.ts <= s2.t + INTERVAL 21600 SECOND GROUP BY 1
        |), s4 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t
        |    AND e.ts <= s3.t + INTERVAL 21600 SECOND GROUP BY 1
        |)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'view', count(*) FROM s2
        |UNION ALL SELECT 3, 'click', count(*) FROM s3
        |UNION ALL SELECT 4, 'purchase', count(*) FROM s4""".stripMargin,

    "q82_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(date_trunc('week', ts)) AS cohort
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
        |)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', f.cohort, a.w) // 7 AS BIGINT) AS offset_w,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q54_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |       epoch_ns(b.ts)//1000 - epoch_ns(a.ts)//1000 AS dt_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_ns(b.ts)//1000 - epoch_ns(a.ts)//1000) <= 1800000000""".stripMargin,

    "q49_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |             THEN 1 END) AS n_missing
        |FROM events GROUP BY event_type""".stripMargin,

    // Each event belongs to windows starting at bucket5(ts) and bucket5(ts)-5s.
    "q36_sliding_window" ->
      """SELECT strftime(time_bucket(INTERVAL '5 seconds', ts)
        |         - to_seconds(o), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events, UNNEST([0, 5]) u(o)
        |GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands: new session when >= 4h since previous event; session
    // end = last event + gap (matches Spark session_window semantics).
    "q37_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts >= lag(ts) OVER w + INTERVAL '4 hours'
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts) + INTERVAL '4 hours', '%Y-%m-%d %H:%M:%S')
        |         AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM numbered
        |GROUP BY user_id, sid""".stripMargin,

    // The spine is generate_series(first, last) per user; interpolation is
    // the same BIGINT expression Spark evaluates (// == div on nonnegative
    // numerators, and daily cent sums here are nonnegative).
    "q183_burst_days" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2
        |), trail AS (
        |  SELECT event_type, day, cnt,
        |         CAST(sum(cnt) OVER w AS BIGINT) AS trail_sum,
        |         CAST(count(cnt) OVER w AS BIGINT) AS trail_days
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, day, cnt, trail_sum, trail_days
        |FROM trail
        |WHERE trail_days >= 7 AND cnt * 28 > trail_sum * 2""".stripMargin,

    "q178_sliding_distinct" ->
      """WITH dp AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events WHERE user_id IS NOT NULL
        |), days AS (SELECT DISTINCT day FROM dp)
        |SELECT d.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_distinct
        |FROM days d JOIN dp p ON p.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day""".stripMargin,

    "q109_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id AS k, epoch_us(ts) // 86400000000 AS d,
        |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2
        |), bounds AS (
        |  SELECT k, min(d) AS lo, max(d) AS hi FROM daily GROUP BY 1
        |), spine AS (
        |  SELECT k, unnest(generate_series(lo, hi)) AS d FROM bounds
        |), j AS (
        |  SELECT s.k, s.d, daily.obs,
        |    last_value(obs IGNORE NULLS) OVER w_before AS pv,
        |    last_value(CASE WHEN obs IS NOT NULL THEN s.d END IGNORE NULLS)
        |      OVER w_before AS pd,
        |    first_value(obs IGNORE NULLS) OVER w_after AS nv,
        |    first_value(CASE WHEN obs IS NOT NULL THEN s.d END IGNORE NULLS)
        |      OVER w_after AS nd
        |  FROM spine s LEFT JOIN daily ON s.k = daily.k AND s.d = daily.d
        |  WINDOW
        |    w_before AS (PARTITION BY s.k ORDER BY s.d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    w_after AS (PARTITION BY s.k ORDER BY s.d
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT k AS user_id, d AS day, obs IS NOT NULL AS is_observed,
        |       CAST(CASE WHEN obs IS NOT NULL THEN obs
        |            ELSE (pv * (nd - d) + nv * (d - pd)) // (nd - pd)
        |       END AS BIGINT) AS value_cents
        |FROM j""".stripMargin,

    "q113_transitions" ->
      """WITH nexted AS (
        |  SELECT event_type AS src,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS dst
        |  FROM events
        |), cnts AS (
        |  SELECT src AS src_type, dst AS dst_type, count(*) AS cnt
        |  FROM nexted WHERE dst IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT src_type, dst_type, cnt,
        |       CAST(cnt * 1000000 // sum(cnt) OVER (PARTITION BY src_type)
        |            AS BIGINT) AS ppm
        |FROM cnts""".stripMargin,

    "q90_gap_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events
        |), marked AS (
        |  SELECT user_id, us,
        |         CASE WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w > 21600000000
        |              THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), numbered AS (
        |  SELECT user_id, us,
        |         sum(nf) OVER (PARTITION BY user_id ORDER BY us
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_seq,
        |       count(*) AS n_events,
        |       min(us) AS session_start_us,
        |       max(us) AS session_end_us,
        |       max(us) - min(us) AS duration_us
        |FROM numbered
        |GROUP BY user_id, sid""".stripMargin,

    "q140_trending" ->
      """WITH w AS (
        |  SELECT strftime(time_bucket(INTERVAL '12 hours', ts)
        |           - to_seconds(o), '%Y-%m-%d %H:%M:%S') AS window_start,
        |         user_id, count(*) AS n
        |  FROM events, UNNEST([0, 43200]) u(o)
        |  GROUP BY 1, 2
        |)
        |SELECT window_start, user_id, n, CAST(rnk AS BIGINT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY window_start
        |        ORDER BY n DESC, user_id) AS rnk FROM w)
        |WHERE rnk <= 3""".stripMargin,

    "q133_top_paths" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS seq
        |  FROM events
        |), paths AS (
        |  SELECT user_id,
        |         string_agg(event_type, '>' ORDER BY seq) AS path
        |  FROM ranked WHERE seq <= 5 GROUP BY user_id
        |)
        |SELECT path, count(*) AS n_users FROM paths GROUP BY path""".stripMargin,

    "q122_interval_merge" ->
      """WITH iv AS (
        |  SELECT o_custkey, o_orderdate AS s,
        |         o_orderdate + INTERVAL 30 DAY AS e, o_orderkey AS tie
        |  FROM orders
        |), marked AS (
        |  SELECT o_custkey, s, e, tie,
        |         CASE WHEN max(e) OVER (PARTITION BY o_custkey
        |                ORDER BY s, e, tie
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              IS NULL
        |           OR s > max(e) OVER (PARTITION BY o_custkey
        |                ORDER BY s, e, tie
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         THEN 1 ELSE 0 END AS nf
        |  FROM iv
        |), numbered AS (
        |  SELECT o_custkey, s, e,
        |         sum(nf) OVER (PARTITION BY o_custkey ORDER BY s, e, tie
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM marked
        |)
        |SELECT o_custkey, CAST(island AS BIGINT) AS island,
        |       strftime(min(s), '%Y-%m-%d %H:%M:%S') AS merged_start,
        |       strftime(max(e), '%Y-%m-%d %H:%M:%S') AS merged_end,
        |       count(*) AS n_merged
        |FROM numbered GROUP BY o_custkey, island""".stripMargin,

    "q123_mode" ->
      """SELECT user_id, event_type AS mode_value,
        |       CAST(n_occurrences AS BIGINT) AS n_occurrences
        |FROM (
        |  SELECT user_id, event_type, count(*) AS n_occurrences,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY count(*) DESC, event_type ASC) AS rnk
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rnk = 1""".stripMargin,

    "q124_rle" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events
        |), marked AS (
        |  SELECT user_id, us, event_id, event_type,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |              OR event_type <> lag(event_type) OVER w
        |         THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), numbered AS (
        |  SELECT user_id, us, event_type,
        |         sum(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
        |  FROM marked
        |)
        |SELECT user_id, CAST(rid AS BIGINT) AS run_id,
        |       min(event_type) AS event_type, count(*) AS run_len,
        |       min(us) AS run_start_us
        |FROM numbered GROUP BY user_id, rid""".stripMargin)
}
