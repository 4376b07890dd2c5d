package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, EventTime, Relational}
import graft.queries.AnalyticsQueries

/** Bounds for the approximate (sketch) aggregates that have no hash oracle. */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rrfFuse: both-list docs beat single-list docs at equal ranks; " +
      "missing side contributes zero") {
    import spark.implicits._
    import graft.operators.Relational
    // query 1: doc 10 is rank 1 in BOTH lists; doc 20 only lexical rank 2;
    // doc 30 only semantic rank 2
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("q", "id", "ra")
    val sem = Seq((1L, 10L, 1L), (1L, 30L, 2L)).toDF("q", "id", "rb")
    val out = Relational.rrfFuse(lex, sem, "q", "id", "ra", "rb", 60, 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 30L))
    // doc 10: 2/61; docs 20/30: exactly 1/62 each (tie broken by id)
    assert(math.abs(out(0)._3 - math.rint(2.0 / 61 * 1e6) / 1e6) < 1e-12)
    assert(out(1)._3 == out(2)._3)
  }

  test("q44 sketches: HLL within 5% of exact, approx median within data range") {
    val row = AnalyticsQueries.queries("q44_sketches")(spark, dir).head()
    val approx = row.getLong(0).toDouble
    val exact = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
    val med = row.getDouble(2)
    assert(med > 0 && med <= 50, s"median quantity $med outside plausible range")
  }

  test("registerViews: the whole engine is reachable from spark.sql alone") {
    graft.sources.Tables.registerViews(spark, dir)
    // one pure-SQL statement spanning tables, the nanos-safe events view,
    // and the native graft_dot function — no DataFrame API anywhere
    val rows = spark.sql(
      """SELECT (SELECT count(*) FROM lineitem)        AS n_li,
        |       (SELECT count(*) FROM events)          AS n_ev,
        |       (SELECT count(DISTINCT lang) FROM documents) AS n_lang,
        |       (SELECT round(graft_dot(
        |              transform(embedding, x -> cast(x AS double)),
        |              transform(embedding, x -> cast(x AS double))), 4)
        |        FROM embeddings WHERE vec_id = 0)     AS self_dot
        |""".stripMargin).head()
    assert(rows.getLong(0) > 0 && rows.getLong(1) > 0)
    assert(rows.getLong(2) >= 3, s"langs: ${rows.getLong(2)}")
    assert(rows.getDouble(3) > 0.0, s"graft_dot in SQL: ${rows.getDouble(3)}")
  }

  test("madOutliers: hand-computed median/MAD on a known group") {
    import spark.implicits._
    // group g: cents {100, 110, 120, 130, 10000}; median=120, deviations
    // {20, 10, 0, 10, 9880}, MAD=10 -> only 10000 exceeds med + 3*MAD
    val df = Seq(("g", 100L), ("g", 110L), ("g", 120L), ("g", 130L),
      ("g", 10000L)).toDF("grp0", "cents")
    val r = Curation.madOutliers(df, col("grp0"), col("cents"), 3).head()
    assert(r.getAs[Long]("med2") == 240L)   // 2 * 120
    assert(r.getAs[Long]("mad4") == 40L)    // 4 * 10
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("madOutliers: even-count group uses the interpolated midpoint exactly") {
    import spark.implicits._
    // cents {10, 20, 30, 41}: median=25 (midpoint), deviations
    // {15, 5, 5, 16} -> MAD = (5+15)/2 = 10; threshold |x-25| > 30 -> none
    val df = Seq(("e", 10L), ("e", 20L), ("e", 30L), ("e", 41L))
      .toDF("g", "c")
    val r = Curation.madOutliers(df, col("g"), col("c"), 3).head()
    assert(r.getAs[Long]("med2") == 50L)
    assert(r.getAs[Long]("mad4") == 40L)
    assert(r.getAs[Long]("n_outliers") == 0L)
  }

  test("tokenBudgetSelect: strict prefix rule — the first overflowing doc " +
      "excludes itself and everything after, even a later doc that fits") {
    import spark.implicits._
    // source A ordered by quality: d1(5 tok), d2(4), d3(10 — overflows at
    // budget 12), d4(1 — would fit, must still be excluded)
    val df = Seq(
      ("A", 1L, 5L, 0.9), ("A", 2L, 4L, 0.8), ("A", 3L, 10L, 0.7),
      ("A", 4L, 1L, 0.6), ("B", 5L, 12L, 0.5), ("B", 6L, 1L, 0.4))
      .toDF("source", "doc_id", "n_tokens", "quality")
    val got = Curation.tokenBudgetSelect(df, "source", "doc_id", "n_tokens",
      "quality", budget = 12L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 9L, 5L -> 12L))
  }

  test("covarianceStats matches direct sums; diagonal pairs included") {
    import spark.implicits._
    val data = Seq((1L, 10L, 3L), (2L, 20L, 5L), (3L, 35L, 2L), (4L, 45L, 7L))
    val df = data.toDF("x", "y", "z")
    val got = Relational.covarianceStats(df, Seq(
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got.size == 6)
    def s(f: ((Long, Long, Long)) => Long) = data.map(f).sum
    val (sx, sy, sz) = (s(_._1), s(_._2), s(_._3))
    assert(got(("x", "y")) == ((4L, sx, sy, s(t => t._1 * t._2))))
    assert(got(("x", "x")) == ((4L, sx, sx, s(t => t._1 * t._1))))
    assert(got(("y", "z")) == ((4L, sy, sz, s(t => t._2 * t._3))))
    // covariance numerator composes exactly: n*Σxy − Σx·Σy
    val (n, sa, sb, sab) = got(("x", "y"))
    assert(n * sab - sa * sb == 4L * s(t => t._1 * t._2) - sx * sy)
  }

  test("slidingDistinct matches brute force on random activity; " +
      "daily-active keys expand 1x not Wx") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (for {
      k <- 1 to 20
      d <- 1 to 30 if rnd.nextInt(3) == 0
    } yield (k.toLong, d.toLong)) ++
      // duplicates within a day and one always-on key
      Seq((1L, 5L), (1L, 5L)) ++ (1 to 30).map(d => (99L, d.toLong))
    val df = rows.toDF("k", "day")
    val got = EventTime.slidingDistinct(df, col("k"), col("day"), 7)
      .as[(Long, Long)].collect().toMap
    val activeDays = rows.map(_._2).distinct
    val expect = activeDays.map(e =>
      e -> rows.filter(r => r._2 <= e && r._2 > e - 7).map(_._1)
        .distinct.size.toLong).toMap
    assert(got == expect)
    // span compression: the always-on key contributes exactly one
    // window-end per active day (end capped at next-1), never W per day
    val spans = df.filter(col("k") === 99L)
    val expanded = EventTime.slidingDistinct(spans, col("k"), col("day"), 7)
      .agg(sum(col("n_distinct"))).as[Long].head()
    assert(expanded == 30L, s"daily-active key must expand 1x, got $expanded")
  }

  test("gapFillDaily: dense spine, exact integer interpolation, sums per day") {
    import spark.implicits._
    val day = 86400000000L
    // user 1: 0.60 + 0.40 on day 0 (sums to 100 cents), 4.00 on day 3;
    // days 1 and 2 must interpolate between 100 and 400 in BIGINT math.
    // user 2: a single observed day -> a one-row spine, nothing to fill.
    val ev = Seq(
      (1L, 0L * day, 0.60), (1L, 0L * day + 5L, 0.40), (1L, 3L * day, 4.00),
      (2L, 7L * day, 9.99))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val out = EventTime.gapFillDaily(ev, "user_id", "ts", "value")
      .orderBy("user_id", "day").collect()
    assert(out.length == 5)
    val u1 = out.take(4).map(r => (r.getAs[Long]("day"),
      r.getAs[Boolean]("is_observed"), r.getAs[Long]("value_cents")))
    assert(u1(0) == ((0L, true, 100L)))
    assert(u1(1) == ((1L, false, (100L * 2 + 400L * 1) / 3))) // 266
    assert(u1(2) == ((2L, false, (100L * 1 + 400L * 2) / 3))) // 300
    assert(u1(3) == ((3L, true, 400L)))
    val u2 = out(4)
    assert(u2.getAs[Long]("day") == 7L && u2.getAs[Boolean]("is_observed"))
    assert(u2.getAs[Long]("value_cents") == 999L)
  }

  test("transitions: deterministic id tie-break and exact ppm shares") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a -> b -> a (ordered by ts)
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      // user 2: two events at the SAME timestamp — event_id breaks the tie,
      // so the transition is a -> c, never c -> a
      (2L, 4L, 10L, "a"), (2L, 5L, 10L, "c"))
      .toDF("user_id", "event_id", "us", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
    val out = EventTime.transitions(ev, "user_id", "event_type", "ts",
      "event_id")
      .orderBy("src_type", "dst_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // src a: one a->b and one a->c, 500000 ppm each; src b: b->a at 1000000
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 500000L), ("a", "c", 1L, 500000L),
      ("b", "a", 1L, 1000000L)))
  }

  test("gapSessionize: sessions split exactly past the gap, bounds exact") {
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val gap = 60L // seconds
    val rows = Seq(
      (1L, base),                      // session 1
      (1L, base + 60000000L),          // +60s exactly: NOT a new session
      (1L, base + 120000001L),         // +60.000001s after prev: new session
      (2L, base))                      // separate user
    val ev = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val out = EventTime.gapSessionize(ev, "user_id", "ts", gap)
      .orderBy("user_id", "session_seq").collect()
    assert(out.length == 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("session_seq") == 1L)
    assert(s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Long]("duration_us") == 60000000L)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_events") == 1L)
    assert(s2.getAs[Long]("session_start_us") == base + 120000001L)
    val u2 = out(2)
    assert(u2.getAs[Long]("user_id") == 2L && u2.getAs[Long]("n_events") == 1L)
  }

  test("mergeIntervals: overlap and touch merge, gaps split, ids total-order") {
    import spark.implicits._
    val iv = Seq(
      // key 1: [0,10] + [5,12] overlap; [12,20] touches (merges); [25,30] gaps
      (1L, 0L, 10L, 1L), (1L, 5L, 12L, 2L), (1L, 12L, 20L, 3L),
      (1L, 25L, 30L, 4L),
      // key 2: duplicate intervals collapse into one island of 2
      (2L, 0L, 5L, 5L), (2L, 0L, 5L, 6L))
      .toDF("k", "s", "e", "id")
      .select(col("k"), timestamp_micros(col("s")).as("s"),
        timestamp_micros(col("e")).as("e"), col("id"))
    val out = EventTime.mergeIntervals(iv, "k", "s", "e", "id")
      .select(col("k"), col("island"),
        unix_micros(col("merged_start")).as("ms"),
        unix_micros(col("merged_end")).as("me"), col("n_merged"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      (1L, 1L) -> (0L, 20L, 3L), (1L, 2L) -> (25L, 30L, 1L),
      (2L, 1L) -> (0L, 5L, 2L)), s"got $out")
  }

  test("runLength: maximal runs with exact lengths and starts") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (1L, 5L, "a"), (1L, 6L, "a"), (2L, 1L, "x"))
      .toDF("k", "seq", "v")
    val out = EventTime.runLength(ev, "k", Seq(col("seq")), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      (1L, 1L) -> ("a", 2L, 1L), (1L, 2L) -> ("b", 1L, 3L),
      (1L, 3L) -> ("a", 3L, 4L), (2L, 1L) -> ("x", 1L, 1L)), s"got $out")
  }

  test("modeExact: most frequent wins, ties break to smallest value") {
    import spark.implicits._
    val df = Seq((1L, "b"), (1L, "b"), (1L, "a"), (2L, "z"), (2L, "y"))
      .toDF("g", "v")
    val out = Relational.modeExact(df, Seq(col("g")), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ("b", 2L), 2L -> ("y", 1L)), s"got $out")
  }

  test("weightedMedian: cumulative-weight crossing, exact at even splits") {
    import spark.implicits._
    val df = Seq(
      // group 1: weights 1,1,2 over values 10,20,30 -> tot 4, crossing at
      // cum*2 >= 4 first happens at value 20 (cum 2)
      (1L, 10L, 1L), (1L, 20L, 1L), (1L, 30L, 2L),
      // group 2: single heavy value dominates
      (2L, 5L, 1L), (2L, 7L, 10L), (2L, 9L, 1L),
      // group 3: duplicate values collapse before the cumsum
      (3L, 4L, 1L), (3L, 4L, 1L), (3L, 8L, 1L))
      .toDF("g", "v", "w")
    val got = Relational.weightedMedian(df, Seq(col("g")), col("v"), col("w"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (20L, 4L), 2L -> (7L, 12L), 3L -> (4L, 3L)),
      s"got $got")
  }

  test("exactQuantile: discrete crossing for p0, median, p100, small groups") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (1L, i)).toDF("g", "v")
      .unionByName(Seq((2L, 7L)).toDF("g", "v"))
    def q(num: Long, den: Long): Map[Long, Long] =
      Relational.exactQuantile(df, Seq(col("g")), col("v"), num, den)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group 1 = 1..100: p05 -> 5 (cum 5*100 >= 100*5), p50 -> 50, p100 -> 100
    assert(q(5, 100)(1L) == 5L)
    assert(q(1, 2)(1L) == 50L)
    assert(q(1, 1)(1L) == 100L)
    // p0 -> smallest value (cum*den >= 0 always)
    assert(q(0, 1)(1L) == 1L)
    // single-element group: every quantile is that element
    assert(q(5, 100)(2L) == 7L && q(1, 1)(2L) == 7L)
  }

  test("olsExact: rational slope is exact on a perfect line and constant") {
    import spark.implicits._
    // y = 2x + 7 -> slope_num/slope_den == 2 exactly
    val line = Seq((1L, 10L, 27L), (1L, 20L, 47L), (1L, 30L, 67L),
      // constant y -> slope_num == 0; single-point group -> den == 0
      (2L, 5L, 9L), (2L, 15L, 9L), (3L, 100L, 42L))
      .toDF("g", "x", "y")
    val got = Relational.olsExact(line, Seq(col("g")), col("x"), col("y"))
      .collect().map(r => r.getAs[Long]("g") ->
        (r.getAs[Long]("n"), r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den")))
      .toMap
    val (n1, num1, den1) = got(1L)
    assert(n1 == 3L && den1 != 0L && num1 == 2L * den1,
      s"perfect line slope must be exactly 2, got $num1/$den1")
    assert(got(2L)._2 == 0L, "constant y must give slope_num == 0")
    assert(got(3L)._3 == 0L, "single point must give slope_den == 0 (undefined)")
  }

  test("equiWidthHistogram: bins partition rows, edges integer-exact") {
    import spark.implicits._
    val vals = (0L until 1000L).map(i => Tuple1(i * 7 % 501)).toDF("v")
    val bins = Relational.equiWidthHistogram(vals, col("v"), 20).collect()
    assert(bins.map(_.getAs[Long]("n_rows")).sum == 1000L,
      "every row lands in exactly one bin")
    // values 0..500, span 501: bin(v) = v*20 div 501
    bins.foreach { r =>
      val (bin, lo, hi) = (r.getAs[Long]("bin"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      assert(bin >= 0 && bin < 20)
      assert(lo * 20 / 501 == bin && hi * 20 / 501 == bin,
        s"bin $bin range [$lo,$hi] must respect integer edges")
    }
    // extremes occupy the first and last bin
    assert(bins.map(_.getAs[Long]("bin")).min == 0L)
    assert(bins.map(_.getAs[Long]("bin")).max == 19L)
  }

  test("equiDepthHistogram: bins partition rows with near-equal depth, " +
    "ranges are disjoint and ordered, a hot key pins lo == hi") {
    import spark.implicits._
    val vals = (0L until 400L).map(i => ("a", i))
      .toDF("g", "v")
    val bins = Relational.equiDepthHistogram(vals, col("g"), col("v"), 4)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(bins.map(_.getAs[Long]("n_rows")).sum == 400L)
    assert(bins.length == 4)
    assert(bins.forall(r => r.getAs[Long]("n_rows") == 100L),
      s"uniform data must split 100/100/100/100, got " +
        bins.map(_.getAs[Long]("n_rows")).toSeq)
    // ranges disjoint and ascending
    bins.sliding(2).foreach { p =>
      assert(p(0).getAs[Long]("hi") < p(1).getAs[Long]("lo"))
    }
    // hot key: 90% of rows share one value -> its bin degenerates to a point
    val skew = ((0L until 360L).map(_ => ("a", 7L)) ++
      (0L until 40L).map(i => ("a", 100L + i))).toDF("g", "v")
    val sb = Relational.equiDepthHistogram(skew, col("g"), col("v"), 4)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(sb.head.getAs[Long]("lo") == 7L && sb.head.getAs[Long]("hi") == 7L,
      s"the hot key must pin its bin to a point, got ${sb.toSeq}")
    assert(sb.map(_.getAs[Long]("n_rows")).sum == 400L)
  }

  test("rolling median (q119 form) matches a brute-force frame scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => (i % 5, i, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "seq", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq")).rowsBetween(-6, 0)
    val got = df
      .withColumn("win", array_sort(collect_list(col("v")).over(w)))
      .select(col("k"), col("seq"),
        (element_at(col("win"), expr("CAST((size(win) + 1) div 2 AS INT)")) +
          element_at(col("win"), expr("CAST(size(win) div 2 + 1 AS INT)")))
          .as("med2x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((k, seq), med2x) <- got) {
      val frame = rows.filter(r => r._1 == k && r._2 <= seq && r._2 > seq - 5 * 7)
        .sortBy(_._2).takeRight(7).map(_._3).sorted
      val n = frame.length
      val expect = frame((n + 1) / 2 - 1) + frame(n / 2)
      assert(med2x == expect, s"k=$k seq=$seq: $med2x != $expect (frame $frame)")
    }
  }

  test("burstiness CV^2: metronome gaps -> 0, bursty gaps -> hand value") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // metronome u1: gaps 10,10,10; bursty u2: gaps 1,1,98 ->
    // 3*9606*1e6/10000 - 1e6 = 1881800
    val ev = Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 0L), (2L, 1L), (2L, 2L), (2L, 100L)).toDF("user_id", "t_s")
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_s"))
    val got = ev.withColumn("d", col("t_s") - lag(col("t_s"), 1).over(w))
      .filter(col("d").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sd2"))
      .select(col("user_id"),
        (graft.operators.Eval.stagedPpmDiv(col("n") * col("sd2"),
          col("sd") * col("sd")) - lit(1000000L)).as("cv2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L)
    assert(got(2L) == 1881800L)
  }
}
