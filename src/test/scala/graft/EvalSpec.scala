package graft

import org.apache.spark.sql.functions._

import graft.operators.{Eval, EventTime, Graph, Quality}

/** Unit checks for the evaluation-metric, change-point, privacy-audit,
  * and HITS operators — each against a hand-computed or independently
  * simulated reference, not just shape.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- AUC

  test("rocAucPpm is 1e6 on perfect separation and 0 on inverted") {
    val df = Seq(
      ("g", false, 1L), ("g", false, 2L), ("g", true, 3L), ("g", true, 4L),
      ("b", true, 1L), ("b", true, 2L), ("b", false, 3L), ("b", false, 4L))
      .toDF("grp", "y", "s")
    val out = Eval.rocAucPpm(df, col("grp"), col("y"), col("s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("g") == 1000000L)
    assert(out("b") == 0L)
  }

  test("rocAucPpm mid-ranks ties: one tied pos/neg pair = half credit") {
    // pos at 2, neg at 2 (tied), neg at 1: pairs = (2,2)->0.5, (2,1)->1
    // AUC = 1.5/2 = 0.75
    val df = Seq(("g", true, 2L), ("g", false, 2L), ("g", false, 1L))
      .toDF("grp", "y", "s")
    val out = Eval.rocAucPpm(df, col("grp"), col("y"), col("s")).collect()
    assert(out.head.getLong(3) == 750000L)
  }

  test("rocAucPpm yields NULL on single-class groups") {
    val df = Seq(("g", true, 1L), ("g", true, 2L)).toDF("grp", "y", "s")
    val out = Eval.rocAucPpm(df, col("grp"), col("y"), col("s")).collect()
    assert(out.head.isNullAt(3))
  }

  test("rocAucPpm equals the O(n^2) pair-counting definition on a seeded sample") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map { i =>
      ("g", rnd.nextBoolean(), rnd.nextInt(10).toLong) }
    val out = Eval.rocAucPpm(rows.toDF("grp", "y", "s"),
      col("grp"), col("y"), col("s")).collect().head.getLong(3)
    val pos = rows.filter(_._2).map(_._3)
    val neg = rows.filterNot(_._2).map(_._3)
    // 2x pair credit: win=2, tie=1 — integer, no float comparison
    val credit2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(out == credit2 * 1000000L / (2L * pos.size * neg.size))
  }

  test("rocAucWeightedPpm: w=1 equals the row form, uniform scaling is " +
      "invariant, and the bootstrap band covers the point estimate") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 200).map { i =>
      val y = rnd.nextBoolean()
      ("g", i.toLong, y, (rnd.nextInt(20) + (if (y) 6 else 0)).toLong)
    }
    val df = rows.toDF("g", "id", "y", "s")
    val point = Eval.rocAucPpm(df, col("g"), col("y"), col("s"))
      .collect().head.getLong(3)
    def weighted(w: Long) = Eval.rocAucWeightedPpm(df, col("g"), col("y"),
      col("s"), lit(w)).collect().head.getLong(3)
    assert(weighted(1L) == point, "w=1 must telescope to the row form")
    assert(weighted(3L) == point, "AUC is invariant under uniform weights")
    val band = Eval.rocAucBootstrapPpm(df, col("id"), col("y"), col("s"),
        replicas = 16)
      .collect().map(_.getLong(3))
    assert(band.length == 16)
    assert(band.min <= point && point <= band.max,
      s"point AUC $point outside bootstrap band [${band.min}, ${band.max}]")
    assert(band.min > 600000L, "separable data: every replica must beat chance")
  }

  test("rocAucWeightedPpm survives n_pos*n_neg beyond the single-step " +
      "ppm-multiply overflow bound (~4.6e12)") {
    // 3e6 pseudo-rows per side: n_pos*n_neg = 9e12, so the old
    // `num * 1000000 div den` form would wrap 2^63 and go negative;
    // the staged Horner scaling must still give the exact mid-rank AUC.
    // neg at score 1 (3e6), pos at 2 (2e6), neg at 2 (1e6), pos at 3 (1e6):
    // credit2 = 2*(2e6*3e6 + 1e6*(3e6+1e6)) + 2*(2e6*1e6)... compute in
    // BigInt below instead of hand arithmetic.
    val w = 1000000L
    val rows = Seq((false, 1L, 3 * w), (true, 2L, 2 * w), (false, 2L, w),
      (true, 3L, w))
    val df = rows.map { case (y, s, ww) => ("g", y, s, ww) }
      .toDF("grp", "y", "s", "w")
    val got = Eval.rocAucWeightedPpm(df, col("grp"), col("y"), col("s"),
      col("w")).collect().head.getLong(3)
    val pos = rows.filter(_._1).map(r => (r._2, BigInt(r._3)))
    val neg = rows.filterNot(_._1).map(r => (r._2, BigInt(r._3)))
    val credit2 = (for ((ps, pw) <- pos; (ns, nw) <- neg) yield
      pw * nw * (if (ps > ns) 2 else if (ps == ns) 1 else 0)).sum
    val want = credit2 * 1000000 /
      (2 * pos.map(_._2).sum * neg.map(_._2).sum)
    assert(got == want.toLong && got >= 0L && got <= 1000000L)
  }

  test("prCurvePpm: monotone recall, hand-checked operating points") {
    // scores desc: 5(pos), 4(neg), 3(pos), 2(pos), 1(neg)
    val df = Seq(("g", true, 5L), ("g", false, 4L), ("g", true, 3L),
      ("g", true, 2L), ("g", false, 1L)).toDF("g", "y", "s")
    val pts = Eval.prCurvePpm(df, col("g"), col("y"), col("s"))
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(pts.toSeq == Seq(
      (5L, 1L, 1L, 1000000L, 333333L),   // t=5: P=1, R=1/3
      (4L, 1L, 2L, 500000L, 333333L),    // t=4: P=1/2
      (3L, 2L, 3L, 666666L, 666666L),
      (2L, 3L, 4L, 750000L, 1000000L),   // full recall
      (1L, 3L, 5L, 600000L, 1000000L)))
    // recall is monotone non-decreasing as the threshold drops
    assert(pts.map(_._5).toSeq == pts.map(_._5).sorted.toSeq)
  }

  // -------------------------------------------------------- calibration

  test("calibrationBins: bin edges, counts, and the derived ECE") {
    val df = Seq(
      (50000L, false), (150000L, false), (150000L, true),
      (950000L, true), (1000000L, true)).toDF("p", "y")
    val bins = Eval.calibrationBins(df, col("p"), col("y"), bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    // p=1e6 joins bin 9 (closed top edge), not a phantom bin 10
    assert(bins.keySet == Set(0L, 1L, 9L))
    assert(bins(0L) == ((1L, 50000L, 0L)))
    assert(bins(1L) == ((2L, 150000L, 500000L)))
    assert(bins(9L) == ((2L, 975000L, 1000000L)))
    // ECE = sum n_b * gap_b / N over the output rows
    val eceNum = Eval.calibrationBins(df, col("p"), col("y"), bins = 10)
      .agg(sum(col("n") * col("gap_ppm"))).collect().head.getLong(0)
    assert(eceNum == 800000L)       // 1*50000 + 2*350000 + 2*25000
    assert(eceNum / 5L == 160000L)  // ECE = 0.16
  }

  // -------------------------------------------------------------- kappa

  test("cohenKappaPpm: perfect=1e6, independent~0, worse-than-chance<0") {
    val perfect = Seq(("g", "a", "a"), ("g", "b", "b"))
      .toDF("grp", "ra", "rb")
    assert(Eval.cohenKappaPpm(perfect, col("grp"), col("ra"), col("rb"))
      .collect().head.getLong(3) == 1000000L)
    // 2x2 balanced marginals, zero agreement: po=0, pe=1/2, kappa=-1
    val anti = Seq(("g", "a", "b"), ("g", "b", "a"),
      ("g", "a", "b"), ("g", "b", "a")).toDF("grp", "ra", "rb")
    assert(Eval.cohenKappaPpm(anti, col("grp"), col("ra"), col("rb"))
      .collect().head.getLong(3) == -1000000L)
  }

  test("cohenKappaPpm hand case: po=0.6 pe=0.5 => kappa=0.2") {
    // 10 rows, balanced binary marginals for both raters, 6 agreements
    val rows = Seq(
      ("g", "x", "x"), ("g", "x", "x"), ("g", "x", "x"),
      ("g", "y", "y"), ("g", "y", "y"), ("g", "y", "y"),
      ("g", "x", "y"), ("g", "x", "y"),
      ("g", "y", "x"), ("g", "y", "x")).toDF("grp", "ra", "rb")
    val out = Eval.cohenKappaPpm(rows, col("grp"), col("ra"), col("rb"))
      .collect().head
    assert(out.getLong(1) == 10L && out.getLong(2) == 6L)
    assert(out.getLong(3) == 200000L)
  }

  test("cohenKappaPpm: both raters constant-identical yields NULL") {
    val df = Seq(("g", "a", "a"), ("g", "a", "a")).toDF("grp", "ra", "rb")
    assert(Eval.cohenKappaPpm(df, col("grp"), col("ra"), col("rb"))
      .collect().head.isNullAt(3))
  }

  test("cohenKappaPpm: raters with disjoint label sets emit kappa=0, " +
      "not a dropped group") {
    // rater A only says {x, y}, rater B only says {p, q}: no marginal
    // overlap, pe = 0, agree = 0 — exactly chance-level agreement
    val df = Seq(("g", "x", "p"), ("g", "y", "q"), ("g", "x", "q"),
      ("ok", "a", "a"), ("ok", "b", "b")).toDF("grp", "ra", "rb")
    val out = Eval.cohenKappaPpm(df, col("grp"), col("ra"), col("rb"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.contains("g"), "disjoint-label group must not vanish")
    assert(out("g") == Some(0L))
    assert(out("ok") == Some(1000000L)) // sibling group unaffected
  }

  test("krippendorffAlphaPpm: hand case 128/240, perfect=1e6, " +
      "degenerate constant group NULL, incomplete units drop") {
    // g1: u1(a,a) u2(b,b) u3(a,b) u4(b,b): P=6, D1=8, Q=26, D2=56
    // alpha = (6*56 - 26*8)/(8*(56-26)) = 128/240 -> 533333 ppm
    val g1 = Seq(("g1", 1L, "a"), ("g1", 1L, "a"), ("g1", 2L, "b"),
      ("g1", 2L, "b"), ("g1", 3L, "a"), ("g1", 3L, "b"), ("g1", 4L, "b"),
      ("g1", 4L, "b"))
    // g2: perfect 2-label agreement -> 1e6; g3: every rating 'x' -> NULL
    val g2 = Seq(("g2", 1L, "a"), ("g2", 1L, "a"), ("g2", 2L, "b"),
      ("g2", 2L, "b"))
    val g3 = Seq(("g3", 1L, "x"), ("g3", 1L, "x"), ("g3", 2L, "x"),
      ("g3", 2L, "x"))
    // g4 = g1 plus a 1-rating unit that must DROP (complete design)
    val g4 = g1.map { case (_, u, v) => ("g4", u, v) } :+ (("g4", 9L, "z"))
    val df = (g1 ++ g2 ++ g3 ++ g4).toDF("grp", "u", "v")
    val out = Eval.krippendorffAlphaPpm(df, col("grp"), col("u"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(out("g1") == ((4L, Some(533333L))))
    assert(out("g2") == ((2L, Some(1000000L))))
    assert(out("g3") == ((2L, None)))
    assert(out("g4") == ((4L, Some(533333L))),
      "the incomplete unit must drop without perturbing alpha")
  }

  // ------------------------------------------------------- concordance

  test("rankConcordancePpm: perfect=1e6, reversed=-1e6, constant-u NULLs") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("dn", 1L, 30L), ("dn", 2L, 20L), ("dn", 3L, 10L),
      ("flat", 5L, 1L), ("flat", 5L, 2L), ("flat", 5L, 3L))
      .toDF("grp", "u", "v")
    val out = Eval.rankConcordancePpm(df, col("grp"), col("u"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getLong(4) == 1000000L)   // tau_a
    assert(out("up").getLong(5) == 1000000L)   // gamma
    assert(out("up").getLong(6) == 1000000L)   // somers
    assert(out("dn").getLong(4) == -1000000L)
    assert(out("dn").getLong(5) == -1000000L)
    // constant u: no untied-u pairs -> gamma and somers undefined
    assert(out("flat").getLong(2) == 0L && out("flat").getLong(3) == 0L)
    assert(out("flat").getLong(4) == 0L)       // tau_a = 0 (all tied)
    assert(out("flat").isNullAt(5) && out("flat").isNullAt(6))
  }

  test("rankConcordancePpm hand case with ties: C=4 D=1 Ta=1") {
    // rows (u,v): (1,1) (1,2) (2,1) (3,3): pairs
    //   (r1,r2): u tied        -> neither C nor D (Ta pair)
    //   (r1,r3): u<, v=        -> tie in v only
    //   (r1,r4): u<, v<        -> C
    //   (r2,r3): u<, v>        -> D
    //   (r2,r4): u<, v<        -> C
    //   (r3,r4): u<, v<        -> C
    // C=3 D=1, n=4: tau_a=(3-1)/6=333333, gamma=2/4=500000,
    // somers=(3-1)/(6-1)=400000
    val df = Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 1L),
      ("g", 3L, 3L)).toDF("grp", "u", "v")
    val r = Eval.rankConcordancePpm(df, col("grp"), col("u"), col("v"))
      .collect().head
    assert((r.getLong(2), r.getLong(3)) == ((3L, 1L)))
    assert(r.getLong(4) == 333333L)
    assert(r.getLong(5) == 500000L)
    assert(r.getLong(6) == 400000L)
  }

  test("rankConcordancePpm equals brute-force pair counting on a seeded sample") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 80).map { _ =>
      ("g", rnd.nextInt(6).toLong, rnd.nextInt(6).toLong) }
    val r = Eval.rankConcordancePpm(rows.toDF("grp", "u", "v"),
      col("grp"), col("u"), col("v")).collect().head
    var c = 0L; var d = 0L; var ta = 0L
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val (_, u1, v1) = rows(i); val (_, u2, v2) = rows(j)
      if (u1 != u2) {
        if ((u1 < u2) == (v1 < v2) && v1 != v2) c += 1
        else if (v1 != v2) d += 1
      } else ta += 1
    }
    val n = rows.size.toLong
    assert((r.getLong(2), r.getLong(3)) == ((c, d)))
    assert(r.getLong(4) == 2L * (c - d) * 1000000L / (n * (n - 1)))
    assert(r.getLong(5) == (c - d) * 1000000L / (c + d))
    assert(r.getLong(6) ==
      2L * (c - d) * 1000000L / (n * (n - 1) - 2L * ta))
  }

  // ------------------------------------------------------------- brier

  test("brierDecompPpm: perfect forecast has brier=0 and gap=0") {
    val df = Seq(("g", 1000000L, true), ("g", 0L, false))
      .toDF("grp", "p", "y")
    val r = Eval.brierDecompPpm(df, col("grp"), col("p"), col("y"))
      .collect().head
    assert(r.getAs[Long]("brier_ppm") == 0L)
    assert(r.getAs[Long]("reliability_ppm") == 0L)
    // resolution == uncertainty == 250000 (ybar=1/2), identity exact here
    assert(r.getAs[Long]("resolution_ppm") == 250000L)
    assert(r.getAs[Long]("uncertainty_ppm") == 250000L)
    assert(r.getAs[Long]("decomp_gap_ppm") == 0L)
  }

  test("brierDecompPpm: constant p=ybar forecast has resolution 0, " +
      "brier ~= uncertainty") {
    // p = 500000 on 2 pos + 2 neg: brier = (5e5)^2/1e12 = 250000 ppm,
    // reliability 0 (bin mean == bin outcome rate), resolution 0
    val df = Seq(("g", 500000L, true), ("g", 500000L, true),
      ("g", 500000L, false), ("g", 500000L, false)).toDF("grp", "p", "y")
    val r = Eval.brierDecompPpm(df, col("grp"), col("p"), col("y"))
      .collect().head
    assert(r.getAs[Long]("brier_ppm") == 250000L)
    assert(r.getAs[Long]("reliability_ppm") == 0L)
    assert(r.getAs[Long]("resolution_ppm") == 0L)
    assert(r.getAs[Long]("uncertainty_ppm") == 250000L)
    assert(r.getAs[Long]("decomp_gap_ppm") == 0L)
  }

  test("brierDecompPpm matches a scalar replay of the integer arithmetic " +
      "and the binning residual stays within its theoretical envelope") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { _ =>
      val p = rnd.nextInt(1000001).toLong
      ("g", p, rnd.nextInt(1000000) < p) // calibrated-ish
    }
    val r = Eval.brierDecompPpm(rows.toDF("grp", "p", "y"),
      col("grp"), col("p"), col("y")).collect().head
    // scalar replay with identical truncation points
    val n = rows.size.toLong
    val pos = rows.count(_._3).toLong
    val brier = rows.map { case (_, p, y) =>
      val yv = if (y) 1000000L else 0L; ((p - yv) * (p - yv)) / 1000000L
    }.sum / n
    val bins = rows.groupBy { case (_, p, _) =>
      math.min(9L, p * 10L / 1000000L) }
    val ybar = pos * 1000000L / n
    val rel = bins.values.map { g =>
      val nk = g.size.toLong
      val conf = g.map(_._2).sum / nk
      val ybin = g.count(_._3).toLong * 1000000L / nk
      nk * (((ybin - conf) * (ybin - conf)) / 1000000L)
    }.sum / n
    val res = bins.values.map { g =>
      val nk = g.size.toLong
      val ybin = g.count(_._3).toLong * 1000000L / nk
      nk * (((ybin - ybar) * (ybin - ybar)) / 1000000L)
    }.sum / n
    val unc = pos * (n - pos) * 1000000L / (n * n)
    assert(r.getAs[Long]("brier_ppm") == brier)
    assert(r.getAs[Long]("reliability_ppm") == rel)
    assert(r.getAs[Long]("resolution_ppm") == res)
    assert(r.getAs[Long]("uncertainty_ppm") == unc)
    assert(r.getAs[Long]("decomp_gap_ppm") == brier - (rel - res + unc))
    // Stephenson residual: |gap| is bounded by the within-bin forecast
    // variance scale — bin width 1e5 => variance <= width^2/4 = 2500 ppm,
    // covariance can at most double it (plus ppm truncation slack).
    assert(math.abs(r.getAs[Long]("decomp_gap_ppm")) <= 5000L,
      "binning residual must stay within the bin-width envelope")
  }

  // ----------------------------------------------------------- mcnemar

  test("mcnemarPpm: hand case b=3 c=1 -> 1e6; never-discordant -> NULL") {
    // label always true; A predicts true except 1 row, B true except 3
    // other rows => b = |A right, B wrong| = 3, c = 1
    val df = Seq(
      ("g", true, true, true),   // both right
      ("g", false, true, true),  // c: A wrong B right
      ("g", true, false, true), ("g", true, false, true),
      ("g", true, false, true),  // b x3
      ("same", true, true, true), ("same", false, false, true))
      .toDF("grp", "a", "b", "y")
    val out = Eval.mcnemarPpm(df, col("grp"), col("a"), col("b"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getLong(3) == 3L && out("g").getLong(4) == 1L)
    assert(out("g").getLong(5) == 1000000L) // (3-1)^2/(3+1) = 1
    assert(out("same").isNullAt(5))
  }

  // -------------------------------------------------------------- stump

  test("giniStump: perfect split scores n*1e6 and picks the boundary; " +
      "random case matches brute force") {
    // perfectly separable: y = (f >= 10) over f = 1..20
    val sep = (1L to 20L).map(f => ("g", f >= 10L, f)).toDF("g", "y", "f")
    val best = Eval.giniStump(sep, col("g"), col("y"), col("f"))
      .collect().head
    assert(best.getLong(1) == 9L)          // split at f <= 9
    assert(best.getLong(6) == 20L * 1000000L) // pure children: score = n
    // random labels: exact match with the brute-force sweep
    val rnd = new scala.util.Random(31)
    val rows = (1 to 100).map(_ => ("g", rnd.nextBoolean(),
      rnd.nextInt(10).toLong))
    val got = Eval.giniStump(rows.toDF("g", "y", "f"),
      col("g"), col("y"), col("f")).collect().head
    val n = rows.size.toLong
    val pt = rows.count(_._2).toLong
    val cands = rows.map(_._3).distinct.sorted.init.map { t =>
      val (l, r) = rows.partition(_._3 <= t)
      val (nl, pl) = (l.size.toLong, l.count(_._2).toLong)
      val (nr, pr) = (r.size.toLong, r.count(_._2).toLong)
      val ssl = pl * pl + (nl - pl) * (nl - pl)
      val ssr = pr * pr + (nr - pr) * (nr - pr)
      (t, (ssl * nr + ssr * nl) * 1000000L / (nl * nr))
    }
    val (wantT, wantS) = cands.maxBy { case (t, s) => (s, -t) }
    assert(got.getLong(1) == wantT && got.getLong(6) == wantS)
    assert(pt > 0 && pt < n) // the random case was non-degenerate
  }

  // ---------------------------------------------------------- conformal

  test("conformalCoverage: radius is the exact order statistic and the " +
      "guarantee holds within binomial noise") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 3000).map(i =>
      ("g", i.toLong, (5000 + rnd.nextGaussian() * 300).toLong))
    val out = Eval.conformalCoverage(rows.toDF("g", "id", "v"),
      col("g"), col("id"), col("v"), alphaPpm = 100000L).collect().head
    val (pred, nCal, qHat, nTest, covPpm) = (out.getLong(1), out.getLong(2),
      out.getLong(3), out.getLong(4), out.getLong(6))
    // reproduce the split + order statistic in memory from the same md5
    def bkt(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100L
    }
    val train = rows.filter(r => bkt(r._2) < 60).map(_._3)
    val refPred = train.sum / train.size
    assert(pred == refPred)
    val calR = rows.filter(r => { val b = bkt(r._2); b >= 60 && b < 80 })
      .map(r => math.abs(r._3 - refPred)).sorted
    assert(nCal == calR.size)
    val k = math.min(calR.size.toLong,
      ((calR.size + 1L) * 900000L + 999999L) / 1000000L).toInt
    assert(qHat == calR(k - 1), "radius must be the k-th smallest residual")
    // split-conformal coverage ~ 90%: allow 4 binomial sigmas
    val sigmaPpm = (4 * math.sqrt(0.9 * 0.1 / nTest) * 1e6).toLong
    assert(math.abs(covPpm - 900000L) <= sigmaPpm,
      s"coverage $covPpm ppm too far from 900000 (n_test=$nTest)")
  }

  // ---------------------------------------------------------- bootstrap

  test("poissonBootstrapMeans equals an independent md5 reference and " +
      "the replica band covers the true mean") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map(i => ("g", i.toLong, (rnd.nextInt(1000) + 500).toLong))
    val out = Eval.poissonBootstrapMeans(rows.toDF("g", "id", "v"),
        col("g"), col("id"), col("v"), replicas = 16)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // independent reference: java MessageDigest, not Spark's md5 —
    // replica b reads hex window (b % 4) of md5("id|" + b/4)
    def weight(id: Long, b: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|${b / 4}".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      val win = hex.substring((b % 4).toInt * 8, (b % 4).toInt * 8 + 8)
      val u = java.lang.Long.parseLong(win, 16) % 1000000L
      Eval.PoissonPpm.indexWhere(u < _) match {
        case -1 => 4L
        case k => k.toLong
      }
    }
    val ref = (0L until 16L).map { b =>
      val ws = rows.map { case (_, id, v) => (weight(id, b), v) }
      val nEff = ws.map(_._1).sum
      val sumV = ws.map { case (w, v) => w * v }.sum
      b -> ((nEff, sumV, sumV / nEff))
    }.toMap
    assert(out == ref, "operator diverged from the independent md5 reference")
    // statistical sanity: every replica resamples ~n rows, and the true
    // mean sits inside the replica min..max band
    val trueMean = rows.map(_._3).sum / rows.size
    val means = out.values.map(_._3)
    assert(out.values.forall { case (n, _, _) =>
      n > 200 && n < 400 }, "Poisson(1) resample size far from n")
    assert(means.min <= trueMean && trueMean <= means.max,
      s"true mean $trueMean outside replica band [${means.min}, ${means.max}]")
  }

  // --------------------------------------------------------- chi-square

  test("chiSquare2x2: zero on independence, N on perfect association, hand case") {
    def cells(a: Int, b: Int, c: Int, d: Int) = {
      val rows = Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false))
      val df = rows.map { case (t, y) => ("g", t, y) }.toDF("g", "t", "y")
      Eval.chiSquare2x2(df, col("g"), col("t"), col("y")).collect().head
    }
    assert(cells(10, 10, 10, 10).getDouble(5) == 0.0)
    assert(cells(20, 0, 0, 20).getDouble(5) == 40.0) // chi2 == N
    // a=10 b=20 c=20 d=10: 60 * 300^2 / 30^4 = 6.666667
    assert(cells(10, 20, 20, 10).getDouble(5) == 6.666667)
    // empty margin (no positive outcomes anywhere) => NULL, not a crash
    assert(cells(0, 15, 0, 15).isNullAt(5))
  }

  // -------------------------------------------------------------- CUSUM

  test("cusum matches the sequential max(0, S + d) recurrence exactly") {
    val rnd = new scala.util.Random(11)
    val series = (1 to 40).map(i => (i.toLong,
      (rnd.nextInt(5) + (if (i > 30) 4 else 0)).toLong))
    val df = series.map { case (t, x) => ("k", t, x) }.toDF("key", "t", "x")
    val out = EventTime.cusum(df, col("key"), col("t"), col("x"),
      k = 1L, h = 5L)
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getBoolean(5)))
    // independent in-memory reference on the SAME scaled integers
    val n = series.size.toLong
    val total = series.map(_._2).sum
    var s = 0L
    val ref = series.map { case (t, x) =>
      s = math.max(0L, s + (n * x - total - n * 1L))
      (t, s, s >= 5L * n)
    }
    assert(out.toSeq == ref)
    // the late level shift must actually alarm, and the start must not
    assert(ref.takeWhile(_._1 <= 20).forall(!_._3))
    assert(ref.exists(_._3))
  }

  test("cusumTwoSided: a level DROP alarms on the low side only, both " +
      "sides match the sequential recurrences") {
    val series = (1L to 40L).map(t => (t, if (t > 30) 0L else 4L))
    val df = series.map { case (t, x) => ("k", t, x) }.toDF("key", "t", "x")
    val out = EventTime.cusumTwoSided(df, col("key"), col("t"), col("x"),
        k = 1L, h = 5L)
      .orderBy("t").collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getBoolean(6)))
    val n = series.size.toLong
    val total = series.map(_._2).sum
    var hi = 0L; var lo = 0L
    val ref = series.map { case (_, x) =>
      hi = math.max(0L, hi + (n * x - total - n))
      lo = math.max(0L, lo + (total - n * x - n))
      (hi, lo, hi >= 5L * n || lo >= 5L * n)
    }
    assert(out.toSeq == ref)
    // the drop fires the LOW chart; the high chart never alarms
    assert(out.exists { case (_, sl, a) => a && sl >= 5L * n })
    assert(out.forall { case (sh, _, _) => sh < 5L * n })
  }

  test("frequentTriples equals the brute-force 3-way basket join") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 60).flatMap { g =>
      (1 to 4).map(_ => (g.toLong, rnd.nextInt(12).toLong)) }
    val df = rows.toDF("g", "it")
    val got = graft.operators.Relational
      .frequentTriples(df, "g", "it", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val baskets = rows.distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.sorted).toMap
    val want = baskets.values.flatMap(items =>
        items.combinations(3).map(c => (c(0), c(1), c(2))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L)
      .map { case ((a, b, c), s) => (a, b, c, s) }.toSet
    assert(got == want)
  }

  test("frequentTriples on STRING items whose lexicographic order breaks " +
      "numeric order still finds every triple") {
    // items '2' < '10' numerically but '10' < '2' lexicographically:
    // without the internal cast-to-long before pair generation, the
    // candidate self-join's order assumption silently misses this triple
    val rows = (1 to 3).flatMap(g =>
      Seq((g.toLong, "2"), (g.toLong, "10"), (g.toLong, "30")))
    val df = rows.toDF("g", "it")
    val got = graft.operators.Relational
      .frequentTriples(df, "g", "it", minSupport = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((2L, 10L, 30L, 3L)))
  }

  // ------------------------------------------------------------ privacy

  test("lDiversityClasses flags exactly the under-l classes") {
    val df = Seq(
      ("n1", "s1", 1L), ("n1", "s1", 1L), ("n1", "s1", 2L),
      ("n2", "s1", 1L), ("n2", "s1", 2L), ("n2", "s1", 3L))
      .toDF("nation", "seg", "sens")
    val out = Quality.lDiversityClasses(df,
      Seq(col("nation"), col("seg")), col("sens"), l = 3L).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "n1" && out.head.getLong(3) == 2L)
  }

  test("tClosenessEmd: class == global gives 0; concentrated class is exact") {
    // global: 4 rows in bucket 0, 4 in bucket 2 (m=3); class A mirrors
    // the global mix, class B sits entirely in bucket 0
    val df = Seq(
      ("A", 0L), ("A", 0L), ("A", 2L), ("A", 2L),
      ("B", 0L), ("B", 0L), ("B", 2L), ("B", 2L))
      .toDF("cls", "b")
    val mirror = Quality.tClosenessEmd(df, Seq(col("cls")), col("b"), m = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mirror("A") == 0L && mirror("B") == 0L)
    val skew = Seq(
      ("A", 0L), ("A", 0L), ("A", 2L), ("A", 2L),
      ("B", 0L), ("B", 0L), ("B", 0L), ("B", 0L))
      .toDF("cls", "b")
    val out = Quality.tClosenessEmd(skew, Seq(col("cls")), col("b"), m = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // global p=(6/8, 0, 2/8); B=(1,0,0): prefixes |1-3/4|=1/4, |1-3/4|=1/4
    // EMD = (1/2)(1/4+1/4) = 1/4
    assert(out("B") == 250000L)
    // A=(1/2,0,1/2): prefixes |1/2-3/4|=1/4 twice -> EMD = 1/4
    assert(out("A") == 250000L)
  }

  test("dpNoisyCounts: noise matches an independent md5 reference, is " +
      "bounded, and changes with the release tag") {
    val df = (1 to 200).map(i => (s"k${i % 10}", i)).toDF("key", "x")
    def release(tag: String) =
      Quality.dpNoisyCounts(df, Seq(col("key")), tag)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val r1 = release("t1")
    def refZ(key: String, tag: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key|$tag".getBytes("UTF-8"))
        .take(4).map(x => f"${x & 0xff}%02x").mkString
      val u = java.lang.Long.parseLong(hex, 16) % 1000000L
      Quality.TwoSidedGeomPpm.find(u < _._2).map(_._1).getOrElse(8L)
    }
    r1.foreach { case (k, (n, z, noisy)) =>
      assert(n == 20L)
      assert(z == refZ(k, "t1"), s"noise draw diverged for $k")
      assert(z >= -8L && z <= 8L && noisy == math.max(0L, n + z))
    }
    // deterministic per (key, tag); a new tag is a NEW release draw
    assert(release("t1") == r1, "release must be re-run-stable")
    val r2 = release("t2")
    assert(r1.keys.exists(k => r1(k)._2 != r2(k)._2),
      "distinct tags should draw distinct noise somewhere")
  }

  test("dpNoisyCounts: a NULL key value hashes via the coalesce-to-'' " +
      "convention, not by vanishing from the concat") {
    // two key columns; the (null, 'b') tuple must render as '|b|tag' —
    // concat_ws would otherwise SKIP the null (rendering 'b|tag'),
    // colliding with a hypothetical single-key tuple and diverging from a
    // null-propagating '||' oracle
    val df = Seq((Option.empty[String], "b"), (None, "b"), (Some("x"), "b"))
      .toDF("k1", "k2")
    val out = Quality.dpNoisyCounts(df, Seq(col("k1"), col("k2")), "t")
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    def refZ(canon: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8"))
        .take(4).map(x => f"${x & 0xff}%02x").mkString
      val u = java.lang.Long.parseLong(hex, 16) % 1000000L
      Quality.TwoSidedGeomPpm.find(u < _._2).map(_._1).getOrElse(8L)
    }
    assert(out((None, "b"))._1 == 2L)
    assert(out((None, "b"))._2 == refZ("|b|t"),
      "null key must render as empty-with-separator")
    assert(out((Some("x"), "b"))._2 == refZ("x|b|t"))
  }

  test("tvdPpm: identical slices give 0, disjoint categories give 1e6, " +
      "hand mixture is exact") {
    import spark.implicits._
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("cat", "ia")
    assert(Quality.tvdPpm(same, col("cat"), col("ia"))
      .collect().head.getLong(3) == 0L)
    val disjoint = Seq(("x", true), ("y", false)).toDF("cat", "ia")
    assert(Quality.tvdPpm(disjoint, col("cat"), col("ia"))
      .collect().head.getLong(3) == 1000000L)
    // A: 3x,1y ; B: 1x,3y -> TVD = 1/2(|3/4-1/4| + |1/4-3/4|) = 1/2
    val mix = (Seq.fill(3)(("x", true)) ++ Seq(("y", true)) ++
      Seq(("x", false)) ++ Seq.fill(3)(("y", false))).toDF("cat", "ia")
    assert(Quality.tvdPpm(mix, col("cat"), col("ia"))
      .collect().head.getLong(3) == 500000L)
  }

  // --------------------------------------------------------------- HITS

  test("hitsInt: authority ranking follows recursive hub quality, max==scale") {
    // u1 buys {p1, p2}; u2 buys {p1}; u3 buys {p3} and nothing else.
    // Round 1: a(p1)=2, a(p2)=1, a(p3)=1 -> p1 is top authority;
    // hubs: h(u1)=a(p1)+a(p2) > h(u2)=a(p1) > h(u3)=a(p3).
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 103L))
      .toDF("u", "p")
    val out = Graph.hitsInt(e, "u", "p", iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out(("auth", 101L)) == 1000000L) // top authority pinned at scale
    assert(out(("hub", 1L)) == 1000000L)    // top hub pinned at scale
    assert(out(("auth", 101L)) > out(("auth", 102L)))
    assert(out(("hub", 2L)) > out(("hub", 3L)))
    // p2 (bought only by the best hub) outranks p3 (bought by a weak hub)
    assert(out(("auth", 102L)) > out(("auth", 103L)))
    assert(out.keys.count(_._1 == "auth") == 3)
    assert(out.keys.count(_._1 == "hub") == 3)
  }

  test("paired bootstrap: identical rankers diff to exactly 0 in every " +
      "replica (weights are a pure function of (id, b))") {
    val rows = (1 to 200).map(i => (i.toLong, i % 3 == 0, (i * 7 % 50).toLong))
    val df = rows.toDF("id", "y", "s")
    val a = Eval.rocAucBootstrapPpm(df, col("id"), col("y"), col("s"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = Eval.rocAucBootstrapPpm(df, col("id"), col("y"), col("s"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b && a.size == 8,
      "same ranker under the same ids must replay identically per replica")
  }

  test("operating-point picks: best-F1 and min-cost thresholds equal a " +
      "scalar sweep over the same curve") {
    // scores desc: 5(pos) 4(neg) 3(pos) 2(pos) 1(neg) — the q242 fixture
    val rows = Seq((true, 5L), (false, 4L), (true, 3L), (true, 2L),
      (false, 1L))
    val df = rows.map { case (y, s) => ("g", y, s) }.toDF("g", "y", "s")
    val curve = Eval.prCurvePpm(df, col("g"), col("y"), col("s"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val pos = rows.count(_._1).toLong
    // scalar sweep
    val f1 = curve.map { case (t, tp, np) =>
      (t, 2 * tp * 1000000L / (np + pos)) }
    val bestF1 = f1.maxBy { case (t, f) => (f, -t) }
    val cost = curve.map { case (t, tp, np) =>
      (t, (np - tp) + 4 * (pos - tp)) }
    val bestCost = cost.minBy { case (t, c) => (c, t) }
    // replicate the query pipeline on the toy frame
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val scored = Eval.prCurvePpm(df, col("g"), col("y"), col("s"))
      .withColumn("pos_total", max(col("tp")).over(w))
      .withColumn("f1_ppm",
        expr("2 * tp * 1000000 div (n_pred + pos_total)"))
      .withColumn("cost",
        (col("n_pred") - col("tp")) + lit(4L) * (col("pos_total") - col("tp")))
    val gotF1 = graft.operators.Relational.topKPerGroup(scored,
        Seq(col("grp")), Seq(col("f1_ppm").desc, col("threshold").asc), 1)
      .select("threshold", "f1_ppm").collect().head
    assert((gotF1.getLong(0), gotF1.getLong(1)) == bestF1)
    val gotC = graft.operators.Relational.topKPerGroup(scored,
        Seq(col("grp")), Seq(col("cost").asc, col("threshold").asc), 1)
      .select("threshold", "cost").collect().head
    assert((gotC.getLong(0), gotC.getLong(1)) == bestCost)
    // the two objectives pick DIFFERENT points on this fixture?
    // (not required — just record what they chose for readability)
    assert(bestF1._1 == 2L, s"F1 optimum should include all positives: $bestF1")
    assert(bestCost._1 == 2L, s"fn-heavy cost also drains misses: $bestCost")
  }

  // The NB serve is a pure row-local map (literal model array + pinned
  // fold), so it runs UNCHANGED on a streaming frame — the learned
  // quality filter gates documents inline with ingest, no state store,
  // no shuffle. Parity: streamed scores == batch scores, row for row.
  test("nbClassify gates a STREAM identically to the batch serve") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val train = Seq(
      (1L, true, Seq("good", "clean", "prose", "good")),
      (2L, true, Seq("clean", "text", "prose")),
      (3L, false, Seq("spam", "spam", "buy", "now")),
      (4L, false, Seq("buy", "spam", "click"))
    ).toDF("doc_id", "y", "tok")
    val counts = graft.operators.Eval.nbCounts(train, "doc_id", "tok",
      col("y"), 16)
    val incoming = Seq(
      (10L, Seq("clean", "good", "prose")),
      (11L, Seq("buy", "spam", "now")),
      (12L, Seq.empty[String])
    ).toDF("doc_id", "tok")
    val batch = graft.operators.Eval.nbClassify(incoming, "doc_id", "tok",
        counts, 16)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    val inDir = java.nio.file.Files.createTempDirectory("graft-nbq-in")
    incoming.coalesce(1).write.mode("overwrite")
      .parquet(inDir.resolve("b.parquet").toString)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-nbq-out").toString
    val q = graft.operators.Eval.nbClassify(
        spark.readStream.schema(incoming.schema)
          .parquet(inDir.resolve("b.parquet").toString),
        "doc_id", "tok", counts, 16)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-nbq-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(outDir)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(streamed == batch,
      s"streamed NB gate != batch serve: $streamed vs $batch")
    assert(batch.exists(_._4) && batch.exists(!_._4),
      "toy gate should pass one doc and reject another")
  }
}
