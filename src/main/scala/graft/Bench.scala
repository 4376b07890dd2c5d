package graft

import org.apache.spark.sql.SparkSession

/** Benchmark driver: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization of every output column
  * through the noop sink (a bare count() would let Catalyst prune the
  * expensive expressions), and prints one JSON line.
  *
  * A warmup pass (same plans, same data) runs first so the timed passes
  * measure steady-state execution, not JIT/codegen/first-scan costs. Each
  * query is then timed `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
  * MEDIAN of the successful runs is reported: single-run timings on a
  * shared sandbox swing up to 4x on unchanged code (observed on q57/q58
  * across rounds 1-5), and the median is robust to one contention spike in
  * either direction. The full spread is preserved in a parallel
  * `"spread"` map ({min,med,max} per query) so a noisy median is
  * distinguishable from a real regression without rerunning.
  *
  * Self-archiving (round 9): the full JSON line is also written to
  * `bench_out.json` — the driver's artifact truncates long stdout tails,
  * which made per-query medians unauditable from the artifact alone
  * (round-8 verdict). If a previous `bench_out.json` exists (or
  * `SPARK_GRAFT_BENCH_PREV` points at one), a per-query ratio table
  * prints to stderr and queries regressing > 1.5× land in the JSON's
  * own `"regressions"` field, so round-over-round drift is visible
  * INSIDE the committed artifact. stdout stays exactly one JSON line —
  * the driver contract.
  *
  * Isolation: `spark.catalog.clearCache()` runs between queries. Several
  * queries `.cache()` intermediate frames (q52/q60's signature tables,
  * the shared embedding corpus) and Spark's cache manager would otherwise
  * carry them across query boundaries — later, iteration-heavy queries
  * would pay the accumulated GC/eviction bill of their predecessors
  * (observed as the round-6 q52 5.1 s anomaly). Each query now starts
  * from a cold cache and pays only its OWN caching cost.
  */
object Bench {

  /** 1/5/15-minute load averages, empty off-Linux. */
  private def loadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .trim.split(" ").take(3).mkString(",")
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val loadBefore = loadavg()
    val (calibStBefore, calibMtBefore) = BoxCalib.measure()
    System.err.println(f"[bench] box calib: single-thread $calibStBefore%.0f ms, " +
      f"all-cores $calibMtBefore%.0f ms")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query names: ${unknown.toSeq.sorted}")
    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.sorted.filter(args.contains)
      else SparkEntry.queries.keys.toSeq.sorted

    // Median of the successful runs, requiring a strict majority to
    // succeed: one transient failure out of 3 doesn't zero a working
    // query, but a majority-failing query still reports -1 so the JSON
    // can never pass a broken run off as a fast one. Failures are
    // excluded from the total.
    def spreadOf(name: String): (Double, Double, Double) = {
      spark.catalog.clearCache() // cold cache per query (see scaladoc)
      val ok = Seq.fill(runs)(runOnce(name)).filter(_ >= 0).sorted
      if (ok.size * 2 <= runs) (-1.0, -1.0, -1.0)
      else (ok.head, ok(ok.size / 2), ok.last)
    }

    names.foreach { n => spark.catalog.clearCache(); runOnce(n) } // warmup
    val results = names.map(n => n -> spreadOf(n))
    val qs = results.map { case (k, (_, med, _)) => "\"" + k + f"\":$med%.3f" }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, (min, med, max)) =>
      "\"" + k + f"""\":{"min":$min%.3f,"med":$med%.3f,"max":$max%.3f}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2._2).filter(_ >= 0).sum
    val failed = results.filter(_._2._2 < 0).map(r => "\"" + r._1 + "\"")
      .mkString("[", ",", "]")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

    // ---- previous-run medians (self-written flat format, regex is safe)
    // A FILTERED run (explicit query args) archives to a scratch path by
    // default — otherwise a 5-query spot-check would clobber the
    // committed full-coverage artifact (it did once; recovered from the
    // run log). The full-set default remains bench_out.json.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        if (args.nonEmpty) "tmp/bench_partial.json" else "bench_out.json"))
    val prevPath = sys.env.get("SPARK_GRAFT_BENCH_PREV")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get("bench_out.json"))
    val prevTxt: String =
      if (java.nio.file.Files.exists(prevPath))
        new String(java.nio.file.Files.readAllBytes(prevPath), "UTF-8")
      else ""
    val prev: Map[String, Double] = {
      val qseg = prevTxt.indexOf("\"queries\":")
      if (qseg < 0) Map.empty
      else "\"(q[^\"]+)\":(-?[0-9.]+)".r
        .findAllMatchIn(prevTxt.substring(qseg, prevTxt.indexOf('}', qseg) + 1))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    // the previous run's per-query MAX (from its recorded spread) — the
    // round-12 q267 lesson: a median-vs-median ratio flags a regression
    // when the PREV run was a lucky-fast outlier just as readily as when
    // the current run is slow; the spreads tell the two apart
    val prevMax: Map[String, Double] =
      """"(q[^"]+)":\{"min":-?[0-9.]+,"med":-?[0-9.]+,"max":(-?[0-9.]+)\}""".r
        .findAllMatchIn(prevTxt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val ratios = results.collect {
      case (k, (min, med, _)) if med > 0 && prev.getOrElse(k, -1.0) > 0 =>
        (k, prev(k), med, med / prev(k), min)
    }.sortBy(-_._4)
    // LOAD-GUARDED regression adjudication (round-9 verdict: all 29
    // flagged regressions that round were sandbox contention, and the
    // artifact couldn't tell): every >1.5x query is RE-RUN once,
    // serially, after the main passes. A regression that vanishes on the
    // quiet re-run (recheck within 1.5x of the previous round) is
    // labeled "contended", not "regression" — the committed artifact
    // adjudicates itself instead of sending a reader chasing phantoms.
    //
    // DEFERRED, LOAD-GATED rechecks (round-11 verdict: all 15
    // "regression" labels that round were contention — the recheck ran
    // immediately after the contended pass and INHERITED its load):
    // before each recheck the guard now polls /proc/loadavg until the
    // 1-minute average drops under SPARK_GRAFT_RECHECK_LOAD (default
    // cpus/4 — a serial recheck uses few cores, so sustained load above
    // that is foreign) or the SPARK_GRAFT_RECHECK_WAIT cap (default
    // 120 s) expires. The load AT recheck time is recorded per entry,
    // and a recheck that still ran above the gate can only CLEAR a flag
    // ("contended"), never confirm one — a slow recheck under foreign
    // load adjudicates nothing and is labeled "unadjudicated" so the
    // artifact sends the reader to an idle re-run instead of a phantom.
    //
    // ABSOLUTE NOISE FLOOR (round-10 verdict): a >1.5x ratio on a
    // 0.2-second query measures JVM/GC jitter, not code. Flagged entries
    // with cur < 0.5 s or an absolute delta < 0.3 s are presumed noise —
    // but (round-12, advisor) they still get the cheap recheck and the
    // result is recorded: "noise" only when the recheck also clears
    // (or re-lands under the floor), so a genuine sustained regression
    // on a sub-half-second query is adjudicated, not auto-dismissed.
    // Unreadable/unparsable /proc/loadavg yields a sentinel ABOVE any
    // plausible gate (round-12 advisor): 0.0 here silently passed the
    // gate, so a recheck under UNMEASURABLE load could confirm
    // "regression" — exactly what the gate exists to prevent. With the
    // sentinel, a non-clearing recheck under unknown load falls through
    // to "unadjudicated". 9999 (not Double.MaxValue) keeps the
    // "load_at_recheck" JSON field readable.
    val loadUnknown = 9999.0
    def loadavg1(): Double =
      try loadavg().split(",")(0).toDouble
      catch { case _: Throwable => loadUnknown }
    val loadGate = sys.env.get("SPARK_GRAFT_RECHECK_LOAD").map(_.toDouble)
      .getOrElse(Runtime.getRuntime.availableProcessors / 4.0)
    val waitCapMs = sys.env.get("SPARK_GRAFT_RECHECK_WAIT").map(_.toLong)
      .getOrElse(120L) * 1000L
    def awaitQuiet(): Double = {
      val t0 = System.nanoTime()
      var l = loadavg1()
      // waiting can't improve an UNREADABLE load reading — break straight
      // to the recheck; the sentinel still blocks "regression" below
      while (l > loadGate && l != loadUnknown &&
          (System.nanoTime() - t0) / 1e6 < waitCapMs) {
        Thread.sleep(5000); l = loadavg1()
      }
      l
    }
    val regressions = ratios.filter(_._4 > 1.5).map { case (k, p, c, r, cMin) =>
      val belowFloor = c < 0.5 || c - p < 0.3
      val loadAt = awaitQuiet()
      spark.catalog.clearCache()
      val recheck = runOnce(k)
      val cleared = recheck >= 0 &&
        (recheck <= p * 1.5 || (belowFloor && (recheck < 0.5 || recheck - p < 0.3)))
      // SPREAD OVERLAP (round-12 q267 post-mortem): the median ratio
      // fires just as readily when the PREV run was a lucky-fast
      // outlier as when this run is slow. If this run's fastest sample
      // still lands within 1.2x of the previous run's SLOWEST sample,
      // the two runs' distributions overlap — that is run-to-run
      // variance, labeled as such, not a regression.
      val pMax = prevMax.getOrElse(k, -1.0)
      val overlaps = pMax > 0 && cMin <= pMax * 1.2
      val status =
        if (cleared) { if (belowFloor) "noise" else "contended" }
        else if (overlaps) "overlap"
        else if (loadAt > loadGate) "unadjudicated"
        else "regression"
      System.err.println(f"[bench]   recheck $k%-28s $p%8.3f -> $c%8.3f " +
        f"recheck $recheck%8.3f load $loadAt%.2f prevMax $pMax%8.3f " +
        f"curMin $cMin%8.3f => $status")
      "\"" + k + f"""\":{"prev":$p%.3f,"cur":$c%.3f,"ratio":$r%.2f,""" +
        f""""recheck":$recheck%.3f,"load_at_recheck":$loadAt%.2f,""" +
        f""""prev_max":$pMax%.3f,"cur_min":$cMin%.3f,""" +
        f""""status":"$status"}"""
    }.mkString("{", ",", "}")
    if (ratios.nonEmpty) {
      System.err.println(f"[bench] vs ${prevPath.toString} (${ratios.size} " +
        "shared queries), slowest ratios first; >1.50 flags a regression:")
      ratios.take(15).foreach { case (k, p, c, r, _) =>
        System.err.println(f"[bench]   $k%-32s $p%8.3f -> $c%8.3f  x$r%.2f" +
          (if (r > 1.5) "  REGRESSION" else ""))
      }
    }

    // system-load context so a contended artifact is recognizable at a
    // glance (1/5/15-min /proc/loadavg before and after, plus the JVM's
    // processor count) — "load" sits AFTER "queries" so the flat-format
    // prev parser above stays valid
    val loadCtx = s""""load":{"before":"${esc(loadBefore)}","after":"${
      esc(loadavg())}","cpus":${Runtime.getRuntime.availableProcessors}}"""

    // box calibration, before AND after the suite (thermal/steal drift
    // across a ~25-minute run is itself worth a line), plus the
    // single-thread ratio against the PREV artifact's probe when it has
    // one — >1 means this boot's cores are slower than the boot being
    // compared against, and a fleet of "regressions" at ~that ratio is
    // the box, not the code
    val (calibStAfter, calibMtAfter) = BoxCalib.measure()
    val prevCalibSt = """"calib":\{"st_ms":(-?[0-9.]+)""".r
      .findFirstMatchIn(prevTxt).map(_.group(1).toDouble)
    val boxVsPrev = prevCalibSt.filter(_ > 0)
      .map(p => f""","box_vs_prev":${calibStBefore / p}%.2f""").getOrElse("")
    val calibCtx = f""""calib":{"st_ms":$calibStBefore%.1f,"mt_ms":$calibMtBefore%.1f,"st_ms_after":$calibStAfter%.1f,"mt_ms_after":$calibMtAfter%.1f$boxVsPrev}"""

    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failed,"regressions":$regressions,$loadCtx,$calibCtx,"runs":$runs,"sf":"${esc(sfDir)}"}"""
    // archive FIRST (the driver truncates stdout; the file is the record)
    Option(outPath.getParent).foreach(p =>
      java.nio.file.Files.createDirectories(p))
    java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
