package graft

/** Plan-shape regression guard: the physical properties SCALE.md claims
  * are pinned here, so a refactor that silently de-optimizes a plan
  * (loses a broadcast, adds an exchange, breaks codegen or the partial
  * aggregate) fails CI instead of surfacing as a 100 TB incident.
  * Queries run against the tiny sf0.001 fixture — only the PLAN matters.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q180 covariance matrix: ONE lineitem scan feeding partial " +
      "(map-side) product sums — never p^2 passes") {
    val p = plan("q180_cov_matrix")
    val scans = p.split("Scan parquet").length - 1
    assert(scans == 1, s"expected exactly one scan, got $scans:\n$p")
    assert(p.contains("partial_sum"),
      s"product sums lost their map-side partial phase:\n$p")
  }

  test("q178 sliding distinct: span expansion, no self-join — the " +
      "days-by-window rescan shape is pinned OUT") {
    val p = plan("q178_sliding_distinct")
    assert(p.contains("Generate") && p.contains("explode"),
      s"span expansion (explode(sequence)) missing:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"sliding distinct went quadratic:\n$p")
  }

  test("q176 link prediction: wedges form by equi-join on the center " +
      "node — no cartesian, no nested loop") {
    val p = plan("q176_link_predict")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wedge join went quadratic:\n$p")
  }

  test("q162 grouping sets: ONE Expand into ONE aggregate pair — the " +
    "input is scanned once, not once per set") {
    val p = plan("q162_grouping_sets")
    assert(p.contains("Expand"), s"grouping sets lost its Expand:\n$p")
    assert("Expand".r.findAllIn(p).size == 1,
      s"expected a single Expand (one scan for all sets):\n$p")
    assert(p.contains("partial_"), s"map-side partial aggregation lost:\n$p")
    assert(!p.contains("Union"),
      s"grouping sets degenerated into per-set scans unioned:\n$p")
  }

  test("q151/q156 prefix-filtered joins never plan a cartesian or " +
      "nested-loop product") {
    for (q <- Seq("q151_prefix_join", "q156_containment_join")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went quadratic:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q planned a nested loop:\n$p")
    }
  }

  test("q154 IVF-PQ streams the inverted lists against broadcast " +
      "query probes — no corpus-side cross product") {
    val p = plan("q154_ivfpq_topk")
    // the only cross joins allowed are the tiny broadcast centroid/stat
    // products; the cell-list scan itself must be a broadcast hash join
    assert(p.contains("BroadcastHashJoin"),
      s"cell scan lost its broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"cell scan fell back to sort-merge:\n$p")
  }

  test("q155 delta-join terms all broadcast the delta side") {
    val p = plan("q155_join_delta")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"delta term went quadratic:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast delta joins:\n$p")
  }

  test("q170 weighted similarity join: candidates and verify are all " +
      "equi-joins — the only nested loop is the 1-row corpus-count " +
      "broadcast") {
    val p = plan("q170_weighted_jaccard_join")
    assert(!p.contains("CartesianProduct"), s"q170 went quadratic:\n$p")
    // The only nested loop allowed is the 1-row corpus-count broadcast
    // (BuildRight, Inner) — it reprints once per cached-subtree
    // reference. A LeftOuter/Cross/BuildLeft nested loop, or one feeding
    // the candidate or verify joins, would change the shape string.
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnlj.forall(s => s.contains("BuildRight, Cross")
        || s.contains("BuildRight, Inner")),
      s"q170 planned a non-stat nested loop: $bnlj\n$p")
    // the heavy joins themselves must be equi (hash or sort-merge)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"),
      s"q170 lost its equi-joins:\n$p")
  }

  test("q166 sorted-neighborhood blocking joins on rank buckets — " +
      "never a cartesian, nested loop, or single-partition window") {
    val p = plan("q166_sorted_neighborhood")
    assert(!p.contains("CartesianProduct"), s"q166 went quadratic:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q166 planned a nested loop:\n$p")
    // the global rank must come from the zipWithIndex path, not a
    // Window.orderBy with no partition key (one-task funnel)
    assert(!p.contains("Window"),
      s"q166 regressed to a window-function global rank:\n$p")
  }

  test("q14 star join broadcasts every dimension (no fact-side shuffle join)") {
    val p = plan("q14_star_join")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a dimension fell back to sort-merge:\n$p")
  }

  test("q164 snowflake join: every dimension chain broadcasts (the fact-" +
    "fact join may also broadcast at tiny SF under AQE)") {
    val p = plan("q164_nation_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"expected supplier/customer/nation/nation to broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"join degenerated:\n$p")
  }

  test("q96 zorder is exchange-free whole-stage codegen") {
    val p = plan("q96_zorder")
    assert(!p.contains("Exchange"), s"zorder must not shuffle:\n$p")
    // the `*(n)` operator prefix is executedPlan.toString's marker for a
    // whole-stage-codegen stage
    assert(p.contains("*(1) Project"), s"zorder must codegen:\n$p")
  }

  test("q97 range window plans exactly one exchange") {
    val p = plan("q97_time_range_agg")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange:\n$p")
  }

  test("q98 bounded top-k runs as a partial ObjectHashAggregate") {
    val p = plan("q98_topk_bounded")
    assert(p.contains("ObjectHashAggregate"), s"expected object agg:\n$p")
    assert(p.contains("partial_topkaggregator"),
      s"map-side partial aggregation lost:\n$p")
  }

  test("q157 MG sketch partial-aggregates map-side and broadcasts the " +
    "candidate confirm join") {
    val p = plan("q157_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"), s"expected object agg:\n$p")
    assert(p.contains("partial_misragriesaggregator"),
      s"map-side bounded-sketch partial lost:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate confirm join must broadcast the <= m candidates:\n$p")
  }

  test("q13 pricing summary partial-aggregates before its single exchange") {
    val p = plan("q13_pricing_summary")
    assert(p.contains("partial_"), s"map-side combine lost:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange:\n$p")
  }

  test("q01 validation filter reaches the parquet scan as pushed filters") {
    val p = plan("q01_validate")
    assert(p.contains("PushedFilters: [IsNotNull"),
      s"pushdown missing from scan:\n$p")
  }

  test("q102 levenshtein cutoff is rewritten to band + thresholded DP") {
    val p = plan("q102_fuzzy_match")
    assert(p.contains("abs((length("),
      s"length-band prefilter missing:\n$p")
    assert(p.contains(", Some(3)) >= 0"),
      s"thresholded (early-exit) levenshtein missing:\n$p")
  }

  test("levenshtein band rule also rewrites the commuted spellings " +
      "(k >= lev, k > lev) — no optimizer pass canonicalizes direction") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    graft.plans.GraftRules.register(spark)
    // parquet-backed: a LocalRelation would be constant-folded wholesale
    // (ConvertToLocalRelation) and no Filter would survive to inspect
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-levplan").toString
    Seq(("kitten", "sitting"), ("abc", "abd")).toDF("a", "b")
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    def planOf(cond: String): String =
      df.filter(expr(cond)).queryExecution.executedPlan.toString
    for (cond <- Seq("levenshtein(a, b) <= 2", "2 >= levenshtein(a, b)",
        "levenshtein(a, b) < 3", "3 > levenshtein(a, b)")) {
      val p = planOf(cond)
      assert(p.contains("abs((length("),
        s"band prefilter missing for `$cond`:\n$p")
      assert(p.contains(", Some(2)) >= 0"),
        s"thresholded DP missing for `$cond`:\n$p")
    }
    // all four spellings are one predicate: identical surviving rows
    val want = df.filter(expr("levenshtein(a, b) <= 2")).collect().toSeq
    for (cond <- Seq("2 >= levenshtein(a, b)", "levenshtein(a, b) < 3",
        "3 > levenshtein(a, b)"))
      assert(df.filter(expr(cond)).collect().toSeq == want,
        s"rewritten `$cond` changed the result")
  }

  test("native as-of rejects empty join keys loudly at build time") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 9L, "x")).toDF("k2", "ts2", "v")
    val e = intercept[IllegalArgumentException] {
      graft.plans.NativeAsof.backward(l, r, Seq(), "ts", "ts2", Seq("v"))
    }
    assert(e.getMessage.contains("at least one key"),
      s"keyless as-of must fail in build(), not inside Spark: ${e.getMessage}")
  }

  test("q126 plans the native AsofJoin exec, one exchange+sort per side") {
    val p = plan("q126_asof_native")
    assert(p.contains("AsofJoin"), s"custom exec not planned:\n$p")
    assert(!p.contains("Window"), s"must not fall back to union-and-fill:\n$p")
    // left side: scan -> exchange -> sort; right adds one aggregate
    // exchange before its sort (3 total, never more)
    assert("Exchange".r.findAllIn(p).size == 3,
      s"expected exactly three exchanges:\n$p")
    assert("Sort".r.findAllIn(p).size == 2,
      s"expected exactly one sort per side:\n$p")
  }

  test("q201 LPA argmax keeps rank pushdown (WindowGroupLimit) so only " +
      "the top label per node survives to the exchange") {
    val p = plan("q201_label_prop")
    assert(p.contains("WindowGroupLimit"),
      s"per-node argmax lost its rank pushdown:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"label-vote join went quadratic:\n$p")
  }

  test("AQE FINAL plans keep the pinned shapes: the salted join still " +
      "joins on the salt key behind its explode, and sorted-neighborhood " +
      "keeps the windowless global rank — executed, not just planned") {
    // the other pins read the INITIAL physical plan; at real scale AQE
    // re-plans at runtime, so the shapes must also hold in the final
    // adaptive plan. collect() finalizes this Dataset's own
    // QueryExecution (a writer would execute a separate one).
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "Spark 4 defaults AQE on; this pin must run under it")
    def finalPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val p57 = finalPlan("q57_salted_join")
    assert(p57.contains("isFinalPlan=true"),
      s"q57 did not go adaptive — pin is not testing AQE:\n$p57")
    assert(p57.contains("_salt"),
      s"AQE re-plan lost the salt join key:\n$p57")
    assert(p57.contains("Generate") && p57.contains("explode"),
      s"salt replication (explode(sequence)) missing from final plan:\n$p57")
    assert(!p57.contains("CartesianProduct") &&
      !p57.contains("BroadcastNestedLoopJoin"),
      s"salted join degenerated under AQE:\n$p57")
    val p166 = finalPlan("q166_sorted_neighborhood")
    assert(p166.contains("isFinalPlan=true"),
      s"q166 did not go adaptive — pin is not testing AQE:\n$p166")
    assert(!p166.contains("Window"),
      s"AQE final plan regressed to a window-function global rank:\n$p166")
    assert(!p166.contains("CartesianProduct") &&
      !p166.contains("BroadcastNestedLoopJoin"),
      s"q166 went quadratic under AQE:\n$p166")
  }

  test("q203 item CF: candidate generation and the owned-item suppression " +
      "are equi-joins (anti), never a cartesian") {
    val p = plan("q203_item_recs")
    assert(p.contains("LeftAnti"),
      s"owned-item suppression must plan as an anti-join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate join went quadratic:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"top-k per user lost its rank pushdown:\n$p")
  }

  test("q219 AUC: rank and tie-size share ONE sort exchange — no pair " +
      "join, no second sort") {
    val p = plan("q219_auc")
    assert(!p.contains("Join"), s"AUC must not join pos x neg pairs:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, // one for the window sort, one for the final agg
      s"expected <= 2 exchanges (window + aggregate), got $exchanges:\n$p")
    assert(p.contains("partial_"),
      s"rank-sum aggregate lost its map-side partial phase:\n$p")
  }

  test("q226 chunking is exchange-free: explode + substring is a pure map " +
      "over the scan") {
    val p = plan("q226_chunk_overlap")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate") && p.contains("explode"),
      s"chunk spine (explode(sequence)) missing:\n$p")
  }

  test("q228 JL projection is exchange-free whole-stage codegen — the " +
      "sign-matrix fold never becomes a join or shuffle") {
    val p = plan("q228_rproj")
    assert(!p.contains("Exchange"), s"JL projection must not shuffle:\n$p")
    assert(!p.contains("Join"), s"sign matrix must ride as literals:\n$p")
    // codegen spans print as "*(n)" in executedPlan.toString
    assert(p.contains("*("), s"projection fell out of codegen:\n$p")
  }

  // Round-14 verdict #3: the dialed sf1 geometry (67 bands x 12 bits =
  // 804 planes) tripped janino (InternalCompilerException) in the old
  // per-plane rhBands form and SILENTLY fell back to interpreted eval.
  // rhBands is now one loop-based native expression (plane table in the
  // codegen references); with the fallback DISABLED a codegen failure
  // throws, so this pins the production banding geometries — including
  // the past-cap dial row's — inside whole-stage codegen, and the
  // probe-mask explode (now one array literal, not |masks| inlined
  // XORs) alongside them.
  test("rhBands + multi-probe serve compile in whole-stage codegen at " +
      "dialed and past-cap geometries (codegen fallback disabled)") {
    import org.apache.spark.sql.functions.{col, size, sum}
    import graft.operators.{Dedup, Similarity}
    val prior = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val c = Similarity.prepared(
          graft.sources.Tables.embeddings(spark, dir), "embedding")
        .select(col("vec_id"), col("vec"))
      for ((bits, bands, radius) <- Seq(
          (12, 67, 1),        // dialed sf1 — the measured janino trip
          (25, 172, 2))) {    // past-cap width at a bench-scale band count
        val banded = c.withColumn("bands",
          Similarity.rhBands(col("vec"), bands * bits, bits, 64))
        val p = banded.queryExecution.executedPlan.toString
        assert(p.contains("*("),
          s"rhBands fell out of codegen at $bits bits:\n$p")
        // force actual janino compilation and evaluation
        assert(banded.agg(sum(size(col("bands")))).head().getLong(0) > 0)
        Dedup.multiProbeCandidatesFor(banded.limit(4), banded,
          "vec_id", "bands", bits, radius).count(): Unit
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prior)
  }

  test("q227 CMS exact-confirm broadcasts the candidate set; q220 " +
      "calibration aggregates straight to the bin space") {
    val cms = plan("q227_cms_heavy")
    assert(cms.contains("BroadcastHashJoin"),
      s"CMS candidates must broadcast into the confirm join:\n$cms")
    val cal = plan("q220_calibration")
    assert(!cal.contains("Join") && cal.contains("partial_"),
      s"calibration must be one partial-aggregated bin rollup:\n$cal")
    assert("Exchange hashpartitioning".r.findAllIn(cal).size == 1,
      s"calibration should shuffle once, on <= 10 bin keys:\n$cal")
  }

  test("q254 Krippendorff alpha: keyed aggregates only — no window, no " +
      "cartesian, and the final combine stays partial-aggregated") {
    val p = plan("q254_krippendorff")
    assert(!p.contains("Window"), s"alpha grew a window pass:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"alpha planned a product join:\n$p")
    assert(p.contains("partial_"), s"map-side partials lost:\n$p")
  }

  test("q248 IVF retraction: the takedown set anti-joins as a BROADCAST " +
      "(the serve path's centroid-bucket shuffle is the ONLY sort-merge)") {
    val p = plan("q248_ivf_retract")
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(p).isDefined,
      s"takedown anti-join lost its broadcast:\n$p")
    // exactly one sort-merge join is expected: the documented
    // centroid_id bucket join of the serve path — the retraction itself
    // must not add another index-body shuffle join
    assert("SortMergeJoin \\[".r.findAllIn(p).size <= 1,
      s"retraction added an index-body shuffle join:\n$p")
  }

  test("q258 PQ maintenance: the takedown anti-join rides a BROADCAST; " +
      "the ADC scan is the established broadcast-probe shape") {
    val p = plan("q258_pq_persist")
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(p).isDefined,
      s"PQ retraction lost its broadcast anti-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"PQ serve planned a cartesian:\n$p")
    // the only nested-loop product is the deliberate broadcast of the
    // tiny query-side distance tables against the streamed codes scan
    val bnl = "BroadcastNestedLoopJoin [^\\n]*".r.findAllIn(p).toSeq
    assert(bnl.forall(_.contains("BuildLeft")),
      s"codes scan lost its broadcast build side:\n$bnl")
  }

  test("q263 IVF-PQ from disk: cell lists join probes by equi-join; " +
      "both retractions broadcast; no cartesian anywhere") {
    val p = plan("q263_ivfpq_from_disk")
    assert(!p.contains("CartesianProduct"),
      s"composed serve planned a cartesian:\n$p")
    assert("BroadcastHashJoin.*LeftAnti".r.findAllIn(p).size >= 2,
      s"expected both artifacts' takedown anti-joins as broadcasts:\n$p")
    // nested-loop products appear ONLY as the tiny broadcast centroid
    // crosses of the probe/assign ranking (the established q154 shape)
    val bnl = "BroadcastNestedLoopJoin [^\\n]*".r.findAllIn(p).toSeq
    assert(bnl.forall(_.contains("BuildRight, Cross")),
      s"composed serve planned a non-centroid nested loop:\n$bnl")
  }

  test("q250/q261 guarded confirm: the exact neighborhood stage is a " +
      "cell-confined EQUI-join on the block key — the cartesian is gone") {
    import graft.operators.Similarity
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    // the confirm sits behind a checkpoint inside densityClustersGuarded,
    // so the pin inspects the stage directly (worst case: every corpus
    // point shortlisted — exactly the ε=0.35 regime the round-9 verdict
    // flagged)
    val c = Similarity.prepared(Tables.embeddings(spark, dir), "embedding")
      .select(col("vec_id"), col("vec"), col("nrm"))
    val p = Similarity.cellConfinedNeighbors(c, c, 0.35)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"guarded confirm planned a product join:\n$p")
    assert(p.contains("Generate") && p.contains("explode"),
      s"block replication (explode over cells) missing:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"confirm is not an equi-join on the block key:\n$p")
  }

  test("q252 MAP: the running-hit-count window rides the hit ranks; the " +
      "only nested-loop products are 1-row stats broadcasts") {
    val p = plan("q252_map")
    assert(!p.contains("CartesianProduct"), s"MAP planned a cartesian:\n$p")
    // BroadcastNestedLoopJoin appears ONLY as the BuildRight Cross of the
    // 1-row corpus-stats frame (the established bm25 pattern)
    val bnl = "BroadcastNestedLoopJoin [^\\n]*".r.findAllIn(p).toSeq
    assert(bnl.forall(_.contains("BuildRight, Cross")),
      s"MAP planned a non-stats nested loop:\n$bnl")
    assert(p.contains("Window"), s"running-hit-count window missing:\n$p")
  }

  test("q276 DSIR: the 128-row ratio table joins instances as a " +
      "BROADCAST; the selection is TakeOrdered, never a global sort") {
    val p = plan("q276_dsir_importance")
    assert(!p.contains("CartesianProduct"),
      s"DSIR planned a cartesian:\n$p")
    assert("BroadcastHashJoin".r.findFirstIn(p).isDefined,
      s"ratio/lookup joins lost their broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 selection must be a bounded TakeOrdered, not a sort:\n$p")
    // the only nested-loop product is the 1-row totals frame
    val bnl = "BroadcastNestedLoopJoin [^\\n]*".r.findAllIn(p).toSeq
    assert(bnl.size <= 1, s"unexpected nested loops:\n$bnl")
  }

  test("q273/q274/q275: the new eval metrics stay keyed aggregates — " +
      "no cartesian, no corpus-wide window") {
    for (q <- Seq("q274_brier_decomp", "q275_mcnemar")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(!p.contains("Window"), s"$q planned a window pass:\n$p")
    }
    // q273's cell self-join must be an equi-join on the group key (the
    // inequality rides as a post-join condition), never a product
    val p = plan("q273_rank_concordance")
    assert(!p.contains("CartesianProduct"),
      s"concordance planned a cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"cell pairs must equi-join on grp:\n$p")
  }

  test("q280 gram share: everything rides the gram-hash key — no " +
      "product join, no doc x doc anywhere") {
    val p = plan("q280_dup_gram_share")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"gram share planned a product join:\n$p")
  }

  test("q283 epoch schedule: the remainder budget joins docs as a " +
      "BROADCAST; one keyed window for the prefix rule") {
    val p = plan("q283_epoch_schedule")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert("BroadcastHashJoin".r.findFirstIn(p).isDefined,
      s"per-source budget frame lost its broadcast:\n$p")
    assert(p.contains("Window"), s"prefix-rule window missing:\n$p")
  }

  test("q296/q297 sketch-audit queries: band/cluster equi-joins only — " +
      "no product join anywhere") {
    for (q <- Seq("q296_simhash_calibration", "q297_cluster_transitivity")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q planned a nested-loop product:\n$p")
    }
  }
}
