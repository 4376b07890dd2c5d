package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over labeled/scored rows, in exact integer
  * arithmetic — the "is this classifier/labeler any good" leg of a
  * training-data pipeline (complementing the data-quality leg in
  * [[Quality]] and the selection leg in [[Curation]]).
  *
  * Everything here returns BIGINT parts-per-million so results are
  * bit-identical across partition counts and engines: a float AUC differs
  * between a 32-partition and a 1000-partition run whenever the rank sum
  * is accumulated as a double; an integer rank sum cannot. (Reference
  * analogue: the reference has no evaluation surface at all — its closest
  * notion of "quality" is the boolean validation filter,
  * `ingestService.js:16-24`; these operators are north-star additions.)
  */
object Eval {

  /** `num·10⁶ div den` over BIGINT columns without ever forming
    * `num·10⁶`: Horner's rule on the (quotient, remainder) pair — six
    * rounds of `q ← 10q + (10r div den); r ← 10r mod den`. Exact (each
    * round preserves `q·den + r = num·10^i`), and the largest
    * intermediate is `10·r < 10·den`, so headroom is den ≤ 2⁶²/5
    * (~9.2·10¹⁷) instead of 2⁶³/10⁶. The quotient itself is ≤ 10⁶
    * whenever num ≤ den (every ppm ratio here). Row-local BIGINT
    * arithmetic only — stays inside whole-stage codegen. A zero/NULL
    * `den` propagates NULL through `div` (non-ANSI), matching the
    * callers' `when` guards.
    */
  private[graft] def stagedPpmDiv(num: Column, den: Column): Column = {
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val init = struct(idiv(num, den).as("q"), (num % den).as("r"))
    val stepped = (1 to 6).foldLeft(init) { (acc, _) =>
      struct(
        (acc("q") * lit(10L) + idiv(acc("r") * lit(10L), den)).as("q"),
        ((acc("r") * lit(10L)) % den).as("r"))
    }
    stepped("q")
  }

  /** Per-group ROC-AUC via the Mann–Whitney rank-sum identity, exact to
    * 1e-6: `AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)` where `R⁺` is the sum of
    * the AVERAGE ranks of the positives under ascending score order (ties
    * share their group's average rank — the standard mid-rank convention,
    * equal to counting tied pos/neg pairs as half-concordant).
    *
    * Halves never materialize: with min-rank `r = rank()` and tie-group
    * size `c`, twice the average rank is the integer `2r + c − 1`, so the
    * result is `(2R⁺ − n⁺(n⁺+1)) · 10⁶ div (2 n⁺ n⁻)` — BIGINT `+ * div`
    * only. Groups with no positives or no negatives yield NULL (AUC is
    * undefined there), not a silent 0.
    *
    * Scale shape: one keyed window pass (rank + tie size share the single
    * (group, score) sort exchange) and one aggregate — no self-join over
    * pos×neg pairs, which is the naive O(n²) formulation. Overflow
    * headroom: the rank-sum accumulation `2R⁺ ≤ 2n²` stays below 2⁶³ for
    * per-group n up to ~2·10⁹, and the ppm scaling never multiplies the
    * raw numerator by 10⁶ in one step (that would cap n⁺·n⁻ at ~4.6·10¹²,
    * i.e. ~4M balanced rows) — [[stagedPpmDiv]] applies ×10⁶ as six
    * Horner ×10 steps on a (quotient, remainder) pair, so the largest
    * intermediate is `10·(2 n⁺ n⁻)`, good to n⁺·n⁻ ≤ ~4.6·10¹⁷ (~1.3·10⁹
    * balanced rows per group — the same order as the accumulation bound).
    *
    * @param df     input rows
    * @param group  grouping column (model variant / slice)
    * @param label  boolean-ish column, true = positive
    * @param score  integral score column (higher = predicted positive)
    */
  def rocAucPpm(df: DataFrame, group: Column, label: Column,
      score: Column): DataFrame = {
    val g = df.select(group.as("grp"), label.cast("boolean").as("y"),
      score.cast("long").as("s"))
    val wRank = Window.partitionBy(col("grp")).orderBy(col("s"))
    val wTie = Window.partitionBy(col("grp"), col("s"))
    g.withColumn("r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("y"), col("r2")).otherwise(lit(0L))).as("r2pos"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        when(col("n_pos") > 0 && col("n") > col("n_pos"),
          stagedPpmDiv(expr("r2pos - n_pos * (n_pos + 1)"),
            expr("2 * n_pos * (n - n_pos)")))
          .as("auc_ppm"))
  }

  /** [[rocAucPpm]] over WEIGHTED rows — each integral weight unit is a
    * pseudo-row occupying one rank slot, and the mid-rank convention
    * gives every unit in a tied score group the group-average rank:
    * with cumulative weight `cumB` strictly below the group and group
    * weights (W, W⁺), twice the positive rank sum gains
    * `W⁺·(2·cumB + W + 1)` per group — the same integer the row form's
    * `2r + c − 1` telescopes to at w ≡ 1 (spec-asserted), and invariant
    * under uniform weight scaling (AUC is a probability). This is what
    * lets the Poisson bootstrap resample an AUC without materializing
    * resampled rows: weights fold into the per-score aggregate.
    *
    * Scale shape: per-(group, score) aggregate (smaller than the row
    * set), one keyed cumulative window, one final aggregate reusing the
    * window partitioning.
    */
  def rocAucWeightedPpm(df: DataFrame, group: Column, label: Column,
      score: Column, weight: Column): DataFrame = {
    val g = df.select(group.as("grp"), label.cast("boolean").as("y"),
      score.cast("long").as("s"), weight.cast("long").as("w"))
      .filter(col("w") > 0)
    val per = g.groupBy(col("grp"), col("s"))
      .agg(sum(col("w")).as("c"),
        sum(when(col("y"), col("w")).otherwise(0L)).as("p"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cumb", sum(col("c")).over(wCum) - col("c"))
      .groupBy(col("grp"))
      .agg(sum(col("p") * (lit(2L) * col("cumb") + col("c") + lit(1L)))
          .as("r2pos"),
        sum(col("p")).as("n_pos"),
        sum(col("c")).as("n"))
      .select(col("grp"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        when(col("n_pos") > 0 && col("n") > col("n_pos"),
          stagedPpmDiv(expr("r2pos - n_pos * (n_pos + 1)"),
            expr("2 * n_pos * (n - n_pos)")))
          .as("auc_ppm"))
  }

  /** Bootstrap confidence band for the AUC itself: `replicas` Poisson
    * resamples, each scored by [[rocAucWeightedPpm]] with the resample
    * multiplicities as weights — the headline eval metric gets an
    * uncertainty estimate from ONE pass over the data, exact per
    * replica, no resampled rows ever materialized. The replica spread
    * is the sampling distribution of the AUC; the band-contains-the-
    * point-estimate invariant is asserted in `EvalSpec`.
    */
  def rocAucBootstrapPpm(df: DataFrame, id: Column, label: Column,
      score: Column, replicas: Int): DataFrame = {
    val base = df.select(id.as("_id"), label.cast("boolean").as("_y"),
      score.cast("long").as("_s"))
    rocAucWeightedPpm(poissonReplicas(base, replicas), col("b"),
        col("_y"), col("_s"), col("w"))
      .select(col("grp").as("b"), col("n_pos"), col("n_neg"),
        col("auc_ppm"))
  }

  /** Per-group precision-recall curve, exact in ppm: one point per
    * DISTINCT score value `t` — the operating point "predict positive
    * when score ≥ t" — with its true-positive count, predicted-positive
    * count, and floored-ppm precision/recall. The descending cumulative
    * window gives every operating point from one keyed sort (the same
    * single-pass economics as [[rocAucPpm]]; a thresholds×rows join is
    * the naive form this replaces). Average precision / PR-AUC is one
    * more aggregate over the output; groups with no positives emit
    * NULL recall rather than a fake curve.
    */
  def prCurvePpm(df: DataFrame, group: Column, label: Column,
      score: Column): DataFrame = {
    val g = df.select(group.as("grp"), label.cast("boolean").as("y"),
      score.cast("long").as("s"))
    val per = g.groupBy(col("grp"), col("s"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("y"), 1L).otherwise(0L)).as("p"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    per
      .withColumn("tp", sum(col("p")).over(wCum))
      .withColumn("n_pred", sum(col("c")).over(wCum))
      .withColumn("pos_total", sum(col("p")).over(wAll))
      .select(col("grp"), col("s").as("threshold"), col("tp"),
        col("n_pred"),
        expr("tp * 1000000 div n_pred").as("precision_ppm"),
        when(col("pos_total") > 0,
          expr("tp * 1000000 div pos_total")).as("recall_ppm"))
  }

  /** Reliability-diagram bins for a probabilistic classifier, exact in
    * ppm: rows carry a predicted probability in ppm (`[0, 10⁶]`) and a
    * boolean outcome; each of `bins` equal-width bins reports its count,
    * mean confidence `conf_ppm = Σp div n`, empirical accuracy
    * `acc_ppm = n⁺·10⁶ div n`, and `gap_ppm = |acc − conf|`. The expected
    * calibration error is then `Σ_b n_b·gap_b div N` — computable from
    * this output by one more aggregate (asserted in `EvalSpec`), kept out
    * of the row shape so the bins stay a per-bin table.
    *
    * Scale shape: one map-side bin assignment + one aggregate on ≤ `bins`
    * keys — no window, no join. `p = 10⁶` lands in the top bin (closed
    * upper edge), mirroring the usual [0,1] reliability diagram.
    */
  def calibrationBins(df: DataFrame, probPpm: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    df.select(probPpm.cast("long").as("p"), label.cast("boolean").as("y"))
      .withColumn("bin", least(lit(bins - 1L),
        expr(s"p * $bins div 1000000")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("p")).as("p_sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("p_sum div n").as("conf_ppm"),
        expr("n_pos * 1000000 div n").as("acc_ppm"),
        abs(expr("n_pos * 1000000 div n") - expr("p_sum div n"))
          .as("gap_ppm"))
  }

  /** Cumulative-probability thresholds of Poisson(1) in ppm —
    * ⌊10⁶·P(X ≤ k)⌋ for k = 0..3 (mass above 3 is capped into w = 4;
    * P(X > 4) ≈ 0.0037 at λ=1, a documented truncation like the Benford
    * constants). Literals so both engines draw the identical weight from
    * the identical md5 uniform.
    */
  val PoissonPpm: Seq[Long] = Seq(367879L, 735758L, 919698L, 981011L)

  /** Adds Poisson(1) bootstrap columns (`b` replica id, `w` weight) to a
    * frame carrying `_id`: one digest per BLOCK of 4 replicas,
    * materialized between the two explodes so each md5 is computed once
    * and its value rides through the window Generate — not re-derived
    * per replica row.
    */
  private def poissonReplicas(df: DataFrame, replicas: Int): DataFrame = {
    require(replicas >= 4 && replicas <= 1024 && replicas % 4 == 0,
      s"need replicas in [4, 1024] divisible by 4, got $replicas")
    val u = conv(expr("substring(_hex, cast(win as int) * 8 + 1, 8)"),
      16, 10).cast("long") % 1000000L
    val wExpr = when(u < PoissonPpm(0), 0L).when(u < PoissonPpm(1), 1L)
      .when(u < PoissonPpm(2), 2L).when(u < PoissonPpm(3), 3L)
      .otherwise(4L)
    df.withColumn("blk", explode(sequence(lit(0L), lit(replicas / 4 - 1L))))
      .withColumn("_hex", md5(concat(col("_id").cast("string"), lit("|"),
        col("blk").cast("string"))))
      .withColumn("win", explode(sequence(lit(0L), lit(3L))))
      .withColumn("b", col("blk") * 4L + col("win"))
      .withColumn("w", wExpr)
  }

  /** Deterministic Poisson bootstrap (Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google TR 2012) for a
    * per-group mean: each row gets, per replica `b`, a weight drawn as
    * Poisson(1) from the md5("id|b") uniform — the resampling that needs
    * NO data movement, because every replica is a weighted aggregate of
    * the same pass. Output: one row per (group, replica) with `n_eff`
    * (Σw), `sum_v` (Σ w·v) and the exact integer `mean_v = sum_v div
    * n_eff` — the replica spread IS the sampling distribution of the
    * mean; a percentile CI is one more aggregate over it (asserted in
    * `EvalSpec`).
    *
    * Everything is BIGINT and md5 — deterministic across engines,
    * partitionings, and reruns (a seeded `rand()` bootstrap is none of
    * those). Hash economy: one md5 digest carries FOUR independent
    * 32-bit words, so replica `b` draws its uniform from hex window
    * `b mod 4` of `md5(id|⌊b/4⌋)` — replicas/4 digests per row instead
    * of one per replica (measured 4.1 s → the md5 was the whole cost at
    * 32 replicas × 150k rows). Scale shape: a `replicas`-way row-local
    * explode feeding one partial-aggregated (group, b) rollup — the
    * shuffle carries groups×replicas rows, never the data; 100 TB of
    * rows bootstrap in one scan. Replicas with n_eff = 0 (possible only
    * for tiny groups) yield NULL means.
    */
  def poissonBootstrapMeans(df: DataFrame, group: Column, id: Column,
      value: Column, replicas: Int): DataFrame = {
    poissonReplicas(
      df.select(group.as("grp"), id.as("_id"), value.cast("long").as("v")),
      replicas)
      .groupBy(col("grp"), col("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("v")).as("sum_v"))
      .select(col("grp"), col("b"), col("n_eff"), col("sum_v"),
        when(col("n_eff") > 0, expr("sum_v div n_eff")).as("mean_v"))
  }

  /** Exact decision-stump training per group: the threshold on an
    * integral feature minimizing weighted Gini impurity of the binary
    * label, found WITHOUT a float ever forming. With left counts
    * (n_L, pos_L) from one cumulative window over the per-value
    * aggregate, minimizing `n_L·g_L + n_R·g_R` is equivalent to
    * maximizing `(ssq_L·n_R + ssq_R·n_L) / (n_L·n_R)` where
    * `ssq = pos² + neg²` — a RATIONAL, ranked by its floored ppm (both
    * engines floor identically, deterministic argmax with threshold
    * tie-break asc). The winning row per group is the trained stump:
    * split at `f ≤ threshold`.
    *
    * Scale shape: one per-(group, value) aggregate (the only data-sized
    * shuffle — candidate thresholds are the DISTINCT values, the exact
    * sweep a histogram-split approximation would approximate), one keyed
    * window pass, rank-1 selection with WindowGroupLimit pushdown.
    * Overflow: the ppm scaling needs `2n³·10⁶ < 2⁶³` ⇒ per-group
    * n ≲ 16 000; larger groups drop the scale or pre-bin the feature
    * (documented trade).
    */
  def giniStump(df: DataFrame, group: Column, label: Column,
      feature: Column): DataFrame =
    giniStumpWeighted(df, group, label, feature, lit(1L))

  /** [[giniStump]] over WEIGHTED rows (integral weights — e.g. the
    * Poisson bootstrap's resample multiplicities): `c`/`p` become Σw and
    * Σw·[y], everything downstream is unchanged because the sweep only
    * ever consumed counts. Zero-weight rows are dropped up front (they
    * are "not in the resample", and would otherwise emit duplicate
    * thresholds that only tie-breaks disambiguate).
    */
  def giniStumpWeighted(df: DataFrame, group: Column, label: Column,
      feature: Column, weight: Column): DataFrame = {
    val g = df.select(group.as("grp"), label.cast("boolean").as("y"),
      feature.cast("long").as("f"), weight.cast("long").as("w"))
      .filter(col("w") > 0)
    val per = g.groupBy(col("grp"), col("f"))
      .agg(sum(col("w")).as("c"),
        sum(when(col("y"), col("w")).otherwise(0L)).as("p"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("grp"))
    val scored = per
      .withColumn("n_left", sum(col("c")).over(wCum))
      .withColumn("pos_left", sum(col("p")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("pt", sum(col("p")).over(wAll))
      .filter(col("n_left") < col("n")) // right side must be nonempty
      .withColumn("n_right", col("n") - col("n_left"))
      .withColumn("pos_right", col("pt") - col("pos_left"))
      .withColumn("score_ppm", expr(
        """((pos_left * pos_left
            + (n_left - pos_left) * (n_left - pos_left)) * n_right
           + (pos_right * pos_right
              + (n_right - pos_right) * (n_right - pos_right)) * n_left)
           * 1000000 div (n_left * n_right)"""))
    val wBest = Window.partitionBy(col("grp"))
      .orderBy(col("score_ppm").desc, col("f").asc)
    scored.withColumn("_rk", row_number().over(wBest))
      .filter(col("_rk") === 1)
      .select(col("grp"), col("f").as("threshold"), col("n_left"),
        col("n_right"), col("pos_left"), col("pos_right"),
        col("score_ppm"))
  }

  /** Bootstrap-aggregated stumps — [[poissonReplicas]] composed with
    * [[giniStumpWeighted]]: each of `replicas` Poisson(1) resamples
    * trains its OWN exact stump (the integral weights fold straight into
    * the sweep's counts, so every replica stays float-free), and the
    * spread of the B thresholds is the stability diagnostic a single
    * stump can't give — a threshold that jumps across resamples is noise,
    * not signal. Still one pass over the data: the replica explode is
    * row-local and the sweep aggregates per (replica, value).
    */
  def baggedGiniStumps(df: DataFrame, id: Column, label: Column,
      feature: Column, replicas: Int): DataFrame = {
    val base = df.select(id.as("_id"), label.cast("boolean").as("_y"),
      feature.cast("long").as("_f"))
    giniStumpWeighted(poissonReplicas(base, replicas), col("b"),
        col("_y"), col("_f"), col("w"))
      .select(col("grp").as("b"), col("threshold"), col("n_left"),
        col("n_right"), col("pos_left"), col("pos_right"),
        col("score_ppm"))
  }

  /** Split-conformal prediction intervals with measured test coverage
    * (Vovk et al.; Lei et al., JASA 2018) — distribution-free
    * uncertainty for a point predictor, in exact integer arithmetic end
    * to end. The md5 id bucket partitions rows into train/calibration/
    * test (the [[Curation.hashBucket]] convention: deterministic,
    * growth-stable); the "model" is the floored per-group train mean
    * (`sum div n` — any deterministic integer predictor slots in); the
    * conformal radius is the `⌈(n_cal+1)(1−α)⌉`-th smallest calibration
    * |residual| (type-1 quantile — an ORDER STATISTIC, so no float
    * quantile estimator), and the output row per group reports that
    * radius plus the measured test-set coverage in ppm. The split
    * guarantee says expected coverage ≥ 1−α; the measured number makes
    * the guarantee auditable per group.
    *
    * Scale shape: one keyed aggregate for the means, one keyed window
    * sort over the CALIBRATION slice only (the small split) for the
    * order statistic, and a broadcast of the O(groups) radius table into
    * a row-local test filter — the full data crosses one exchange.
    *
    * @param alphaPpm miscoverage level in ppm (100000 = 90% intervals)
    */
  def conformalCoverage(df: DataFrame, group: Column, id: Column,
      value: Column, alphaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      s"alphaPpm must be in (0, 1e6), got $alphaPpm")
    val g = df.select(group.as("grp"), Curation.hashBucket(id, 100)
      .as("bkt"), value.cast("long").as("v"))
    val train = g.filter(col("bkt") < 60)
    val cal = g.filter(col("bkt") >= 60 && col("bkt") < 80)
    val test = g.filter(col("bkt") >= 80)
    val model = train.groupBy(col("grp"))
      .agg(expr("sum(v) div count(1)").as("pred"))
    val calRes = cal.join(broadcast(model), Seq("grp"))
      .select(col("grp"), abs(col("v") - col("pred")).as("r"))
    val wR = Window.partitionBy(col("grp")).orderBy(col("r"))
    // ceil((n+1)(1-alpha)) as integers: (n+1)(1e6-alpha) ceil-div 1e6
    val radius = calRes
      .withColumn("rnk", row_number().over(wR))
      .withColumn("n_cal", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .filter(col("rnk") ===
        least(col("n_cal"), expr(
          s"((n_cal + 1) * ${1000000L - alphaPpm} + 999999) div 1000000")))
      .select(col("grp"), col("n_cal"), col("r").as("q_hat"))
    test.join(broadcast(model), Seq("grp"))
      .join(broadcast(radius), Seq("grp"))
      .groupBy(col("grp"), col("pred"), col("n_cal"), col("q_hat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("v") - col("pred")) <= col("q_hat"), 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("grp"), col("pred"), col("n_cal"), col("q_hat"),
        col("n_test"), col("n_covered"),
        expr("n_covered * 1000000 div n_test").as("coverage_ppm"))
  }

  /** Per-group 2×2 chi-square statistic — the A/B-experiment readout:
    * with contingency cells a,b,c,d (treatment×outcome), `χ² = N(ad −
    * bc)² / ((a+b)(c+d)(a+c)(b+d))`. Cells and the determinant are
    * exact BIGINTs (|ad − bc| ≤ N²/4 stays double-exact below ~10⁸ rows
    * per group); the final ratio is one fixed-shape IEEE expression —
    * identical operation order in both engines, rounded to 6 — because
    * the four-margin product overflows 2⁶³ long before the counts do.
    * Degenerate groups (an empty margin) yield NULL, not a division
    * error. One keyed aggregate; no window, no join.
    */
  def chiSquare2x2(df: DataFrame, group: Column, treatment: Column,
      outcome: Column): DataFrame = {
    val g = df.select(group.as("grp"), treatment.cast("boolean").as("t"),
      outcome.cast("boolean").as("y"))
    g.groupBy(col("grp"))
      .agg(
        sum(when(col("t") && col("y"), 1L).otherwise(0L)).as("a"),
        sum(when(col("t") && !col("y"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("t") && col("y"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("t") && !col("y"), 1L).otherwise(0L)).as("d"))
      .select(col("grp"), col("a"), col("b"), col("c"), col("d"),
        when(col("a") + col("b") > 0 && col("c") + col("d") > 0 &&
            col("a") + col("c") > 0 && col("b") + col("d") > 0,
          expr("""round(
            (cast(a + b + c + d as double) *
             (cast(a * d - b * c as double) * cast(a * d - b * c as double)))
            / (((cast(a + b as double) * cast(c + d as double))
                * cast(a + c as double)) * cast(b + d as double)), 6)"""))
          .as("chi2"))
  }

  /** Per-group rank agreement between two numeric orderings by
    * Spearman's footrule (Diaconis & Graham, JRSS-B 1977): with mid-rank
    * ties, `D = Σ|rank_u(i) − rank_v(i)|`, normalized against the
    * anti-ordering maximum `⌊n²/2⌋` and flipped so 10⁶ = identical
    * order, 0 = reversed. The footrule is within a factor of 2 of
    * Kendall's tau (DG inequality) and needs NO square root — unlike
    * Spearman's ρ it stays in exact integer arithmetic end to end.
    *
    * Halves never materialize (the [[rocAucPpm]] trick): with min-rank
    * `r` and tie-group size `c`, twice the mid-rank is `2r + c − 1`, so
    * `D2 = Σ|r2_u − r2_v| = 2D` is an integer and the score is
    * `10⁶ − D2·10⁶ div (n² − (n mod 2))`. Groups of size 1 yield NULL
    * (agreement is undefined), not a vacuous 10⁶.
    *
    * Scale shape: two keyed window passes (one sort exchange per
    * ordering — they share the group partitioning) and one aggregate.
    */
  def footruleAgreementPpm(df: DataFrame, group: Column, u: Column,
      v: Column): DataFrame = {
    val g = df.select(group.as("grp"), u.cast("long").as("u"),
      v.cast("long").as("v"))
    def rank2(c: Column): Column = {
      val wRank = Window.partitionBy(col("grp")).orderBy(c)
      val wTie = Window.partitionBy(col("grp"), c)
      lit(2L) * rank().over(wRank) + count(lit(1)).over(wTie) - lit(1L)
    }
    g.withColumn("r2u", rank2(col("u")))
      .withColumn("r2v", rank2(col("v")))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("r2u") - col("r2v"))).as("d2"))
      .select(col("grp"), col("n"), col("d2"),
        when(col("n") > 1,
          lit(1000000L) - expr("d2 * 1000000 div (n * n - n % 2)"))
          .as("agreement_ppm"))
  }

  /** Per-group Cohen's kappa between two categorical raters, exact to
    * 1e-6: with `N` rows, `A` agreements, and `pe·N² = Σ_k nA_k·nB_k`
    * (the chance-agreement numerator from the rater marginals),
    * `κ = (po − pe)/(1 − pe) = (A·N − Σ nA·nB)/(N² − Σ nA·nB)`, emitted
    * as `kappa_ppm = num·10⁶ div den` — BIGINT only, and both engines
    * truncate integral division toward zero, so the mirror is exact even
    * for negative κ (worse-than-chance raters). Degenerate groups where
    * both raters are constant and identical (den = 0) yield NULL; groups
    * whose raters share no label at all (no marginal overlap, pe = 0,
    * agree = 0) yield κ = 0 — kept via a left join, not dropped.
    *
    * Scale shape: one aggregate for (N, A), one per-rater marginal
    * aggregate each, and a join of the two marginals on (group, label) —
    * all keyed by group, no window. Overflow: N² < 2⁶³ holds to per-group
    * N ≈ 3·10⁹.
    */
  def cohenKappaPpm(df: DataFrame, group: Column, raterA: Column,
      raterB: Column): DataFrame = {
    val g = df.select(group.as("grp"), raterA.cast("string").as("a"),
      raterB.cast("string").as("b"))
    val totals = g.groupBy(col("grp")).agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val margA = g.groupBy(col("grp"), col("a").as("lbl"))
      .agg(count(lit(1)).as("na"))
    val margB = g.groupBy(col("grp"), col("b").as("lbl"))
      .agg(count(lit(1)).as("nb"))
    // inner join: a label one rater never uses contributes nA·nB = 0.
    // A group where the raters share NO label at all then has no pe row —
    // the left join + coalesce keeps it with pe_num = 0 rather than
    // silently dropping the group; there agree = 0 too (disjoint labels
    // can never agree), so κ = (0·n − 0)·10⁶ div (n² − 0) = 0, the
    // correct "agreement exactly at chance level" answer.
    val pe = margA.join(margB, Seq("grp", "lbl"))
      .groupBy(col("grp"))
      .agg(sum(col("na") * col("nb")).as("pe_num"))
    totals.join(pe, Seq("grp"), "left")
      .withColumn("pe_num", coalesce(col("pe_num"), lit(0L)))
      .select(col("grp"), col("n"), col("agree"),
        when(col("n") * col("n") =!= col("pe_num"),
          expr("(agree * n - pe_num) * 1000000 div (n * n - pe_num)"))
          .as("kappa_ppm"))
  }

  /** Per-group pair-concordance family between two QUANTIZED orderings —
    * Kendall-style rank correlation in exact integers. With concordant
    * pairs `C`, discordant `D`, and per-ordering tie pairs, emits
    * `tau_a = (C−D)/(n(n−1)/2)` (tie-blind), Goodman–Kruskal
    * `gamma = (C−D)/(C+D)` (tie-excluding), and Somers'
    * `D_vu = (C−D)/(pairs untied in u)` (the asymmetric form with `v` as
    * the response) — the three tie conventions that stay RATIONAL.
    * Kendall's tau-b does not (its denominator is a square root), which
    * is why the family ships without it; gamma and Somers' D bracket it.
    *
    * Exactness: all pair counts come from the CONTINGENCY CELLS
    * `(u-value, v-value, count)`, not row pairs — `C` and `D` are sums of
    * `n₁·n₂` over cell pairs with `u₁ < u₂`, counted once per unordered
    * row pair. The ppm divisions go through [[stagedPpmDiv]] (numerators
    * reach n², so direct ×10⁶ would cap n at ~3·10⁶; staged form is good
    * to n ≈ 2·10⁹ per group).
    *
    * Scale shape: the cell self-join is O(V_u·V_v)² per group where V is
    * the DISTINCT-VALUE count — the operator's contract is quantized or
    * categorical scores (quantile buckets, star ratings, relevance
    * grades), where V is a small constant and the join is a few thousand
    * cell pairs regardless of row count. Row count only enters through
    * the two keyed aggregates (cells + group sizes). Feeding it raw
    * continuous scores degrades to the O(n²) pair join the quantized
    * contract exists to avoid — quantize first ([[footruleAgreementPpm]]
    * is the window-only alternative when you can't).
    *
    * Groups where one ordering is constant (no untied-u pairs) yield
    * NULL gamma/somers (undefined); n ≤ 1 yields NULL tau_a.
    */
  def rankConcordancePpm(df: DataFrame, group: Column, u: Column,
      v: Column): DataFrame = {
    val g = df.select(group.as("grp"), u.cast("long").as("a"),
      v.cast("long").as("b"))
    val cells = g.groupBy(col("grp"), col("a"), col("b"))
      .agg(count(lit(1)).as("cn"))
    val totals = g.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val tieA = g.groupBy(col("grp"), col("a")).agg(count(lit(1)).as("na"))
      .groupBy(col("grp")).agg(sum(col("na") * (col("na") - 1)).as("ta2"))
    val lhs = cells.select(col("grp"), col("a").as("a1"),
      col("b").as("b1"), col("cn").as("n1"))
    val rhs = cells.select(col("grp").as("grp_r"), col("a").as("a2"),
      col("b").as("b2"), col("cn").as("n2"))
    val cd = lhs.join(rhs,
        col("grp") === col("grp_r") && col("a1") < col("a2"))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("b1") < col("b2"), col("n1") * col("n2"))
          .otherwise(0L)).as("c_pairs"),
        sum(when(col("b1") > col("b2"), col("n1") * col("n2"))
          .otherwise(0L)).as("d_pairs"))
    totals.join(tieA, Seq("grp"))
      .join(cd, Seq("grp"), "left")
      .withColumn("c_pairs", coalesce(col("c_pairs"), lit(0L)))
      .withColumn("d_pairs", coalesce(col("d_pairs"), lit(0L)))
      .select(col("grp"), col("n"), col("c_pairs"), col("d_pairs"),
        when(col("n") > 1,
          stagedPpmDiv(lit(2L) * (col("c_pairs") - col("d_pairs")),
            col("n") * (col("n") - 1))).as("tau_a_ppm"),
        when(col("c_pairs") + col("d_pairs") > 0,
          stagedPpmDiv(col("c_pairs") - col("d_pairs"),
            col("c_pairs") + col("d_pairs"))).as("gamma_ppm"),
        when(col("n") * (col("n") - 1) > col("ta2"),
          stagedPpmDiv(lit(2L) * (col("c_pairs") - col("d_pairs")),
            col("n") * (col("n") - 1) - col("ta2"))).as("somers_d_ppm"))
  }

  /** Per-group BRIER SCORE with the Murphy (1973) decomposition
    * `brier = reliability − resolution + uncertainty`, binned like
    * [[calibrationBins]] and exact-integer end to end. Probabilities are
    * ppm (`p ∈ [0, 10⁶]`); the squared error `(p − y·10⁶)²` is reduced to
    * ppm scale per ROW (`div 10⁶` before summation), so each term is
    * ≤ 10⁶ and the per-group accumulator holds to ~9·10¹² rows — the
    * row-level truncation biases the sum by < 1 ppm total (each term
    * loses < 1 unit, the mean re-divides by n). Reliability/resolution
    * use the same trick on the per-bin mean gaps.
    *
    * The decomposition identity is exact only when forecasts are
    * CONSTANT within each bin; otherwise the binned form carries a
    * residual (the within-bin forecast variance minus twice the
    * within-bin forecast/outcome covariance — Stephenson et al. 2008's
    * generalized decomposition), bounded by the squared bin width
    * (≤ 2500 ppm at 10 bins). That residual — plus the few-ppm integer
    * truncation — ships as `decomp_gap_ppm` rather than being silently
    * absorbed: near-zero means within-bin-constant forecasts, ~10³ ppm
    * is the expected binning residual, anything larger is a bug.
    *
    * Scale shape: one map-side bin assign + row-local squared error, a
    * (group, bin) aggregate (≤ `bins` rows per group), a group aggregate,
    * and a broadcast-sized join of the two — no window, no shuffle wider
    * than the group key.
    */
  def brierDecompPpm(df: DataFrame, group: Column, probPpm: Column,
      label: Column, bins: Int = 10): DataFrame = {
    require(bins > 1, s"bins must be > 1, got $bins")
    val g = df.select(group.as("grp"), probPpm.cast("long").as("p"),
        label.cast("boolean").as("y"))
      .withColumn("yv", when(col("y"), 1000000L).otherwise(0L))
      .withColumn("bin", expr(s"least(${bins - 1}, p * $bins div 1000000)"))
      .withColumn("sq", expr("((p - yv) * (p - yv)) div 1000000"))
    val binAgg = g.groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n_k"), sum(col("p")).as("sp"),
        sum(when(col("y"), 1L).otherwise(0L)).as("sy"),
        sum(col("sq")).as("sbr"))
    val grpAgg = binAgg.groupBy(col("grp"))
      .agg(sum(col("n_k")).as("n"), sum(col("sy")).as("pos"),
        sum(col("sbr")).as("brier_num"))
    val terms = binAgg.join(grpAgg, Seq("grp"))
      .withColumn("conf_ppm", expr("sp div n_k"))
      .withColumn("ybin_ppm", expr("sy * 1000000 div n_k"))
      .withColumn("ybar_ppm", expr("pos * 1000000 div n"))
      .withColumn("rel_t", expr(
        "n_k * (((ybin_ppm - conf_ppm) * (ybin_ppm - conf_ppm)) div 1000000)"))
      .withColumn("res_t", expr(
        "n_k * (((ybin_ppm - ybar_ppm) * (ybin_ppm - ybar_ppm)) div 1000000)"))
    terms.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), max(col("pos")).as("pos"),
        count(lit(1)).as("n_bins_used"),
        expr("max(brier_num) div max(n)").as("brier_ppm"),
        expr("sum(rel_t) div max(n)").as("reliability_ppm"),
        expr("sum(res_t) div max(n)").as("resolution_ppm"))
      .withColumn("uncertainty_ppm",
        stagedPpmDiv(col("pos") * (col("n") - col("pos")),
          col("n") * col("n")))
      .withColumn("decomp_gap_ppm",
        col("brier_ppm") - (col("reliability_ppm") - col("resolution_ppm")
          + col("uncertainty_ppm")))
  }

  /** Per-group McNEMAR TEST for paired classifiers — the right
    * significance test when two models are scored on the SAME rows (the
    * marginal-accuracy chi-square ignores the pairing and overstates
    * variance). Counts the discordant cells `b` (A right, B wrong) and
    * `c` (A wrong, B right); the statistic `(b−c)²/(b+c)` is χ²₁ under
    * H₀: equal error rates. Exact rational → ppm via [[stagedPpmDiv]]
    * ((b−c)² ≤ n² keeps headroom at n ≈ 2·10⁹ per group). The classical
    * continuity correction `(|b−c|−1)²` is deliberately NOT applied — it
    * is a normal-approximation patch, and the uncorrected form is the one
    * with the exact-integer identity; callers wanting the corrected value
    * have `b` and `c` in the output. `b + c = 0` (never-discordant pair)
    * yields NULL, not a vacuous 0.
    *
    * Scale shape: one keyed aggregate — row-local correctness bits, four
    * conditional counts, no join, no window.
    */
  def mcnemarPpm(df: DataFrame, group: Column, predA: Column,
      predB: Column, label: Column): DataFrame = {
    val g = df.select(group.as("grp"),
      (predA.cast("boolean") === label.cast("boolean")).as("ra"),
      (predB.cast("boolean") === label.cast("boolean")).as("rb"))
    g.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("both_ok"),
        sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("c"))
      .select(col("grp"), col("n"), col("both_ok"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          stagedPpmDiv((col("b") - col("c")) * (col("b") - col("c")),
            col("b") + col("c"))).as("mcnemar_ppm"))
  }

  /** Per-group KRIPPENDORFF'S ALPHA (nominal metric, complete design) —
    * the multi-rater generalization [[cohenKappaPpm]] caps at two raters:
    * m ≥ 2 interchangeable raters per unit, chance agreement from the
    * POOLED value marginals with sampling-without-replacement correction.
    *
    * Exactly rational: with `N` complete units of `m` ratings each,
    * pairwise observed agreement `A_o = P / (N·m·(m−1))` where
    * `P = Σ_u Σ_c n_uc(n_uc−1)` (agreeing ordered rating pairs within
    * units) and expected agreement `A_e = Q / (Nm·(Nm−1))` where
    * `Q = Σ_c n_c(n_c−1)` (agreeing pairs from the pooled marginals), so
    * `α = (A_o − A_e)/(1 − A_e) = (P·D₂ − Q·D₁) div (D₁·(D₂ − Q))` over
    * `D₁ = Nm(m−1)`, `D₂ = Nm(Nm−1)` — BIGINT end to end, ×10⁶ via
    * [[stagedPpmDiv]] (the numerator is already ≈ m⁴N³, so the staged
    * form's headroom matters: good to per-group N ≈ 4·10⁵ at m = 3).
    * Degenerate groups where every rating is one value (D₂ = Q) yield
    * NULL (α undefined — no disagreement is even possible); α < 0
    * (worse than chance) divides exactly (both engines truncate toward
    * zero).
    *
    * Complete design: the group's rater count `m` is its max ratings per
    * unit, and units with fewer ratings DROP (the general missing-data
    * form needs per-unit 1/(m_u−1) weights — rational only over an lcm
    * that defeats the integer discipline; planned annotation rounds are
    * complete, and the drop is mirrored in the oracle).
    *
    * Scale shape: three keyed aggregates (unit sizes, per-unit-value
    * counts, pooled marginals) + one group-level combine — no window, no
    * join wider than the group key.
    *
    * @param df    one row PER RATING
    * @param group slice column
    * @param unit  the annotated unit's id
    * @param value the assigned label
    */
  def krippendorffAlphaPpm(df: DataFrame, group: Column, unit: Column,
      value: Column): DataFrame = {
    val g = df.select(group.as("grp"), unit.as("u"),
      value.cast("string").as("v"))
    val mu = g.groupBy(col("grp"), col("u")).agg(count(lit(1)).as("m_u"))
    val m = mu.groupBy(col("grp")).agg(max(col("m_u")).as("m"))
    val complete = mu.join(m, Seq("grp")).filter(col("m_u") === col("m"))
      .select(col("grp"), col("u"))
    val gg = g.join(complete, Seq("grp", "u"), "left_semi")
    val pAgg = gg.groupBy(col("grp"), col("u"), col("v"))
      .agg(count(lit(1)).as("n_uc"))
      .groupBy(col("grp"))
      .agg(sum(col("n_uc") * (col("n_uc") - 1)).as("p_num"))
    val nUnits = complete.groupBy(col("grp")).agg(count(lit(1)).as("n_units"))
    val qAgg = gg.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("n_c"))
      .groupBy(col("grp"))
      .agg(sum(col("n_c") * (col("n_c") - 1)).as("q_num"))
    nUnits.join(m, Seq("grp")).join(pAgg, Seq("grp")).join(qAgg, Seq("grp"))
      .withColumn("_d1", expr("n_units * m * (m - 1)"))
      .withColumn("_d2", expr("n_units * m * (n_units * m - 1)"))
      .filter(col("m") >= 2)
      .select(col("grp"), col("n_units"), col("m"), col("p_num"),
        col("q_num"),
        when(col("_d2") =!= col("q_num"),
          stagedPpmDiv(expr("p_num * _d2 - q_num * _d1"),
            expr("_d1 * (_d2 - q_num)")))
          .as("alpha_ppm"))
  }

  // -------------- multinomial Naive Bayes quality classifier (round 11)

  /** The ADDITIVE count table behind the Naive Bayes quality filter —
    * the fastText-shaped classifier every curation pipeline ships as its
    * cheap learned filter (Joulin et al. 2016's bag-of-hashed-tokens
    * recipe, trained here as pure counting). One row per
    * (class, feature): `h ∈ [0, buckets)` rows carry token-OCCURRENCE
    * counts (multinomial: a token counts once per occurrence) hashed by
    * the engine-portable md5 bucket ([[Curation.hashBucket]]); the
    * `h = −1` row per class carries the DOC count (the prior), so the
    * whole model is ONE additive artifact. Append = [[nbCombineCounts]];
    * retraction = the same fold with negated counts (the q285
    * additive-table algebra, property-tested in `GraftProperties`).
    * One explode + one map-side-combined groupBy; output ≤
    * 2·(buckets+1) rows regardless of corpus size.
    */
  def nbCounts(docs: DataFrame, idCol: String, tokCol: String,
      target: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val base = docs.select(col(idCol), target.as("y"),
      col(tokCol).as("_toks"))
    val tokCnt = base
      .select(col("y"), explode(col("_toks")).as("_t"))
      .select(col("y"), Curation.hashBucket(col("_t"), buckets).as("h"))
      .groupBy(col("y"), col("h")).agg(count(lit(1)).as("cnt"))
    val docCnt = base.groupBy(col("y")).agg(count(lit(1)).as("cnt"))
      .select(col("y"), lit(-1L).as("h"), col("cnt"))
    tokCnt.unionByName(docCnt)
  }

  /** Fold two NB count tables (append order never matters; retraction is
    * the same fold with negated counts — zeroed rows drop so the
    * retracted table is bit-identical to a rebuild from the remaining
    * corpus).
    */
  def nbCombineCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("y"), col("h"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)

  /** SERVE the Naive Bayes model from a (possibly maintained) count
    * table: per document, the Laplace-smoothed posterior ODDS
    * `P(pos|doc)/P(neg|doc) = prior · Π_t P(t|pos)/P(t|neg)` and the
    * decision `odds > 1`.
    *
    * Exactness discipline (the q266 recipe — no logs, no order-dependent
    * float sums): the model is BOUNDED (≤ 2·(buckets+1) rows), so the
    * per-bucket odds ratios are computed DRIVER-side as one IEEE
    * division of exact BIGINT cross-products each —
    * `((c_pos+1)·(N_neg+B)) / ((c_neg+1)·(N_pos+B))`, rounded to 9
    * decimals — and shipped as a LITERAL array. Scoring is then a pure
    * row-local fold: `aggregate(tokens, prior, (acc, t) ⇒
    * acc · ratio[h(t)])` — left-to-right in DOCUMENT order, so the
    * product order is pinned and any engine reproduces it bit-for-bit
    * (the DuckDB mirror folds the same list in the same order). Final
    * odds round to 6. Zero joins, zero shuffle: classification is a map
    * over the corpus, exactly the economics that let a learned filter
    * run inline with ingest at 100 TB.
    */
  def nbClassify(docs: DataFrame, idCol: String, tokCol: String,
      counts: DataFrame, buckets: Int): DataFrame = {
    // select by NAME before collecting: a user-built or re-projected
    // counts frame with a different column order must not silently
    // flip classes through the positional reads below
    val rows = counts.select(col("y").cast("boolean"),
      col("h").cast("long"), col("cnt").cast("long")).collect()
    def tot(pos: Boolean, doc: Boolean): Long = rows.iterator
      .filter(r => r.getBoolean(0) == pos &&
        (if (doc) r.getLong(1) == -1L else r.getLong(1) >= 0L))
      .map(_.getLong(2)).sum
    val (dp, dn) = (tot(pos = true, doc = true), tot(pos = false, doc = true))
    require(dp > 0 && dn > 0,
      s"nbClassify: both classes need training docs (pos=$dp, neg=$dn)")
    val (np, nn) = (tot(pos = true, doc = false), tot(pos = false, doc = false))
    val byH = rows.filter(_.getLong(1) >= 0L)
      .groupBy(_.getLong(1))
      .map { case (h, rs) =>
        h -> (rs.filter(_.getBoolean(0)).map(_.getLong(2)).sum,
          rs.filter(!_.getBoolean(0)).map(_.getLong(2)).sum)
      }
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ratios = Array.tabulate(buckets) { h =>
      val (cp, cn) = byH.getOrElse(h.toLong, (0L, 0L))
      round9(((cp + 1L) * (nn + buckets)).toDouble /
        ((cn + 1L) * (np + buckets)).toDouble)
    }
    val prior = round9(dp.toDouble / dn.toDouble)
    docs.select(col(idCol), col(tokCol).as("_toks"))
      .withColumn("n_toks", size(col("_toks")).cast("long"))
      .withColumn("odds", round(aggregate(col("_toks"), lit(prior),
        (acc, t) => acc * element_at(lit(ratios),
          (Curation.hashBucket(t, buckets) + 1L).cast("int"))), 6))
      .select(col(idCol), col("n_toks"), col("odds"),
        (col("odds") > 1.0d).as("pred"))
  }

  /** Per-document bigram hashed positions `(id, pos, h1, h2)` — shared
    * by [[bigramLmCounts]] and [[bigramLmScore]] so train and serve
    * hash identically. Row-local; docs with < 2 tokens emit nothing.
    */
  private def bigramPositions(docs: DataFrame, idCol: String,
      tokCol: String, vocab: Int): DataFrame =
    docs.select(col(idCol).as("id"), col(tokCol).as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .select(col("id"), posexplode(expr(
        "transform(sequence(1, size(_toks) - 1), " +
          "i -> struct(element_at(_toks, i) AS w1, " +
          "element_at(_toks, i + 1) AS w2))")).as(Seq("pos", "bg")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        Curation.hashBucket(col("bg.w1"), vocab).as("h1"),
        Curation.hashBucket(col("bg.w2"), vocab).as("h2"))

  /** BIGRAM LANGUAGE-MODEL counts over a hashed vocabulary — the
    * training half of the CCNet-style perplexity quality filter
    * (Wenzek et al. 2020 score documents with a reference LM and keep
    * the low-perplexity stratum; here the LM is an exact-count bigram
    * model the engine trains itself). One row per (h1, h2) bigram plus
    * the context marginal as (h1, −1) — context counts are the sums the
    * conditionals divide by, so the whole model is again ONE additive
    * table: append = unionByName + sum, retraction = the same fold
    * negated ([[nbCombineCounts]]' algebra applies verbatim — the
    * shapes are identical by design).
    */
  def bigramLmCounts(docs: DataFrame, idCol: String, tokCol: String,
      vocab: Int): DataFrame = {
    require(vocab >= 2, s"vocab must be >= 2, got $vocab")
    val bg = bigramPositions(docs, idCol, tokCol, vocab)
    bg.groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("cnt"))
      .unionByName(bg.groupBy(col("h1")).agg(count(lit(1)).as("cnt"))
        .select(col("h1"), lit(-1L).as("h2"), col("cnt")))
  }

  /** SERVE the bigram LM as a per-document fluency score: each bigram
    * contributes the Laplace-smoothed conditional scaled ×1000 (the
    * q266 near-unity scaling that keeps a pinned-order product of
    * hundreds of factors inside double range without logs) —
    * `f = round(1000·(c(h1,h2)+1) / (c(h1,·)+V), 9)` — and the document
    * score is the position-ordered product, rounded to 6. Unseen
    * bigrams/contexts coalesce to 0 counts, so out-of-domain text
    * scores low — exactly the filter's job. Docs with < 2 tokens score
    * the empty product 1.0 with n_bigrams 0.
    *
    * Shape: bigrams equi-join the count table on (h1, h2) then (h1) —
    * both bounded by vocab², broadcastable at any corpus size since the
    * model is count-bounded by V² rows; the per-doc fold re-pins
    * position order via array_sort(struct(pos, f)) before the
    * left-to-right product, so the score is a pure function of the
    * document, independent of partitioning. Double-range headroom: ~250
    * tokens/doc at the ×1000 scaling — past that, score windows of the
    * doc separately (the same discipline CCNet applies per paragraph).
    */
  def bigramLmScore(docs: DataFrame, idCol: String, tokCol: String,
      counts: DataFrame, vocab: Int): DataFrame = {
    val bg = bigramPositions(docs, idCol, tokCol, vocab)
    val c2 = counts.filter(col("h2") >= 0)
      .select(col("h1"), col("h2"), col("cnt").as("_c2"))
    val c1 = counts.filter(col("h2") === -1L)
      .select(col("h1"), col("cnt").as("_c1"))
    val scored = bg
      .join(broadcast(c2), Seq("h1", "h2"), "left")
      .join(broadcast(c1), Seq("h1"), "left")
      .withColumn("_f", round(
        ((coalesce(col("_c2"), lit(0L)) + 1L) * 1000L).cast("double") /
          (coalesce(col("_c1"), lit(0L)) + vocab).cast("double"), 9))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        collect_list(struct(col("pos"), col("_f"))).as("_fs"))
      .withColumn("score", round(aggregate(
        array_sort(col("_fs")), lit(1.0d),
        (acc, x) => acc * x.getField("_f")), 6))
      .select(col("id"), col("n_bigrams"), col("score"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(1.0d)).as("score"))
  }

  // ---- persisted learned-filter artifacts (round 12): the NB and
  // bigram-LM count tables get the same save/load/delta/retract surface
  // as every other model artifact (IVF, PQ, inverted index, MRL tier).
  // Both tables are BOUNDED — NB ≤ 2·(buckets+1) rows, bigram ≤ V²+V —
  // so each persists as one parquet shard; maintenance never rescans a
  // corpus, only folds additive deltas ([[nbCombineCounts]] /
  // [[bigramLmCombineCounts]]), and retraction is the negated fold
  // (zeroed rows drop, so retract ∘ append == identity bit-for-bit —
  // property-tested in GraftProperties). At 100 TB the artifact is the
  // same handful of rows; only the one-pass COUNTING jobs that produce
  // deltas scale with data, and those are single map-side-combined
  // aggregates.

  /** Fold two bigram-LM count tables — [[nbCombineCounts]]' algebra on
    * the (h1, h2) key (context marginals ride h2 = −1 and fold the same
    * way). Retraction = the same fold with negated counts.
    */
  def bigramLmCombineCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("h1"), col("h2"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)

  /** Negate a count table's `cnt` — the retraction delta for either
    * additive model table (feed through the matching combine).
    */
  def negateCounts(counts: DataFrame): DataFrame =
    counts.withColumn("cnt", -col("cnt"))

  def saveNbCounts(counts: DataFrame, dir: String): Unit =
    graft.sources.Generations.save(dir) { g =>
      counts.select(col("y"), col("h"), col("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(g)
    }: Unit

  def loadNbCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(graft.sources.Generations.loadPath(dir))
      .select(col("y"), col("h"), col("cnt"))

  def saveBigramLmCounts(counts: DataFrame, dir: String): Unit =
    graft.sources.Generations.save(dir) { g =>
      counts.select(col("h1"), col("h2"), col("cnt"))
        .coalesce(1).write.mode("overwrite").parquet(g)
    }: Unit

  def loadBigramLmCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(graft.sources.Generations.loadPath(dir))
      .select(col("h1"), col("h2"), col("cnt"))
}
