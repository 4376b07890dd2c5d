package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ/dbt-test shape): each check
  * reduces a table to ONE row — (check_name, n_violations, n_checked) —
  * and a report is the union of checks.
  *
  * Scale: a predicate check is a single partial-aggregated scan (the
  * exchange carries one row per map task); an FK check is one left-anti
  * join, broadcast when the parent key set is small, else a keyed
  * shuffle. Checks against the same table reuse the scan via Catalyst's
  * exchange/subplan reuse where shapes allow; at 100 TB the win is that
  * violations COUNT without ever materializing — no violating-row
  * collect unless a debugging query asks for samples.
  */
object Quality {

  /** One predicate check: rows where `violation` is true are defects.
    *
    * SQL three-valued logic applies: a row where the predicate evaluates
    * to NULL (e.g. `qty < 0` on a null qty) counts as CLEAN — same as the
    * `count(CASE WHEN ... THEN 1 END)` oracle form. Pair every range/
    * comparison check with an explicit `col.isNull` check when nulls are
    * themselves defects; `violation || col.isNull` folds both into one.
    */
  def check(name: String, df: DataFrame, violation: Column): DataFrame =
    df.select(
      lit(name).as("check_name"),
      count(when(violation, lit(1))).as("n_violations"),
      count(lit(1)).as("n_checked"))

  /** Referential-integrity check: child rows whose key has no parent.
    * ONE pass over the child: a left join against the distinct parent
    * keys (broadcast when small) with a conditional count — not an
    * anti-join branch plus a separate total-count scan.
    */
  def fkCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("_present", lit(1))
    child.select(col(childKey))
      .join(pk, Seq(childKey), "left")
      .select(
        lit(name).as("check_name"),
        // SQL referential integrity (MATCH SIMPLE): a NULL child key
        // SATISFIES the constraint — only a non-null key with no parent
        // is an orphan. Counting nulls as violations would flag every
        // optional reference on a nullable FK column.
        count(when(col("_present").isNull && col(childKey).isNotNull,
          lit(1))).as("n_violations"),
        count(lit(1)).as("n_checked"))
  }

  /** Key-uniqueness check: duplicate keys count as violations. NULL keys
    * are UNCHECKED (SQL UNIQUE semantics: nulls are distinct) — counting
    * them via count(*) − count_distinct would report every null row as a
    * violation on a duplicate-free table, since count_distinct skips
    * nulls while count(*) does not.
    */
  def uniqueCheck(name: String, df: DataFrame, key: String): DataFrame =
    df.select(
      lit(name).as("check_name"),
      (count(col(key)) - count_distinct(col(key))).as("n_violations"),
      count(lit(1)).as("n_checked"))

  /** A report is the union of one-row checks. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_.unionByName(_))
  }

  /** Functional-dependency check det → dep: violations are DETERMINANT
    * values mapping to more than one distinct dependent (so `n_checked`
    * counts determinant groups, not rows). The schema-discovery /
    * dirty-join-key audit: an FD that "should" hold but doesn't is how a
    * dimension join silently fans out. Shape: one group-aggregate on the
    * determinant, one-row summary — countDistinct state is per-group.
    */
  def fdCheck(name: String, df: DataFrame, det: Seq[Column],
      dep: Column): DataFrame =
    df.groupBy(det: _*)
      // count_distinct skips NULLs, so a {NULL, 'x'} group would pass
      // clean although the determinant maps to two different dependents —
      // exactly the dirty-join-key fan-out this audit exists to catch.
      // A present NULL counts as one more distinct dependent value.
      .agg((count_distinct(dep) +
        when(count(lit(1)) > count(dep), 1L).otherwise(0L)).as("_nd"))
      .select(
        lit(name).as("check_name"),
        count(when(col("_nd") > 1, lit(1))).as("n_violations"),
        count(lit(1)).as("n_checked"))

  /** k-anonymity audit over quasi-identifier columns: violations are
    * equivalence CLASSES smaller than k — any row in one is
    * re-identifiable to fewer than k candidates (Sweeney 2002). One
    * group-aggregate; `n_checked` counts classes. Pair with the class
    * listing (`kAnonymityClasses`) when the offending combinations
    * themselves must ship to a reviewer.
    */
  def kAnonymityCheck(name: String, df: DataFrame, quasiIds: Seq[Column],
      k: Long): DataFrame =
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("_n"))
      .select(
        lit(name).as("check_name"),
        count(when(col("_n") < k, lit(1))).as("n_violations"),
        count(lit(1)).as("n_checked"))

  /** The violating equivalence classes of [[kAnonymityCheck]], with
    * sizes — bounded output (only under-k classes), deterministic.
    */
  def kAnonymityClasses(df: DataFrame, quasiIds: Seq[Column],
      k: Long): DataFrame =
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)

  /** l-diversity audit: the equivalence classes (by quasi-identifier)
    * whose SENSITIVE attribute takes fewer than `l` distinct values —
    * the classic complement to k-anonymity (Machanavajjhala et al., ICDE
    * 2006): a class can hold k=50 people and still leak the diagnosis if
    * all 50 share it. Bounded output (violating classes only); one
    * group-aggregate, `countDistinct` expands to the usual two-phase
    * distinct aggregation — no row ever leaves its class's partition
    * twice.
    */
  def lDiversityClasses(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, l: Long): DataFrame =
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_distinct"))
      .filter(col("n_distinct") < l)

  /** t-closeness audit for an ORDERED sensitive attribute bucketed into
    * `m` ordinal categories (Li et al., ICDE 2007): per quasi-identifier
    * class, the earth-mover's distance between the class's bucket
    * distribution and the global one, under the ordered-distance ground
    * metric — `EMD = (1/(m−1)) Σ_{i<m−1} |Σ_{j≤i} (p_j − q_j)|`.
    *
    * Exact rational arithmetic: with class counts `c_i` (size `n`) and
    * global counts `g_i` (size `N`), each prefix difference is kept over
    * the common denominator `n·N` as the integer `d_i = Σ_{j≤i} (c_j·N −
    * g_j·n)`, and `emd_ppm = 10⁶·Σ|d_i| div ((m−1)·n·N)` — BIGINT only,
    * engine-exact. Overflow headroom: Σ|d_i| ≤ (m−1)·n·N, so the 10⁶
    * scaling needs `(m−1)·n·N < 2⁶³/10⁶ ≈ 9·10¹²` — fine for per-class
    * sizes into the millions at 10⁹ total rows; beyond that, drop to a
    * pre-floored ppm distribution (documented trade, not needed here).
    *
    * Scale shape: one (quasi, bucket) aggregate, one m-key global
    * aggregate broadcast, and an m-row-per-class spine built with
    * `explode(sequence(...))` so empty buckets participate — the cumsum
    * runs on a window keyed by class, partition-local after one
    * exchange. `bucket` must already be an integral 0..m−1 column.
    */
  def tClosenessEmd(df: DataFrame, quasiIds: Seq[Column], bucket: Column,
      m: Int): DataFrame = {
    require(m >= 2, s"need at least 2 ordered buckets, got $m")
    val base = df.select((quasiIds :+ bucket.cast("long").as("_b")): _*)
    val qNames = base.columns.dropRight(1).toSeq
    val qCols = qNames.map(col)
    val cls = base.groupBy((qCols :+ col("_b")): _*)
      .agg(count(lit(1)).as("c"))
    val glob = base.groupBy(col("_b")).agg(count(lit(1)).as("g"))
    val totals = base.groupBy(qCols: _*).agg(count(lit(1)).as("n"))
    val bigN = base.agg(count(lit(1)).as("N_total"))
    // class x bucket spine: every class sees all m buckets, absent = 0
    val spine = totals
      .withColumn("_b", explode(sequence(lit(0L), lit(m - 1L))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qCols: _*).orderBy(col("_b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine
      .join(cls, qNames :+ "_b", "left")
      .join(broadcast(glob), Seq("_b"), "left")
      .crossJoin(broadcast(bigN))
      .withColumn("d", sum(
        coalesce(col("c"), lit(0L)) * col("N_total")
          - coalesce(col("g"), lit(0L)) * col("n")).over(w))
      .filter(col("_b") < m - 1)
      .groupBy((qCols :+ col("n") :+ col("N_total")): _*)
      .agg(sum(abs(col("d"))).as("emd_num"))
      .select((qCols :+ col("n").as("class_size") :+
        expr(s"emd_num * 1000000 div ((${m - 1}) * n * N_total)")
          .as("emd_ppm")): _*)
  }

  /** Total-variation distance between two slices' CATEGORY distributions,
    * exact in ppm — the categorical drift gauge next to the continuous KS
    * check (q131): `TVD = ½ Σ_cat |p_cat − q_cat|`, kept over the common
    * denominator `N_a·N_b` as `Σ|a_cat·N_b − b_cat·N_a| · 10⁶ div
    * (2·N_a·N_b)` — BIGINT only, engine-exact, and unlike PSI/KL it
    * needs no logarithm and tolerates empty categories (a category seen
    * in only one slice just contributes its full mass). One category
    * aggregate + a broadcast of the two totals; an empty slice yields
    * NULL rather than a fake 0.
    */
  def tvdPpm(df: DataFrame, category: Column, inA: Column): DataFrame = {
    val g = df.select(category.as("cat"), inA.cast("boolean").as("ia"))
    val per = g.groupBy(col("cat"))
      .agg(sum(when(col("ia"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("ia"), 1L).otherwise(0L)).as("b"))
    val tot = per.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    per.crossJoin(broadcast(tot))
      .groupBy(col("na"), col("nb"))
      // per-category products in DECIMAL too: a·nb itself wraps BIGINT
      // past ~3e9-row slices
      .agg(sum(abs(expr("CAST(a AS DECIMAL(38,0)) * nb") -
          expr("CAST(b AS DECIMAL(38,0)) * na")))
        .as("num"), count(lit(1)).as("n_categories"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("n_categories"),
        // DECIMAL(38,0) intermediates: num ≤ 2·na·nb, so num·10⁶ passes
        // Long.MaxValue once tvd·na·nb > ~4.6e12 (10 % drift at ~7M
        // rows/slice — routine at scale) and the BIGINT multiply would
        // wrap silently; 38 digits hold the product exactly and the
        // integral divide returns the same BIGINT value wherever the
        // long path didn't overflow
        when(col("na") > 0 && col("nb") > 0,
          expr("CAST(num AS DECIMAL(38,0)) * 1000000" +
            " div (CAST(na AS DECIMAL(38,0)) * 2 * nb)")).as("tvd_ppm"))
  }

  /** Cumulative ppm thresholds of the TWO-SIDED GEOMETRIC distribution
    * with α = e^−ε at ε = 0.5, support clamped to [−8, 8] (the tail mass
    * beyond ±8, ≈1.14%, folds into the extremes — a documented truncation
    * like the Benford/Poisson literal tables). P(Z = z) ∝ α^|z| is the
    * integer-valued analogue of the Laplace mechanism (Ghosh, Roughgarden
    * & Sundararajan, STOC 2009: universally utility-maximizing for
    * counts), and unlike Laplace it needs NO logarithm — the draw is a
    * threshold scan over an md5 uniform, exact in integers in any engine.
    */
  val TwoSidedGeomPpm: Seq[(Long, Long)] = Seq(
    -8L -> 11400L, -7L -> 18796L, -6L -> 30990L, -5L -> 51094L,
    -4L -> 84240L, -3L -> 138889L, -2L -> 228989L, -1L -> 377540L,
    0L -> 622459L, 1L -> 771010L, 2L -> 861110L, 3L -> 915759L,
    4L -> 948905L, 5L -> 969009L, 6L -> 981203L, 7L -> 988599L,
    8L -> 1000000L)

  /** ε-differentially-private count release (ε = 0.5, sensitivity 1) via
    * the two-sided geometric mechanism: per key-group, `noisy = max(0,
    * count + Z)` with `Z` drawn from [[TwoSidedGeomPpm]] on the md5
    * uniform of the group key and a caller-chosen release tag — the same
    * md5-derived-randomness convention as every sampler here, so the
    * release is deterministic per (key, tag): re-running the job CANNOT
    * leak extra budget by re-rolling the noise, and both engines draw the
    * identical value (a seeded `rand()` or a float Laplace has neither
    * property). Distinct tags = distinct releases = additive ε spend,
    * which is the caller's ledger to keep (documented, not enforced).
    *
    * Output keeps the true count alongside the noisy one because the
    * driver oracle re-derives both; a production release would project
    * the true column away.
    *
    * Scale shape: one keyed count + a row-local when-chain over ≤ 17
    * literal thresholds — no second pass, no collect.
    */
  def dpNoisyCounts(df: DataFrame, keys: Seq[Column],
      releaseTag: String): DataFrame = {
    val counted = df.groupBy(keys: _*).agg(count(lit(1)).as("true_n"))
    val keyNames = counted.columns.dropRight(1)
    // tableChecksum's coalesce convention: concat_ws SKIPS a null operand
    // (separator and all), so without the coalesce a NULL key value would
    // hash identically to the tuple with that key absent — two distinct
    // key tuples drawing the same noise, and diverging from the oracle's
    // null-propagating '||' rendering
    val u = conv(substring(md5(concat_ws("|",
      keyNames.map(c => coalesce(col(c).cast("string"), lit("")))
        :+ lit(releaseTag): _*)),
      1, 8), 16, 10).cast("long") % 1000000L
    val z = TwoSidedGeomPpm.reverse.foldLeft[Column](lit(8L)) {
      case (acc, (zv, cumPpm)) => when(u < cumPpm, zv).otherwise(acc)
    }
    counted.withColumn("z", z)
      .withColumn("noisy_n", greatest(lit(0L), col("true_n") + col("z")))
  }

  /** The canonical row digest [[tableChecksum]] sums: 32-bit md5 prefix of
    * the '|'-joined, null-coalesced column renderings (see tableChecksum
    * for why 32 bits and why coalesce).
    */
  private def rowDigest(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit(""))): _*)), 1, 8), 16, 10)
      .cast("long")

  /** Per-bucket table checksums (anti-entropy / Merkle-style digests):
    * rows hash to md5-derived BIGINTs, bucketed by key hash; each bucket
    * reduces to (n_rows, checksum = Σ row-hash). Two replicas compare
    * bucket lists and re-sync only mismatched buckets — O(buckets)
    * comparison for any table size. Order-independent by construction
    * (sum is commutative), exact (no float), and engine-portable: the
    * row digest is md5 over a '|'-joined canonical string, mirrored
    * verbatim in SQL oracles.
    *
    * One partial-aggregated shuffle of `buckets` groups; the md5s are
    * row-local codegen. Null columns render as empty strings in the
    * canonical form — callers needing null-vs-empty distinction should
    * pre-encode.
    */
  def tableChecksum(df: DataFrame, keyCol: String, cols: Seq[Column],
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // 8 hex chars = 32 bits per row digest: the bucket sum stays exact
    // BIGINT below ~2^31 rows per bucket (a 60-bit digest would overflow
    // the sum at ~8 rows and wrap differently per engine).
    // coalesce-to-"" is load-bearing: concat_ws SKIPS nulls, so without it
    // (1, null, "x") and (1, "x", null) would digest identically and the
    // SQL mirror ('||' null-propagates) would diverge on any null row
    df.select(Curation.hashBucket(col(keyCol), buckets).as("bucket"),
        rowDigest(cols).as("_h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("_h")).as("checksum"))
  }

  /** Advance [[tableChecksum]] digests by a [[graft.operators.Relational.snapshotDiff]]
    * change log WITHOUT rescanning the table: the checksum sum is
    * commutative, so each changed row contributes a signed delta —
    * deletes/updates subtract the OLD row's digest, inserts/updates add
    * the NEW row's — folded into the stored bucket table in
    * O(|changes| + buckets). `valCols` are the diff's value column base
    * names (prefixed old_/new_ there); the checksummed canonical form is
    * (key, values...) in that order, matching a tableChecksum over
    * (keyCol +: valCols). A hash match against the direct checksum of the
    * new snapshot proves maintenance == recompute.
    */
  def applyChecksumDelta(baseChecksum: DataFrame, diff: DataFrame,
      keyCol: String, valCols: Seq[String], buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val oldDigest = rowDigest(col(keyCol) +: valCols.map(c => col(s"old_$c")))
    val newDigest = rowDigest(col(keyCol) +: valCols.map(c => col(s"new_$c")))
    val deltas = diff.select(Curation.hashBucket(col(keyCol), buckets)
        .as("bucket"), explode(array(
        when(col("change_type").isin("delete", "update"),
          struct(lit(-1L).as("_n"), (-oldDigest).as("_h"))),
        when(col("change_type").isin("insert", "update"),
          struct(lit(1L).as("_n"), newDigest.as("_h"))))).as("d"))
      .filter(col("d").isNotNull)
      .select(col("bucket"), col("d._n").as("_n"), col("d._h").as("_h"))
    baseChecksum
      .select(col("bucket"), col("n_rows").as("_n"), col("checksum").as("_h"))
      .unionByName(deltas)
      .groupBy(col("bucket"))
      .agg(sum(col("_n")).as("n_rows"), sum(col("_h")).as("checksum"))
      .filter(col("n_rows") > 0)
  }

  /** Split-balance drift: per stratum, how far split `a`'s share diverges
    * from split `b`'s. The statistic is the cross-multiplied count
    * imbalance `|n_a * N_b - n_b * N_a|` — zero iff the stratum's share
    * is identical in both splits, and EXACT BIGINT arithmetic (the
    * chi-square-style ratio would force engine-divergent floats; the
    * cross-product orders strata identically without them).
    *
    * One groupBy on the stratum (partial-aggregated) + a broadcast of the
    * two scalar totals: scales to any stratum cardinality. Overflow
    * bound: the cross products stay exact while per-stratum counts and
    * split totals are both below ~3·10⁹ (their product must fit a
    * BIGINT); past that the plan-level guard fails loudly rather than
    * letting non-ANSI arithmetic wrap into a garbage gate value.
    */
  def splitBalance(df: DataFrame, stratumCol: String, splitCol: String,
      a: String, b: String): DataFrame = {
    val lim = 3000000000L // sqrt(Long.MaxValue) ≈ 3.037e9
    val perStratum = df.groupBy(col(stratumCol))
      .agg(count(when(col(splitCol) === a, lit(1))).as("n_a"),
        count(when(col(splitCol) === b, lit(1))).as("n_b"))
    val totals = perStratum
      .select(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    perStratum.crossJoin(broadcast(totals))
      .filter(coalesce(assert_true(
        col("n_a") < lim && col("n_b") < lim &&
          col("_ta") < lim && col("_tb") < lim,
        lit("splitBalance: counts exceed the exact-BIGINT cross-product " +
          "bound (~3e9) — pre-aggregate strata or sample before gating")),
        lit(true)))
      .select(col(stratumCol), col("n_a"), col("n_b"),
        abs(col("n_a") * col("_tb") - col("n_b") * col("_ta"))
          .as("imbalance"))
  }
}
