package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic splits/sampling,
  * benchmark decontamination, sequence packing, vocabulary building.
  * These are the steps between "deduped corpus" and "training shards" in
  * an LLM data pipeline.
  *
  * Determinism stance: every assignment is a pure function of row CONTENT
  * (md5-derived buckets), never of partitioning, row order, or a seed
  * carried in the session — so a 1000-executor run, a local run, and the
  * DuckDB oracle all agree row-for-row, and re-running a pipeline after
  * adding data never reshuffles previously-assigned rows.
  *
  * Scale: split/sample/pack are row-local or one-keyed-window ops;
  * decontamination shuffles on the gram hash (bounded by the benchmark's
  * gram count, not the corpus); vocabulary is a partial-aggregated count.
  */
object Curation {

  /** TOKEN-BUDGET corpus selection: per group (source/language/domain),
    * keep the best-quality prefix whose cumulative token count fits
    * `budget` — the "n tokens per source, best first" knob every training
    * mixture spec ends in. The kept set is the strict prefix of the
    * (score desc, id asc) ordering with running-sum ≤ budget: the first
    * overflowing doc excludes itself AND everything after it (prefix
    * rule — deterministic, mirrorable as one SQL window, and what
    * production mixtures do; knapsack-style backfilling would make the
    * selection depend on global optimization, not a stable ordering).
    *
    * One shuffle on the group key; the per-group sort is the window's.
    * Emits the input columns + `cum_tokens`. At 100 TB the group key is
    * the mixture source (dozens of values) — for a skew-heavy grouping,
    * pre-aggregate per (group, score-band) before the window.
    */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, idCol: String,
      tokCol: String, scoreCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // ROWS frame pinned explicitly: the (score desc, id asc) order is only
    // a total order when ids are unique — under duplicate ids Spark's
    // default RANGE frame would sum ties together while the oracle's ROWS
    // frame would not. Pinning ROWS makes both engines agree on any input.
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Stable hash bucket in [0, buckets): first 8 md5 hex chars of the id's
    * string form, mod buckets. Engine-portable (DuckDB:
    * ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT % buckets).
    */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Deterministic named split (train/val/test...): `splits` are
    * (name, percent) with percents summing to 100. A row's split is decided
    * by its id bucket alone — adding rows later never moves existing rows
    * between splits (the reproducibility property random splits lack).
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100 &&
      splits.forall(_._2 > 0),
      s"split percents must be positive and sum to 100, got $splits")
    val b = hashBucket(col(idCol), 100)
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    // CASE over ascending cuts, built inside-out so the FIRST matching
    // range wins: when(b < cut1, s1).when(b < cut2, s2)...
    val caseExpr = splits.zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), cut)) =>
        when(b < cut, name).otherwise(acc)
      }
    df.withColumn("split", caseExpr)
  }

  /** Deterministic downsample: keep ids whose bucket < `keep` of `outOf`
    * (e.g. 10 of 100 = a stable 10% sample). Per-stratum rates compose by
    * filtering within groups upstream.
    */
  def hashSample(df: DataFrame, idCol: String, keep: Int, outOf: Int): DataFrame = {
    require(keep >= 0 && keep <= outOf,
      s"keep ($keep) must be within [0, $outOf]")
    df.filter(hashBucket(col(idCol), outOf) < keep)
  }

  /** Stratified deterministic sample: per-stratum keep rates (percent out
    * of 100) from a small config table, applied as a hash-bucket threshold
    * on the id. Strata absent from `rates` fall back to `defaultRate`.
    * The rates table is a handful of rows → broadcast map-side; the big
    * side is a single filtered scan, zero shuffles. Sampling is a pure
    * function of (id, stratum-rate), so re-runs and corpus growth never
    * reshuffle previously-kept rows — the property an LLM data mixture
    * needs when per-language/per-source rates are tuned between runs.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Seq[(String, Int)], defaultRate: Int): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 100),
      s"rates must be percents in [0,100], got $rates default=$defaultRate")
    require(rates.map(_._1).distinct.size == rates.size,
      s"duplicate stratum keys in rates (each would duplicate its " +
        s"stratum's sampled rows through the join): $rates")
    val spark = df.sparkSession
    val rateDf = spark.createDataFrame(rates).toDF(stratumCol, "_rate")
    df.join(broadcast(rateDf), Seq(stratumCol), "left")
      .withColumn("_rate", coalesce(col("_rate"), lit(defaultRate)))
      .filter(hashBucket(col(idCol), 100) < col("_rate"))
      .select(df.columns.map(col).toSeq: _*) // original column order
  }

  /** Deterministic weighted sampling WITHOUT replacement (bottom-k /
    * priority sampling): the k rows with the smallest md5-draw/weight
    * ratio, so inclusion probability scales with `weightCol` but the
    * sample is a PURE FUNCTION of the data — reruns, retries, and
    * cluster-size changes reproduce it bit-for-bit, the property
    * [[hashSample]]/[[stratifiedSample]] give uniform sampling, extended
    * here to arbitrary weights (sample long documents more, or apply
    * q77's mixture weights at the document level).
    *
    * One pass, bounded state: the [[graft.functions.WeightedSampleAggregator]]
    * holds ≤ k candidates per map task and merges associatively
    * (ObjectHashAggregate with map-side combine), so nothing resembling
    * a global sort or a full shuffle ever forms. Ratio comparisons are
    * exact 128-bit cross-multiplications — no float, no merge-order
    * sensitivity. Returns (idCol, h, w), ascending by draw ratio.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val items = df.select(h.as("h"), weightCol.cast("long").as("w"),
        col(idCol).cast("long").as("id"))
      .as[graft.functions.WeightedItem]
    val agg = new graft.functions.WeightedSampleAggregator(k)
    items.groupByKey(_ => 0)
      .agg(agg.toColumn.name("sample"))
      .flatMap(_._2)
      .toDF("h", "w", "id")
      .select(col("id").as(idCol), col("h"), col("w"))
  }

  /** Per-group [[weightedSample]]: k rows per group (the mixture-
    * sampling shape — "10 documents per source, weighted by length").
    * Same bounded-state aggregator, keyed by the group instead of a
    * constant, so state is ≤ k × groups × tasks and the single shuffle
    * carries only sketches. Returns (groupCol, idCol, h, w).
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, k: Int, salt: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(concat(lit(salt + "|"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val items = df.select(col(groupCol).cast("string").as("_1"),
        struct(h.as("h"), weightCol.cast("long").as("w"),
          col(idCol).cast("long").as("id")).as("_2"))
      .as[(String, graft.functions.WeightedItem)]
    val agg = new graft.functions.WeightedSampleAggregator(k)
    items.groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("sample"))
      .flatMap { case (g, s) => s.map(e => (g, e.id, e.h, e.w)) }
      .toDF(groupCol, idCol, "h", "w")
  }

  /** Shard writer — the training-data output path. Writes `df` as a
    * partitioned parquet tree (`partitionCols` become directories, so
    * downstream reads partition-prune for free) with every file bounded
    * to `maxRecordsPerFile` rows and rows inside each file ordered by
    * `layoutSort` (pass a `Relational.zorderValue` column to cluster
    * multi-dimensionally — file-level min/max stats then skip on any
    * interleaved dimension).
    *
    * The repartition-by-partition-columns before the write is the
    * small-files fix: without it every task holding rows of partition P
    * opens its own file under P (tasks × partitions files); with it each
    * partition's rows land in one task, which rolls files only at the
    * record cap. One shuffle, and it's the shuffle that buys a sane file
    * count at 1000 executors.
    */
  def writeShards(df: DataFrame, outDir: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long, layoutSort: Seq[Column] = Nil): Unit = {
    require(partitionCols.nonEmpty, "writeShards needs partition columns")
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    val pcols = partitionCols.map(col)
    df.repartition(pcols: _*)
      .sortWithinPartitions(pcols ++ layoutSort: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
  }

  /** Benchmark decontamination: flag corpus docs sharing ANY word n-gram
    * with the benchmark set. Grams travel as md5 HASHES so the shuffle
    * carries 32-char keys, not raw text; the benchmark gram set is tiny
    * relative to the corpus → Catalyst broadcasts it (no corpus shuffle).
    * Returns (doc_id, n_shared) for contaminated docs; clean docs are the
    * anti-join of the corpus against this (see q63).
    */
  // tokens materialize as a named column FIRST: inlining the tokenizer
  // into the shingle lambda would re-split the text once per element_at
  // (n per position — O(len²) interpreted work; measured 25 s -> 2 s)
  private def gramRelation(df: DataFrame, textCol: String, n: Int,
      keep: Seq[Column]): DataFrame =
    df.withColumn("_tok", Dedup.tokens(col(textCol)))
      .select(keep :+ explode(Dedup.shingles(col("_tok"), n)).as("_gram"): _*)
      .select(keep :+ md5(col("_gram")).as("gram_h"): _*)

  /** Per-document n-gram NOVELTY against everything that came before it
    * (in id order): of a doc's distinct n-grams, how many were already
    * introduced by a smaller-id doc. High `seen_ppm` = the doc is mostly
    * recombined boilerplate — the soft-redundancy score between exact
    * span dedup (all-or-nothing) and near-dup (whole-doc granularity),
    * and a memorization-risk proxy for training mixes.
    *
    * Two keyed shuffles, both bounded: min-id per gram (gram-keyed,
    * map-side combined), then per-doc counts (doc-keyed). "First" =
    * smallest doc id — a pure function of the data, not of arrival or
    * partition order, so the score is reproducible anywhere.
    */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = gramRelation(df, textCol, n, Seq(col(idCol))).distinct()
    val first = grams.groupBy(col("gram_h")).agg(min(col(idCol)).as("_first"))
    grams.join(first, Seq("gram_h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_first") < col(idCol), 1L).otherwise(0L)).as("n_seen"))
      .withColumn("seen_ppm", expr("n_seen * 1000000 div n_grams"))
  }

  def contaminatedDocs(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val benchGrams = gramRelation(bench, textCol, n, Seq.empty).distinct()
    gramRelation(corpus, textCol, n, Seq(col(idCol)))
      .join(benchGrams, Seq("gram_h"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("gram_h")).as("n_shared"))
  }

  /** [[contaminatedDocs]] with a bloom prefilter on the corpus gram
    * stream. The benchmark gram set folds into ONE bloom sketch
    * (`graft_bloom_agg` — partial-aggregated map-side; only the final
    * `numBits/8`-byte sketch reaches the driver, and it ships back as a
    * broadcast literal, never the gram rows). Corpus grams then probe the
    * sketch row-locally (`graft_might_contain`, codegen'd) BEFORE the
    * join: at 100 TB the corpus gram stream is the dominant shuffle-ahead
    * volume, and the bloom drops the overwhelmingly-clean majority at the
    * map side — only (actual hits + fpp · |corpus grams|) rows reach the
    * exchange. Determinism is untouched: the bloom only PRUNES — every
    * surviving gram still passes the exact equi-join, so false positives
    * are removed and the output is bit-identical to the exact path (q144
    * hash-matches q63's oracle verbatim).
    */
  def contaminatedDocsBloom(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    require(expectedItems > 0 && numBits > 0,
      s"bloom sizing must be positive, got $expectedItems items / $numBits bits")
    val benchGrams = gramRelation(bench, textCol, n, Seq.empty).distinct()
    val sketchRow = benchGrams
      .agg(call_function("graft_bloom_agg", xxhash64(col("gram_h")),
        lit(expectedItems), lit(numBits)).as("_bf")).head()
    if (sketchRow.isNullAt(0)) {
      // empty benchmark -> nothing can be contaminated; keep the schema
      return corpus.select(col(idCol), lit(0L).as("n_shared")).limit(0)
    }
    val sketch = lit(sketchRow.getAs[Array[Byte]](0))
    gramRelation(corpus, textCol, n, Seq(col(idCol)))
      .filter(call_function("graft_might_contain", sketch,
        xxhash64(col("gram_h"))))
      .join(benchGrams, Seq("gram_h"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("gram_h")).as("n_shared"))
  }

  /** SPAN-LEVEL decontamination: instead of dropping whole contaminated
    * documents (the [[contaminatedDocs]] / q63 policy — wasteful when one
    * boilerplate quote poisons an otherwise-good document), cut ONLY the
    * tokens lying inside an n-gram run shared with the benchmark set, and
    * reassemble the rest. A token is removed iff it is covered by any
    * matching n-token window; the union of matching windows equals the
    * union of MAXIMAL shared spans (see [[Dedup.maximalSpans]] — every
    * maximal run of length M >= n is exactly the union of its M-n+1 seed
    * windows), so this is maximal-span surgery without needing the island
    * merge.
    *
    * Scale shape: both gram relations are row-local; the only shuffle is
    * the (tiny) benchmark gram set's equi-join against the corpus gram
    * stream — Catalyst broadcasts the bench side — plus one groupBy on
    * doc id for reassembly. Documents whose every token is covered (pure
    * benchmark copies) vanish from the output, the [[Dedup.spanDedup]]
    * convention.
    *
    * Output: (idCol, clean_text, n_kept, n_removed) for every corpus doc
    * with at least one surviving token.
    */
  def spanDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def seeds(df: DataFrame): DataFrame =
      df.select(col(idCol), Dedup.tokens(col(textCol)).as("_toks"))
        .filter(size(col("_toks")) >= n)
        .select(col(idCol), posexplode(transform(
          sequence(lit(0), size(col("_toks")) - n),
          i => md5(array_join(slice(col("_toks"), i + 1, lit(n)), " "))))
          .as(Seq("spos", "wh")))
    val benchGrams = seeds(bench).select(col("wh")).distinct()
    val covered = seeds(corpus).join(benchGrams, Seq("wh"))
      .select(col(idCol),
        explode(sequence(col("spos"), col("spos") + n - 1)).as("pos"))
      .distinct()
    val toks = corpus.select(col(idCol),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "tok")))
    val totals = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("_n_total"))
    toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(totals, Seq(idCol))
      .select(col(idCol), col("clean_text"), col("n_kept"),
        (col("_n_total") - col("n_kept")).as("n_removed"))
  }

  /** Sequence packing, the deterministic distributed form: within each
    * group (ordered by `orderCol`), bin = floor(exclusive-running-sum of
    * sizes / capacity). Every bin except possibly the last reaches at
    * least `capacity` before closing, and overflows by at most one item —
    * the standard streaming-pack bound. One keyed window; the groupBy that
    * usually follows reuses the same exchange.
    */
  def packBins(df: DataFrame, groupCols: Seq[Column], orderCol: Column,
      sizeCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_prior", coalesce(sum(sizeCol).over(w), lit(0L)))
      .withColumn("bin", floor(col("_prior") / capacity).cast("int"))
      .drop("_prior")
  }

  /** Vocabulary: global token frequencies, deterministic top-k
    * (count desc, token asc). Partial-aggregated map-side; the exchange
    * carries one row per distinct token, then TakeOrderedAndProject.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Dataset profile: per-column null count, distinct count, min/max (as
    * strings, type-agnostic) — the QA pass before training shards ship.
    * ONE scan, one reduce: all columns aggregate in a single `agg`, then
    * `stack` unpivots to a (col_name, stats...) row per column driver-free.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"profile columns must be distinct, got $cols")
    // df(c) resolves exact column names (a bare col("a.b") would parse as
    // struct-field access); aliases/literals are quoted so dotted or odd
    // names can't corrupt the generated stack() SQL
    val aggs = count(lit(1)).as("_n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        // count(_n) - count(c), not sum(when(isNull)): over ZERO rows sum
        // is NULL while the count form gives 0 — the oracle's semantics
        (count(lit(1)) - count(df(c))).as(s"_nulls_$i"),
        count_distinct(df(c)).as(s"_dist_$i"),
        min(df(c)).cast("string").as(s"_min_$i"),
        max(df(c)).cast("string").as(s"_max_$i"))
    }
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'${c.replace("'", "''")}', _n, _nulls_$i, _dist_$i, _min_$i, _max_$i"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
  }

  /** Balanced resampling: upsample under-represented groups toward the
    * largest one by an integral repetition factor (floor(max/n), capped) —
    * the deterministic form of language-balancing a training mix. Emits
    * each row `rep` times with rep_idx 1..rep; factors derive from group
    * counts alone, so the expansion is stable across partitionings. The
    * count aggregate is one narrow shuffle; the explode is row-local.
    */
  def balancedRepeat(df: DataFrame, groupCol: String, maxRep: Int): DataFrame = {
    require(maxRep >= 1, s"maxRep must be >= 1, got $maxRep")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    // global max via broadcast cross join, not an empty-partition window
    // (which would funnel rows through one task)
    val factors = counts
      .crossJoin(broadcast(counts.agg(max(col("_n")).as("_max_n"))))
      .withColumn("rep", least(lit(maxRep.toLong),
        greatest(lit(1L), floor(col("_max_n") / col("_n")))))
      .select(col(groupCol), col("rep"))
    // LEFT join + coalesce: a NULL group key never equi-joins, and a
    // balancer's contract is to repeat rows, never delete them — NULL-keyed
    // rows keep rep=1. No forced broadcast: factors has one row per
    // DISTINCT group, which is small for languages but can be huge for
    // e.g. domains — let Catalyst pick from actual size.
    df.join(factors, Seq(groupCol), "left")
      .withColumn("rep_idx",
        explode(sequence(lit(1L), coalesce(col("rep"), lit(1L)))))
      .drop("rep")
  }

  /** Temperature-scaled mixture weights at τ = 2 (the multilingual-LM
    * sampling recipe, weight ∝ n^(1/τ)): per group, token count and its
    * sampling weight RELATIVE TO THE LARGEST group —
    * sqrt(n) / sqrt(max n). τ is fixed at 2 because sqrt is correctly
    * rounded per IEEE 754 (identical in every engine), while pow(x, 1/τ)
    * for general τ goes through exp/log and drifts by ulps across libm
    * implementations — the same no-transcendentals rule as the
    * TextAnalysis statistics. Normalizing by the max instead of the sum
    * keeps the result a pure function of two exact-rounded sqrts (a float
    * SUM of weights would be order-dependent). One narrow group-count
    * shuffle; the max scalar is a broadcast cross join.
    */
  def mixtureWeights(df: DataFrame, groupCol: String, tokCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(col(tokCol)).cast("long")), lit(0L)).as("n_tokens"))
    val mx = per.agg(max(col("n_tokens")).as("_max_tokens"))
    per.crossJoin(broadcast(mx))
      .select(col(groupCol), col("n_docs").cast("long").as("n_docs"),
        col("n_tokens"),
        round(sqrt(col("n_tokens")) / sqrt(col("_max_tokens")), 6)
          .as("rel_weight"))
  }

  /** Robust per-group outlier detection via the median/MAD rule — the
    * numeric-field quality filter of a curation pipeline (trim corrupted
    * prices/durations before training-statistics are computed), done in
    * EXACT integer arithmetic so no float threshold can drift between
    * engines or cluster sizes.
    *
    * `cents` must be an integral-valued column (scale fixed-point values
    * up front, e.g. `round(price*100).cast("long")`). Interpolated medians
    * over integers are always midpoints, so DOUBLED medians are exactly
    * integral: with m2 = 2*median(x) and d2 = |2x - m2| (= 2*|x - median|),
    * MAD satisfies m4 = 2*median(d2) = 4*MAD. The outlier rule
    * |x - median| > k*MAD is evaluated as the BIGINT comparison
    * 2*d2 > k*m4 — zero floating-point anywhere past the exact-cast
    * percentiles.
    *
    * Scale shape: two grouped exact-percentile aggregates and two
    * broadcast joins of the tiny per-group stats back onto the rows; the
    * row relation is scanned, never windowed or sorted globally.
    */
  def madOutliers(df: DataFrame, groupCol: Column, cents: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(groupCol.as("grp"), cents.as("_c"))
    val med = base.groupBy(col("grp"))
      .agg((expr("percentile(_c, 0.5)") * 2).cast("long").as("med2"))
    val dev = base.join(broadcast(med), Seq("grp"))
      .withColumn("_d2", abs(col("_c") * 2 - col("med2")))
    val mad = dev.groupBy(col("grp"))
      .agg((expr("percentile(_d2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), Seq("grp"))
      .groupBy(col("grp"), col("med2"), col("mad4"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_d2") * 2 > col("mad4") * k, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("grp"), col("n_rows"), col("n_outliers"),
        col("med2"), col("mad4"))
  }

  /** Concat-and-chunk SEQUENCE PACKING — the standard pretraining data
    * layout (GPT-style): documents are deterministically shuffled
    * (md5-salted order), laid end-to-end on one global token tape, and
    * cut into fixed `seqLen` training sequences. Emits one row per
    * (sequence, document) span: `seq_id`, `doc_id`, `offset_in_seq`
    * (where in the sequence the doc's tokens start) and `tokens_in_seq`
    * — exactly the manifest a dataloader needs to build attention-mask
    * boundaries, and the complement of [[packBins]] (which packs WHOLE
    * docs first-fit; this one splits docs across sequence boundaries so
    * zero padding exists anywhere).
    *
    * Determinism: the tape order is md5(salt|id) (unique — the id rides
    * in the key), and the tape positions come from the exclusive prefix
    * sum, so every span is a pure function of the corpus — any engine,
    * any partitioning, same manifest (the q62 reproducibility story
    * applied to the training-batch layout itself).
    *
    * Scale shape: one [[EventTime.globalRunningSum]] segmented scan
    * (range exchange + two local passes, P partition totals through the
    * driver — never a single-partition window), then everything is
    * row-local: doc_id recovery by splitting the order key, span math,
    * and a `sequence()` explode bounded by ceil(n_tokens/seqLen) + 1
    * rows per doc. No joins at all.
    *
    * INCREMENTAL maintenance (`tapeOffset`): packing is a prefix-sum,
    * so it is incremental exactly when new docs append at the tape's
    * END — pass the previous corpus's total token count and only the
    * delta is packed (O(|delta|)), its first spans topping up the last
    * partially-filled sequence; the old manifest is never touched.
    * q211 proves delta-built == full-rebuild by hash match (the
    * q112/q135/q142 incremental pattern applied to the training-batch
    * layout).
    */
  def packSequences(df: DataFrame, idCol: String, tokCol: Column,
      seqLen: Long, salt: String, tapeOffset: Long = 0L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(tapeOffset >= 0, s"tapeOffset must be >= 0, got $tapeOffset")
    val base = df
      .select(col(idCol).cast("long").as("_id"), tokCol.cast("long").as("_n"))
      .filter(col("_n") > 0)
      .select(concat(md5(concat(lit(s"$salt|"), col("_id").cast("string"))),
        lit("|"), col("_id").cast("string")).as("ord"), col("_n").as("toks"))
    spansOnTape(
      EventTime.globalRunningSum(base, "ord", "toks")
        .select(
          split(col("ord"), "\\|").getItem(1).cast("long").as("doc_id"),
          (col("running_sum") + tapeOffset - col("toks")).as("tape_start"),
          (col("running_sum") + tapeOffset).as("tape_end")),
      seqLen)
  }

  /** The row-local span arithmetic of [[packSequences]]: a doc occupying
    * tape interval [tape_start, tape_end) becomes one manifest row per
    * `seqLen`-sized sequence it touches. Pure function of the interval —
    * shared by the builder and [[retractFromPack]] so the two can never
    * drift.
    */
  private def spansOnTape(docs: DataFrame, seqLen: Long): DataFrame =
    docs
      .select(col("doc_id"), col("tape_start"), col("tape_end"),
        explode(sequence(expr(s"tape_start div ${seqLen}L"),
          expr(s"(tape_end - 1) div ${seqLen}L"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        greatest(col("tape_start") - col("seq_id") * seqLen, lit(0L))
          .as("offset_in_seq"),
        (least(col("tape_end"), (col("seq_id") + 1) * seqLen) -
          greatest(col("tape_start"), col("seq_id") * seqLen))
          .as("tokens_in_seq"))

  /** RETRACTION for the packed training tape — the last persisted surface
    * that was maintenance-one-way (round-9 verdict #2): a takedown doc's
    * tokens sat inside packed sequences with no remedy short of a full
    * repack, and the tape is the artifact that actually feeds training.
    *
    * Packing is a prefix sum over the md5 tape order, and deleting docs
    * does not reorder the survivors — it only shifts every later doc LEFT
    * by the deleted token mass before it. So the repack is incremental in
    * the takedown:
    *
    *   1. per-doc tape intervals are recovered FROM the manifest itself
    *      (toks = Σ tokens_in_seq; tape_start = min over the doc's rows of
    *      seq_id·seqLen + offset_in_seq — exact, because the first span's
    *      offset is the start and later spans only grow that expression);
    *   2. docs starting before the FIRST deleted doc's tape position keep
    *      their manifest rows verbatim (their intervals are untouched by
    *      construction);
    *   3. each later surviving doc shifts left by the deleted token mass
    *      strictly before it (a broadcast non-equi join against the
    *      takedown set — O(|suffix| × |takedown|) map-side comparisons,
    *      no shuffle of the corpus), and its spans are recut by the same
    *      [[spansOnTape]] arithmetic the builder uses.
    *
    * Result == `packSequences` over (corpus ∖ deleted), bit for bit (the
    * q260 hash proof; `GraftProperties` fuzzes it), with work ∝ the
    * affected suffix + |takedown|, never the full tape. Deleting ids
    * absent from the manifest retracts nothing (idempotent).
    *
    * Scale shape: one groupBy(doc_id) over the manifest (the only
    * shuffle), the O(|takedown|) interval table broadcast twice (the
    * scalar `min` and the shift join), then row-local span math. At
    * 100 TB the manifest groupBy partial-aggregates (a doc's rows are
    * few), and the untouched-prefix rows pass through as a filter —
    * a plan that reads the manifest twice but never re-reads the corpus.
    */
  def retractFromPack(manifest: DataFrame, deletedIds: DataFrame,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val docs = manifest.groupBy(col("doc_id"))
      .agg(sum(col("tokens_in_seq")).as("toks"),
        min(col("seq_id") * seqLen + col("offset_in_seq")).as("tape_start"))
    val del = broadcast(docs.join(
      deletedIds.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("tape_start").as("del_start"), col("toks").as("del_toks")))
    // the first deleted tape position splits prefix (verbatim) from
    // suffix (shifted); an empty takedown leaves firstDel at +inf and the
    // whole manifest in the prefix
    val firstDel = del.agg(coalesce(min(col("del_start")),
      lit(Long.MaxValue)).as("first_del"))
    val kept = docs.join(deletedIds.select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val prefixDocs = kept.crossJoin(broadcast(firstDel))
      .filter(col("tape_start") < col("first_del"))
      .select(col("doc_id"))
    val untouched = manifest.join(prefixDocs, Seq("doc_id"), "left_semi")
      .select(col("seq_id"), col("doc_id"), col("offset_in_seq"),
        col("tokens_in_seq"))
    val shifted = kept.crossJoin(broadcast(firstDel))
      .filter(col("tape_start") >= col("first_del"))
      .join(del, col("del_start") < col("tape_start"), "left")
      .groupBy(col("doc_id"), col("toks"), col("tape_start"))
      .agg(coalesce(sum(col("del_toks")), lit(0L)).as("shift"))
      .select(col("doc_id"),
        (col("tape_start") - col("shift")).as("tape_start"),
        (col("tape_start") - col("shift") + col("toks")).as("tape_end"))
    untouched.unionByName(spansOnTape(shifted, seqLen))
  }

  /** Execute a [[largestRemainderQuota]] apportionment: per group, the
    * first `quota_g` rows of the deterministic md5(salt|id) order are
    * selected — so exactly `seats` rows come back overall (when every
    * group holds at least its quota) and the realized sample is a pure
    * function of the data. The selection rank is a per-GROUP window
    * (keyed exchange); quotas are O(groups) rows and broadcast.
    */
  def quotaSample(df: DataFrame, groupCol: Column, idCol: String,
      seats: Long, salt: String): DataFrame = {
    val quotas = largestRemainderQuota(df, groupCol, lit(1L), seats)
      .select(col("group"), col("quota"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("_ord"), col("_id"))
    df.select(groupCol.as("group"), col(idCol).cast("long").as("_id"))
      .withColumn("_ord",
        md5(concat(lit(s"$salt|"), col("_id").cast("string"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("group"))
      .filter(col("rnk") <= col("quota"))
      .select(col("group"), col("_id").as(idCol), col("rnk"), col("quota"))
  }

  /** Largest-remainder (Hamilton) apportionment: split an integer budget
    * of `seats` (sampling slots, token quota, shard count) across groups
    * proportionally to an integer weight, EXACTLY — Σ quota == seats
    * always, each quota is within 1 of the real-valued ideal share, and
    * everything is BIGINT arithmetic (`seats·w div W` floors + the
    * largest fractional remainders each get one of the leftover seats,
    * remainder ties broken toward the smaller group key). This is the
    * integer-quota companion to [[mixtureWeights]]: weights say WHAT
    * proportion, this says exactly HOW MANY — the knob a mixture sampler
    * actually executes.
    *
    * Scale shape: one partial-aggregated shuffle over the rows builds the
    * per-group weights; everything after operates on O(groups) rows — the
    * two 1-row scalars broadcast, and the remainder-rank window is a
    * single-partition sort of the GROUP table, not the data (groups are a
    * categorical dimension: sources, languages, shards).
    *
    * Overflow headroom: seats·w_g must fit BIGINT — exact while
    * seats·W < 9.2e18 (e.g. a 1e9-token budget over a 1e9-token corpus
    * needs the weights rescaled; divide both first, proportions survive).
    */
  def largestRemainderQuota(df: DataFrame, groupCol: Column,
      weightCol: Column, seats: Long): DataFrame = {
    require(seats > 0, s"seats must be positive, got $seats")
    val per = df.groupBy(groupCol.as("group"))
      .agg(sum(weightCol.cast("long")).as("weight"))
    val tot = per.agg(sum(col("weight")).as("_w_total"))
    val based = per.crossJoin(broadcast(tot))
      .select(col("group"), col("weight"),
        expr(s"(${seats}L * weight) div _w_total").as("base"),
        expr(s"(${seats}L * weight) % _w_total").as("rem"))
    val leftover = based.agg((lit(seats) - sum(col("base"))).as("_extra"))
    val rnk = Window.orderBy(col("rem").desc, col("group").asc)
    based.crossJoin(broadcast(leftover))
      .withColumn("_r", row_number().over(rnk))
      .select(col("group"), col("weight"), col("base"),
        (col("base") + when(col("_r") <= col("_extra"), 1L).otherwise(0L))
          .as("quota"))
  }

  /** Sliding-window document chunking with overlap — the RAG/embedding
    * prep step: each document becomes chunks of `size` characters whose
    * starts step by `stride` (< size ⇒ consecutive chunks overlap by
    * `size − stride`, so no sentence straddling a boundary is lost to
    * BOTH chunks). Start offsets are `0, stride, …, K·stride` with
    * `K = ⌈(len − size)/stride⌉` for len > size (else 0), chosen so the
    * LAST chunk always covers the tail `[len − size, len)`: coverage is
    * total, and only the final chunk may run short.
    *
    * Chunk identity is (doc_id, chunk_idx) plus the 1-based `pos`, so
    * downstream embedding/dedup joins back to the exact source span
    * without re-deriving offsets. Row-local throughout —
    * `explode(sequence(...))` then `substring` — no shuffle, no UDF;
    * scales as a pure map over the corpus.
    */
  def overlapChunks(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    docs
      .select(col(idCol), col(textCol).as("_text"))
      .withColumn("_len", length(col("_text")).cast("long"))
      .withColumn("_k",
        when(col("_len") > size,
          expr(s"(_len - $size + $stride - 1) div $stride"))
          .otherwise(0L))
      .select(col(idCol), col("_text"),
        explode(sequence(lit(0L), col("_k"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride + 1).as("pos"),
        expr(s"substring(_text, chunk_idx * $stride + 1, $size)")
          .as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** DSIR-style data selection via hashed-n-gram importance weights (Xie
    * et al. 2023, arXiv:2302.03169): score every document by how much its
    * hashed BIGRAM features look like the `target` slice relative to the
    * raw corpus, so a top-quota selection shifts the mixture toward the
    * target domain without a trained classifier. DSIR's weight is the
    * log-likelihood ratio `Σ_f c_f·(log p_tgt(f) − log p_raw(f))`; logs
    * are irrational, so this is the engine's exact-integer analogue —
    * the length-normalized mean RATE RATIO: per feature,
    * `ratio_ppm = (tc·10⁹ div TT)·10⁶ div (rc·10⁹ div RT)` (target rate
    * over raw rate, both in parts-per-billion first so neither side
    * multiplies two corpus-scale counts), and per document
    * `score_ppm = Σ ratio_ppm(f_i) div n_feat` — 10⁶ means "looks
    * exactly as target-like as the average raw token", higher means
    * target-shifted. Monotone in the same direction as DSIR's ratio on
    * every feature, and bit-stable across engines/partitionings, which
    * the log form is not.
    *
    * Features a document shares with NO target doc contribute 0 — raw
    * unsmoothed rates (DSIR smooths because it exponentiates; a mean of
    * ratios needs no smoothing to stay finite). Buckets so rare that
    * `rc·10⁹ < RT` (raw rate rounds to 0 ppb) yield NULL ratios and are
    * dropped defensively — unreachable while `buckets ≪ 10⁹` because
    * hashing makes every nonempty bucket carry ≥ RT/10⁹ mass long
    * before corpora reach that size.
    *
    * Scale shape: bigram instances are row-local (`transform` over the
    * token array); the feature table is two keyed aggregates down to
    * `buckets` rows; scoring joins instances to that BROADCAST table and
    * aggregates per doc — one doc-keyed shuffle, nothing wider.
    * Overflow: `tc·10⁹` caps a bucket's target count at ~9·10⁹
    * instances; with 2⁷–2¹⁰ buckets that is a multi-trillion-token
    * corpus per selection group.
    *
    * @param docs   tokenized documents
    * @param target boolean column over `docs`: the domain to upweight
    * @return (idCol, n_feat, score_ppm), one row per doc with ≥ 1 bigram
    */
  def dsirImportance(docs: DataFrame, idCol: String, tokCol: String,
      target: Column, buckets: Int): DataFrame =
    dsirImportanceFrom(docs, idCol, tokCol, buckets,
      dsirRates(docs, idCol, tokCol, target, buckets))

  /** Hashed-bigram feature instances: one row per bigram occurrence with
    * its bucket — the shared front half of [[dsirRates]] and
    * [[dsirImportanceFrom]].
    */
  private def dsirInstances(docs: DataFrame, idCol: String, tokCol: String,
      target: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    docs
      .select(col(idCol), target.as("_tgt"), col(tokCol).as("_tok"))
      .filter(size(col("_tok")) >= 2)
      .select(col(idCol), col("_tgt"),
        explode(transform(sequence(lit(0), size(col("_tok")) - 2),
          i => concat_ws(" ", col("_tok")(i), col("_tok")(i + 1))))
          .as("_bg"))
      .select(col(idCol), col("_tgt"),
        (conv(substring(md5(col("_bg")), 1, 8), 16, 10).cast("long")
          % buckets).as("bucket"))
  }

  /** The DSIR feature-count table: per bucket, raw occurrences `rc` and
    * target-slice occurrences `tc`. PURELY ADDITIVE — counts from
    * disjoint corpus slices combine by [[dsirCombineRates]] into exactly
    * the full-corpus table, which is what makes the ratio table a
    * maintainable artifact (ingest a batch = fold its rates in; retract
    * = subtract them) rather than a per-run rescan. Proven delta==rebuild
    * by q285's hash match.
    */
  def dsirRates(docs: DataFrame, idCol: String, tokCol: String,
      target: Column, buckets: Int): DataFrame =
    dsirInstances(docs, idCol, tokCol, target, buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("tc"))

  /** Fold two bucket-count tables (the maintenance combine — addition,
    * so append order never matters and retraction is the same fold with
    * negated counts).
    */
  def dsirCombineRates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket"))
      .agg(sum(col("rc")).as("rc"), sum(col("tc")).as("tc"))
      .filter(col("rc") > 0)

  /** Score documents against a (possibly maintained) rates table — the
    * serve half of [[dsirImportance]].
    */
  def dsirImportanceFrom(docs: DataFrame, idCol: String, tokCol: String,
      buckets: Int, rates: DataFrame): DataFrame = {
    // an empty target slice (tt = 0) would make tr_ppb NULL everywhere
    // and every score silently NULL — fail loud like the other guards
    val totals = rates.agg(sum(col("rc")).as("rt"), sum(col("tc")).as("tt"))
    val Array(tgtTotal) = totals.select(col("tt")).collect().map(r =>
      if (r.isNullAt(0)) 0L else r.getLong(0))
    require(tgtTotal > 0,
      s"dsirImportanceFrom: rates table has an empty target slice (tt=$tgtTotal)")
    val ratio = rates.crossJoin(broadcast(totals))
      .withColumn("rr_ppb", expr("rc * 1000000000 div rt"))
      .withColumn("tr_ppb", expr("tc * 1000000000 div tt"))
      .filter(col("rr_ppb") > 0)
      .select(col("bucket"), expr("tr_ppb * 1000000 div rr_ppb").as("ratio_ppm"))
    dsirInstances(docs, idCol, tokCol, lit(false), buckets)
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"), sum(col("ratio_ppm")).as("_s"))
      .select(col(idCol), col("n_feat"),
        expr("_s div n_feat").as("score_ppm"))
  }

  /** MAX-MIN FAIR budget allocation across groups — WATER-FILLING
    * (Bertsekas & Gallager 1992 §6.5.2): cap every group's allocation at
    * the common level L where `Σ min(supply_i, L) = budget`, so small
    * suppliers keep everything and the budget shortfall is borne
    * entirely by the largest suppliers — the mixture-balancing rule when
    * proportional quotas (q77/q272) would let one giant source crowd out
    * the tail. Exact integers: sort supplies ascending; the level group
    * starts at the FIRST row where `(budget − cum_before) div m < s_i`
    * (m = this row and everything after); rows before it keep their full
    * supply, rows from it on get `L = (budget − cum_before) div m`, and
    * the integer remainder `budget − Σ alloc` (< m) is REPORTED, not
    * silently smeared — distributing it would break the "pure function
    * of (supply multiset, budget)" determinism contract.
    *
    * Scale shape: one group aggregate, one global-sort window over the
    * GROUP table (sources/languages — dozens of rows, never the data),
    * one broadcast of the 1-row level frame.
    *
    * @return one row per group: (groupCol, supply, alloc) plus the
    *         global `level` (NULL when the budget covers every supply —
    *         no cap binds) and `remainder`
    */
  def waterFill(supplies: DataFrame, groupCol: String, supplyCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = Window.orderBy(col("supply").asc, col(groupCol).asc)
    val ranked = supplies
      .select(col(groupCol), col(supplyCol).cast("long").as("supply"))
      .withColumn("idx", row_number().over(w))
      .withColumn("cum_before",
        coalesce(sum(col("supply")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("m", col("n") - col("idx") + 1)
      .withColumn("l_here",
        expr(s"($budget - cum_before) div m"))
    val levelRow = ranked.filter(col("l_here") < col("supply"))
      .orderBy(col("idx").asc).limit(1)
      .select(col("idx").as("level_idx"), col("l_here").as("level"))
    // the sentinel row only wins the limit(1) when no cap binds: the
    // orderBy makes the pick deterministic (a bare union+limit is not)
    val out = ranked.crossJoin(broadcast(
        levelRow.unionByName(
          ranked.sparkSession.range(1).select(
            lit(Long.MaxValue).as("level_idx"),
            lit(null).cast("long").as("level")))
          .orderBy(col("level_idx").asc).limit(1)))
      .withColumn("alloc",
        when(col("idx") < col("level_idx"), col("supply"))
          .otherwise(coalesce(col("level"), col("supply"))))
    val rem = out.agg((lit(budget) - sum(col("alloc"))).as("remainder"))
    out.crossJoin(broadcast(rem))
      .select(col(groupCol), col("supply"), col("alloc"), col("level"),
        col("remainder"))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment (Thaler &
    * Ravishankar 1998): a key lands on the shard with the largest
    * `md5(shard|key)` — the shard-planning rule whose REBALANCE story is
    * provable, not probabilistic folklore: adding a shard can only STEAL
    * keys (a new maximum appears), never move a key between surviving
    * shards (their hashes didn't change), so a K→K+1 expansion moves
    * exactly the keys whose new hash wins — ~1/(K+1) of them — and
    * nothing else. The transition matrix of q286 proves the "nothing
    * else" exactly, and is why this beats mod-K sharding (where a +1
    * reshuffles almost everything).
    *
    * Row-local: the argmax rides an array_max over a K-element struct
    * array (md5 first — struct ordering does the argmax); no shuffle, no
    * state, deterministic across engines.
    */
  def rendezvousShard(df: DataFrame, idCol: String,
      shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      s"shards must be non-empty and distinct, got $shards")
    val hs = shards.map(sh => struct(
      md5(concat(lit(sh + "|"), col(idCol).cast("string"))).as("h"),
      lit(sh).as("s")))
    df.withColumn("shard", array_max(array(hs: _*)).getField("s"))
  }
}
