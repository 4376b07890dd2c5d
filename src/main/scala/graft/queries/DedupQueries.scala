package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Deduplication queries (the training-data-pipeline extension suite) over
  * the `documents` table: exact, MinHash+LSH, n-gram Jaccard, SimHash.
  * Every hash is md5-derived so the DuckDB oracles reproduce the exact same
  * signatures, bands, and pair sets.
  */
object DedupQueries {

  private def shingled(s: SparkSession, d: String): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("tok"), 3).as("shingles"))
  }

  private def minhashed(s: SparkSession, d: String): DataFrame =
    shingled(s, d).select(col("doc_id"),
      Dedup.minhashSignature(col("shingles"), 8).as("sig"))

  private def simhashed(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // simhash uses graft_simhash60
    Tables.documents(s, d)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tok"))
      .select(col("doc_id"), Dedup.simhash(col("tok")).as("simhash"))
  }

  /** Shared DuckDB CTE fragments mirroring the Spark lineage above. */
  private val ShCte =
    """WITH sh AS (
      |  SELECT doc_id,
      |         [array_to_string(tok[(i+1):(i+3)], ' ')
      |          FOR i IN range(0, greatest(len(tok)-2, 0))] AS shingles
      |  FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tok
      |        FROM documents)
      |  WHERE len(tok) >= 3
      |)""".stripMargin

  private val MhCte =
    s"""$ShCte, mh AS (
       |  SELECT doc_id,
       |         [list_min(list_transform(shingles, s -> md5(k || '|' || s)))
       |          FOR k IN range(0, 8)] AS sig
       |  FROM sh
       |)""".stripMargin

  private val SimCte =
    """WITH sim AS (
      |  SELECT doc_id,
      |    CAST(list_sum([CASE WHEN list_sum(list_transform(hs, x -> ((x >> j) & 1)*2 - 1)) > 0
      |              THEN (1::BIGINT << j) ELSE 0 END FOR j IN range(0, 60)]) AS BIGINT) AS simhash
      |  FROM (SELECT doc_id,
      |          list_transform(list_distinct(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')),
      |            s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
      |        FROM documents)
      |)""".stripMargin

  /** q52/q165's shared pair graph: LSH candidates verified at Jaccard ≥
    * 0.5. Cached because the band table feeds both sides of the candidate
    * self-join.
    */
  private def verifiedPairs(s: SparkSession, d: String): DataFrame = {
    val m = minhashed(s, d)
      .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
    val cand = Dedup.candidatePairs(m, "doc_id", "bands")
    val sh = shingled(s, d).cache()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-corpus duplicate 5-gram share per doc (the RefinedWeb "how
    // much of this doc exists elsewhere" grade): distinct-gram set
    // semantics, md5 shuffle keys, exact ppm. The SCORING knob between
    // "keep" and "takedown" — q88's span dedup rewrites, this measures.
    "q280_dup_gram_share" -> ((s, d) =>
      Dedup.crossDocGramShare(
        Tables.documents(s, d)
          .select(col("doc_id"), Dedup.tokens(col("text")).as("tok")),
        "doc_id", "tok", n = 5)),

    // MinHash ESTIMATOR CALIBRATION: for every q24 LSH candidate pair,
    // the signature-agreement estimate (matches/8 in ppm) against the
    // exact shingle Jaccard (inter*1e6 div union) — how honest is the
    // sketch the dedup pipeline trusts? abs_err_ppm is the per-pair
    // answer; the 8-hash quantization (multiples of 125000) is visible
    // by construction.
    "q288_minhash_calibration" -> ((s, d) => {
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
      val cand = Dedup.candidatePairs(m, "doc_id", "bands")
      val sig = m.select(col("doc_id"), col("sig"))
      val sh = shingled(s, d)
      cand
        .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
          Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
          Seq("doc_b"))
        .join(sh.select(col("doc_id").as("doc_a"),
          col("shingles").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"),
          col("shingles").as("sh_b")), Seq("doc_b"))
        .withColumn("n_match",
          expr("size(filter(arrays_zip(sig_a, sig_b), p -> p.sig_a = p.sig_b))")
            .cast("long"))
        .withColumn("inter",
          size(array_intersect(array_distinct(col("sh_a")),
            array_distinct(col("sh_b")))).cast("long"))
        .withColumn("uni",
          size(array_distinct(col("sh_a"))).cast("long")
            + size(array_distinct(col("sh_b"))).cast("long") - col("inter"))
        .select(col("doc_a"), col("doc_b"), col("n_match"),
          (col("n_match") * 125000L).as("est_ppm"),
          expr("inter * 1000000 div uni").as("exact_ppm"),
          abs(col("n_match") * 125000L - expr("inter * 1000000 div uni"))
            .as("abs_err_ppm"))
    }),

    // SimHash CALIBRATION (q288's discipline for the OTHER sketch): for
    // every band candidate within hamming <= 8, the bit-agreement
    // estimate (60-h)/60 in ppm against the exact distinct-token
    // Jaccard. The two sketches now carry the same honesty audit —
    // MinHash estimates Jaccard directly, SimHash's agreement tracks
    // the cosine angle, and the bias between the columns is visible.
    "q296_simhash_calibration" -> ((s, d) => {
      val sim = simhashed(s, d)
        .withColumn("bands", Dedup.simhashBands(col("simhash"))).cache()
      val cand = Dedup.candidatePairs(sim, "doc_id", "bands")
      val tok = Tables.documents(s, d).select(col("doc_id"),
        array_distinct(Dedup.tokens(col("text"))).as("ts"))
      cand
        .join(sim.select(col("doc_id").as("doc_a"),
          col("simhash").as("sim_a")), Seq("doc_a"))
        .join(sim.select(col("doc_id").as("doc_b"),
          col("simhash").as("sim_b")), Seq("doc_b"))
        .withColumn("hamming", Dedup.hamming(col("sim_a"), col("sim_b"))
          .cast("long"))
        .filter(col("hamming") <= 8)
        .join(tok.select(col("doc_id").as("doc_a"), col("ts").as("ts_a")),
          Seq("doc_a"))
        .join(tok.select(col("doc_id").as("doc_b"), col("ts").as("ts_b")),
          Seq("doc_b"))
        .withColumn("inter",
          size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
        .withColumn("uni",
          size(col("ts_a")).cast("long") + size(col("ts_b")).cast("long")
            - col("inter"))
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          expr("(60 - hamming) * 1000000 div 60").as("agree_ppm"),
          expr("inter * 1000000 div uni").as("jaccard_ppm"))
    }),

    // TRANSITIVITY audit of the near-dup clusters: how much of each
    // cluster's pair mass is DIRECT evidence (a verified Jaccard >= 0.5
    // pair) vs transitive closure? n_direct*1e6 div C(n,2) — 1e6 means
    // a verified clique (safe to collapse), a low value flags a
    // boilerplate CHAIN where the closure glued documents no verifier
    // ever compared — exactly the clusters a takedown/canonical policy
    // should treat with suspicion.
    "q297_cluster_transitivity" -> ((s, d) => {
      val pairs = verifiedPairs(s, d).cache()
      val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxIter = 50)
        .select(col("node").as("doc_id"), col("cluster_id"))
      val sizes = cc.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      val direct = pairs
        .join(cc.select(col("doc_id").as("doc_a"), col("cluster_id")),
          Seq("doc_a"))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_direct"))
      sizes.join(direct, Seq("cluster_id"))
        .withColumn("n_implied",
          expr("n_members * (n_members - 1) div 2"))
        .select(col("cluster_id"), col("n_members"), col("n_direct"),
          col("n_implied"),
          expr("n_direct * 1000000 div n_implied")
            .as("transitivity_ppm"))
    }),

    // FULL ExactSubstr dedup coverage (Lee et al. 2021 §4.1, the
    // any-alignment any-length semantics q88/q143's token-window family
    // approximates): per document, the positions whose 30-char
    // substring occurs >= 2 times ANYWHERE in the corpus (any doc, any
    // alignment, self-repeats included) and the char length of the
    // union of their [pos, pos+30) intervals — the exact text a
    // removal pass would cut. The Spark side builds it from the
    // DISTRIBUTED SUFFIX ORDERING (prefix doubling over (doc, pos)
    // keys — O(log 30) rounds of one keyed sort each — then the
    // sparse-table pair (rank_16(pos), rank_16(pos+14)) keys the exact
    // 30-char prefix); the oracle is the brute-force 30-gram
    // substring-join. Hash match proves the suffix machinery's
    // equal-prefix adjacency is EXACT, doc by doc, position by
    // position. suffixRanks itself is property-tested against an
    // in-memory suffix sort in GraftProperties.
    "q298_exact_substr_coverage" -> ((s, d) =>
      Dedup.exactSubstrCoverage(Tables.documents(s, d), "doc_id", "text",
          minLen = 30)
        .select(col("id").as("doc_id"), col("n_dup_starts"),
          col("covered_chars"))),

    // TOKEN-GRANULARITY ExactSubstr coverage (q312, round 12): the
    // suffix family's second documented escape EXECUTED — the same
    // prefix-doubling machinery with the TOKEN as the sequence unit
    // (~8x fewer rows per doubling sort than q298's char rows on this
    // corpus; measured next to q298 in the bench). Duplicated >= 5-token
    // runs at any token alignment, self-overlaps included; oracle =
    // the brute-force 5-token-gram join + the same islands fold in
    // token units. What it gives up vs q298 is byte exactness
    // (mid-token boundaries, whitespace variants) — documented, which
    // is why the char path remains the decontamination tool.
    "q312_token_substr_coverage" -> ((s, d) =>
      Dedup.exactSubstrCoverageTokens(
          Tables.documents(s, d)
            .select(col("doc_id"), Dedup.tokens(col("text")).as("tok")),
          "doc_id", "tok", minLen = 5)
        .select(col("id").as("doc_id"), col("n_dup_starts"),
          col("covered_tokens"))),

    // CHAR-LEVEL DECONTAMINATION (q304): q63's benchmark rule at
    // ExactSubstr semantics — every test-doc position whose 20-char
    // substring occurs ANYWHERE in the benchmark slice (doc_id % 97 ==
    // 0), at any alignment; token grids can't hide a contaminated span
    // from this one. Both corpora rank together in one prefix-doubling
    // pass; the benchmark key set broadcasts into a semi-join. Output:
    // per-test-doc contaminated coverage (interval union), brute-force
    // gram-join oracled.
    "q304_char_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.crossCorpusSubstrCoverage(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", minLen = 20)
        .select(col("id").as("doc_id"), col("n_hits"),
          col("contaminated_chars"))
    }),

    // THE SUFFIX ARRAY'S FLAGSHIP READ (q306): the corpus's longest
    // duplicated substrings with EXACT length and both locations —
    // adjacent-pair LCPs majorize all pair LCPs (min-over-range), so
    // the top-20 adjacent LCPs >= 20 are the global answer. LCP comes
    // from the rank-table descent (log maxlen batch joins, no
    // recursion); the oracle sorts raw suffixes, lags, and brute-forces
    // the common prefix on the (few) adjacent pairs sharing 20 chars.
    "q306_longest_dup_substrings" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.lcpAdjacentPairs(docs, "doc_id", "text", minLcp = 20)
        .join(docs.select(col("doc_id").as("id_a"), col("text")),
          Seq("id_a"))
        .withColumn("dup_text", expr("substring(text, pos_a + 1, lcp)"))
        .orderBy(col("lcp").desc, col("id_a").asc, col("pos_a").asc,
          col("id_b").asc, col("pos_b").asc)
        .limit(20)
        .select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b"),
          col("lcp"), col("dup_text"))
    }),

    // q298's ACTION (q303): the Lee et al. removal pass itself — every
    // duplicated >= 30-char interval is CUT from every document and the
    // kept text re-stitched from the island gaps (a bounded per-doc
    // interval list + row-local substring transform). Docs without
    // duplicated spans pass through verbatim. The oracle rebuilds each
    // document character-for-character from the brute-force gram marks,
    // so the hash match proves interval merging AND reconstruction,
    // byte by byte.
    "q303_exact_substr_remove" -> ((s, d) =>
      Dedup.exactSubstrRemove(Tables.documents(s, d), "doc_id", "text",
          minLen = 30)
        .select(col("id").as("doc_id"), col("clean_text"),
          col("removed_chars"))),

    // THE PREFILTER AS A MAINTAINED ARTIFACT (q314, round 12): q307's
    // duplicated-gram table gets the full q308 treatment — counts built
    // on the old corpus (%10 != 7), SAVED (g-bucketed shards), LOADED,
    // the delta batch's one-pass counts FOLDED in (the additive q285
    // algebra; the historical corpus is never rescanned), then the
    // prefilter served from the maintained table: per doc, the number
    // of gram positions whose 30-gram occurs >= 2 times corpus-wide.
    // The oracle rebuilds the counts from the FULL corpus with the same
    // md5-int gram hash, so the hash match proves save -> load -> delta
    // == rebuild through the served flag counts (collisions hash
    // identically on both engines).
    "q314_prefilter_maintained" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = Tables.artifactDir("gram_counts", d)
      Dedup.saveGramCounts(
        Dedup.dupGramCounts(docs.filter(col("doc_id") % 10 =!= 7),
          "doc_id", "text", 30), dir)
      val counts = Dedup.combineGramCounts(Dedup.loadGramCounts(s, dir),
        Dedup.dupGramCounts(docs.filter(col("doc_id") % 10 === 7),
          "doc_id", "text", 30))
      Dedup.dupGramStats(docs, "doc_id", "text", 30, counts)
        .select(col("id").as("doc_id"), col("n_dup_gram_positions"))
    }),

    // INCREMENTAL ExactSubstr removal (q315, round 13): q217's
    // daily-ingest discipline lifted to the suffix family. The old
    // corpus's gram POSTINGS (%10 != 7) are built, SAVED (g-bucketed
    // shards), LOADED, the batch's postings FOLDED in (additive algebra;
    // the historical corpus is never rescanned) — then the suffix
    // machinery runs only over the batch's duplication NEIGHBORHOOD:
    // the changed docs (batch + old docs posting on a batch-held
    // duplicated gram) and their witnesses. The oracle runs the FULL
    // q303 removal and restricts it to the same changed set, so the
    // hash match proves the incremental composition == the full rebuild
    // on every emitted row — through the persisted artifact.
    "q315_incremental_substr_remove" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val newIds = docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"))
      val dir = Tables.artifactDir("gram_postings", d)
      Dedup.saveGramPostings(
        Dedup.gramPostings(docs.filter(col("doc_id") % 10 =!= 7),
          "doc_id", "text", 30), dir)
      val full = Dedup.combineGramPostings(Dedup.loadGramPostings(s, dir),
        Dedup.gramPostings(docs.filter(col("doc_id") % 10 === 7),
          "doc_id", "text", 30))
      Dedup.exactSubstrRemoveIncremental(docs, "doc_id", "text", 30,
          full, newIds)
        .select(col("id").as("doc_id"), col("clean_text"),
          col("removed_chars"))
    }),

    // THE EXECUTED 100 TB ESCAPE for q303 (q307): the lossless gram
    // prefilter (one hash groupBy, no suffix machinery) flags every doc
    // that could carry a duplicated >= 30-char span — within-doc
    // self-repeats included — then the full suffix-ordering removal runs
    // on THAT SUB-CORPUS only, and unflagged docs pass through verbatim.
    // The prefilter's superset guarantee (every mark AND all its witness
    // occurrences live in flagged docs) makes the composition
    // SET-IDENTICAL to q303's full-corpus run, so q307 shares q303's
    // oracle: the hash match is the proof, and the runtime gap between
    // the two queries is the measured value of the escape (the suffix
    // rounds' input shrinks from the corpus to its duplication slice).
    "q307_prefiltered_substr_remove" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val flagged = Dedup.exactSubstrPrefilterIds(docs, "doc_id", "text",
        minLen = 30).select(col("id").as("doc_id"))
      val sub = docs.join(flagged, Seq("doc_id"), "left_semi")
      val rest = docs.join(flagged, Seq("doc_id"), "left_anti")
      Dedup.exactSubstrRemove(sub, "doc_id", "text", minLen = 30)
        .select(col("id").as("doc_id"), col("clean_text"),
          col("removed_chars"))
        .unionByName(rest.select(col("doc_id"),
          col("text").as("clean_text"), lit(0L).as("removed_chars")))
    }),

    // E1: exact dedup with deterministic canonical selection (min doc_id).
    "q22_dedup_exact" -> ((s, d) =>
      Dedup.exactDedup(
        Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("text_hash")),
        Seq(col("text_hash")), "doc_id")
        .select(col("doc_id"), col("text_hash"), col("canonical_id"),
          col("group_size"), col("is_canonical"))),

    // MinHash signature (row-local, zero shuffle).
    "q23_minhash_sig" -> ((s, d) => {
      val m = minhashed(s, d)
      m.select(col("doc_id") +:
        (0 until 8).map(k => element_at(col("sig"), k + 1).as(s"mh$k")): _*)
    }),

    // Precision/recall of the LSH CANDIDATE stage against the exact
    // Jaccard >= 0.5 truth — q145's measured-recall discipline as a
    // first-class oracled query. Truth comes from the prefix-filtered
    // EXACT join (q151's lossless AllPairs path — both sides scale-safe,
    // no brute force in the engine); predicted is q24's band-collision
    // set BEFORE verification. One row: the dedup-stage scorecard.
    "q234_dedup_eval" -> ((s, d) => {
      val sh = shingled(s, d).cache()
      val truth = Dedup.prefixFilteredPairs(sh, "doc_id", "shingles", 0.5)
        .select(col("doc_a"), col("doc_b"))
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2))
      val pred = Dedup.candidatePairs(m, "doc_id", "bands")
        .select(col("doc_a"), col("doc_b"))
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nP = pred.agg(count(lit(1)).as("n_pred"))
      val nH = pred.join(truth, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("n_hit"))
      nT.crossJoin(nP).crossJoin(nH)
        .select(col("n_truth"), col("n_pred"), col("n_hit"),
          when(col("n_pred") > 0, expr("n_hit * 1000000 div n_pred"))
            .otherwise(lit(0L)).as("precision_ppm"),
          when(col("n_truth") > 0, expr("n_hit * 1000000 div n_truth"))
            .otherwise(lit(0L)).as("recall_ppm"))
    }),

    // MinHash + LSH near-dup pairs (4 bands × 2 rows) with exact Jaccard
    // verification at threshold 0.5 — the scalable near-dup path.
    "q24_lsh_near_dup" -> ((s, d) => {
      // Signatures and shingles are each consumed by BOTH sides of a
      // self-join — materialize once (at 100 TB this is a persisted
      // signature table, not a recomputed lineage).
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
      val cand = Dedup.candidatePairs(m, "doc_id", "bands")
      val sh = shingled(s, d).cache()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
        .withColumn("jac", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jac"))
    }),

    // Asymmetric containment over the LSH candidate pairs: |A∩B|/|A| and
    // |A∩B|/|B| — catches a short doc quoted inside a long one, which
    // Jaccard structurally under-scores (union dominated by the long
    // side). Flagged when EITHER direction >= 0.5; rounded for the
    // cross-engine hash.
    "q150_containment" -> ((s, d) => {
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
      val cand = Dedup.candidatePairs(m, "doc_id", "bands")
      val sh = shingled(s, d).cache()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
        .withColumn("cont_ab", round(Dedup.containment(col("sh_a"), col("sh_b")), 6))
        .withColumn("cont_ba", round(Dedup.containment(col("sh_b"), col("sh_a")), 6))
        .filter(col("cont_ab") >= 0.5 || col("cont_ba") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("cont_ab"), col("cont_ba"))
    }),

    // Incremental dedup: docs ending in 7 are "today's batch", the rest
    // the already-deduped historical corpus. Candidates form only where a
    // NEW doc participates (new×new, new×old — never old×old), then exact
    // Jaccard verification as in q24. The oracle is q24's full self-join
    // restricted to new-involving pairs, so the hash match proves the
    // incremental join finds exactly the full recompute's new pairs.
    "q135_incremental_dedup" -> ((s, d) => {
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
      val cand = Dedup.incrementalCandidatePairs(
        m.filter(col("doc_id") % 10 =!= 7),
        m.filter(col("doc_id") % 10 === 7), "doc_id", "bands")
      val sh = shingled(s, d).cache()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
        .withColumn("jac", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jac"))
    }),

    // RETRACTION for the persisted signature table — q135's daily-ingest
    // shape with a takedown first: doc_id % 10 == 3 LEAVES the historical
    // signature table (broadcast anti-join; signatures are per-doc
    // row-local state, no cross-doc aggregate to repair), then today's
    // batch (% 10 == 7) joins the retracted table. Oracle = the full
    // recompute restricted to new-involving pairs with NO retracted side:
    // the hash match proves a takedown doc can never resurface as a
    // dedup candidate — the opt-out guarantee.
    "q249_dedup_retract" -> ((s, d) => {
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
      val hist = Dedup.retractIds(m.filter(col("doc_id") % 10 =!= 7),
        "doc_id", m.filter(col("doc_id") % 10 === 3).select("doc_id"))
      val cand = Dedup.incrementalCandidatePairs(hist,
        m.filter(col("doc_id") % 10 === 7), "doc_id", "bands")
      val sh = shingled(s, d).cache()
      cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
        .withColumn("jac", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jac") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jac"))
    }),

    // Brute-force n-gram Jaccard over a deterministic subset — the
    // exact-similarity reference the LSH path approximates. The subset is
    // pinned to an ABSOLUTE bound (doc_id < 5000, i.e. at most 200 docs /
    // 19.9k pairs) so the quadratic verification cost stays constant as the
    // corpus grows — a %-only filter would scale the subset with the data.
    "q25_ngram_jaccard" -> ((s, d) => {
      val sub = shingled(s, d)
        .filter(col("doc_id") % 25 === 0 && col("doc_id") < 5000)
      val a = sub.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
      val b = sub.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
      a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          Dedup.jaccard(col("sh_a"), col("sh_b")).as("jac"))
    }),

    // EXACT similarity self-join WITHOUT the n² scan: prefix filtering
    // (AllPairs/PPJoin family). Sets ordered by global shingle frequency;
    // only the first |x| - ceil(0.5|x|) + 1 (rarest) shingles of each doc
    // are indexed; candidates come from the prefix equi-join + size bound;
    // exact Jaccard verifies. The oracle is the BRUTE-FORCE all-pairs scan
    // over the whole corpus — the hash match PROVES the filter lossless
    // (same pairs, same scores), which is the property that lets the exact
    // path replace q25's quadratic scan at scale.
    "q151_prefix_join" -> ((s, d) =>
      Dedup.prefixFilteredPairs(shingled(s, d), "doc_id", "shingles", 0.5)),

    // EXACT containment join, the guaranteed version of q150: q150 scores
    // containment only on LSH candidate pairs (a short doc quoted in a
    // long one rarely minhash-collides — the union dominates the
    // signature, so exactly the interesting pairs get missed); here the
    // contained side indexes its rarest prefix slice, the container side
    // its full token set, and every pair with |A∩B|/|A| >= 0.7 is found.
    // Brute-force oracle over all ordered pairs proves losslessness.
    "q156_containment_join" -> ((s, d) =>
      Dedup.containmentJoin(shingled(s, d), "doc_id", "shingles", 0.7)),

    // WEIGHTED exact similarity join: IDF-weighted Jaccard >= 1/2 via the
    // weighted prefix filter — shared rare shingles count for more than
    // shared boilerplate, thresholds cross-multiplied BIGINT, oracle is
    // the brute-force relational formulation (losslessness proof).
    "q170_weighted_jaccard_join" -> ((s, d) =>
      Dedup.weightedPrefixFilteredPairs(shingled(s, d), "doc_id",
        "shingles", tNum = 1, tDen = 2)),

    // Near-dup CLUSTERS: connected components over the verified LSH pair
    // graph; canonical = min doc_id in the cluster.
    "q52_dedup_clusters" -> ((s, d) =>
      Dedup.connectedComponents(verifiedPairs(s, d), "doc_a", "doc_b",
          maxIter = 50)
        .select(col("node").as("doc_id"), col("cluster_id"),
          (col("node") === col("cluster_id")).as("is_canonical"))),

    // QUALITY-AWARE canonical selection: q52's near-dup clusters keep
    // their LONGEST-substantive member (whitespace-stripped length,
    // tie -> smaller doc_id) instead of the min-id — the "keep the best
    // copy, not the first copy" dedup policy real pipelines want once a
    // quality signal exists. One window over the cluster assignment.
    "q295_quality_canonical" -> ((s, d) => {
      val cc = Dedup.connectedComponents(verifiedPairs(s, d),
          "doc_a", "doc_b", maxIter = 50)
        .select(col("node").as("doc_id"), col("cluster_id"))
      val len = Tables.documents(s, d).select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s", ""))
          .cast("long").as("len_ns"))
      val j = cc.join(len, Seq("doc_id"))
        .withColumn("n_members", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster_id"))))
      graft.operators.Relational.topKPerGroup(j, Seq(col("cluster_id")),
          Seq(col("len_ns").desc, col("doc_id").asc), 1)
        .select(col("cluster_id"), col("doc_id").as("rep_doc_id"),
          col("n_members"), col("len_ns").as("rep_len_ns"))
    }),

    // The SAME clusters via alternating large-star/small-star contraction
    // (Kiveris et al. 2014): O(log n) rounds regardless of component
    // diameter, where q52's neighbor-min propagation pays O(diameter).
    // Near-dup graphs are near-cliques so both are fast HERE; at 100 TB a
    // boilerplate-chain component (A~B~C~... with no A~C edge) can have
    // huge diameter, and this is the variant that survives it. Identical
    // output by construction — same oracle as q52 proves it.
    "q165_cc_star" -> ((s, d) =>
      Dedup.connectedComponentsStar(verifiedPairs(s, d), "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("cluster_id"),
          (col("node") === col("cluster_id")).as("is_canonical"))),

    // 60-bit SimHash sketch per document.
    "q26_simhash_sig" -> ((s, d) => simhashed(s, d)),

    // SimHash near-dup pairs: 15-bit band candidates, hamming ≤ 2.
    "q27_simhash_near_dup" -> ((s, d) => {
      val sim = simhashed(s, d)
        .withColumn("bands", Dedup.simhashBands(col("simhash"))).cache()
      val cand = Dedup.candidatePairs(sim, "doc_id", "bands")
      cand
        .join(sim.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a")), Seq("doc_a"))
        .join(sim.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")), Seq("doc_b"))
        .withColumn("hamming", Dedup.hamming(col("sim_a"), col("sim_b")))
        .filter(col("hamming") <= 2)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
    }),

    // Span-level exact dedup (Lee et al. 2021 fixed-span variant): every
    // distinct 10-token span survives exactly once corpus-wide; docs are
    // reassembled from their surviving spans. Catches cross-document
    // boilerplate that doc-level hashing (q22) can never see.
    "q88_span_dedup" -> ((s, d) =>
      Dedup.spanDedup(Tables.documents(s, d), "doc_id", "text", 10)),

    // VARIABLE-LENGTH maximal duplicated spans (the q88 relation without
    // the fixed-grid restriction): every maximal >= 10-token run occurring
    // twice in the corpus, with exact extent. Seeds bucket-join on content
    // hash; the diagonal gaps-and-islands window recovers suffix-array
    // maximality (see Dedup.maximalSpans).
    "q143_maximal_spans" -> ((s, d) =>
      Dedup.maximalSpans(Tables.documents(s, d), "doc_id", "text", 10)),

    // q143 with the q135 daily-ingest economics: the batch (doc_id % 10
    // == 7) forms only the spans it participates in — new seeds join the
    // persisted seed table, old×old never re-forms. Oracle = the FULL
    // q143 recompute restricted to new-involving pairs: the hash match
    // proves the incremental build loses no span and no maximality.
    "q217_maximal_spans_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalMaximalSpans(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "doc_id", "text", 10)
    }),

    // Leakage-safe train/val/test split: the q62 hash split keyed on the
    // near-dup CLUSTER id instead of the doc id, so every member of a
    // near-dup cluster lands in the SAME split — the assignment a plain
    // per-doc split violates (a doc and its near-duplicate in train and
    // test is benchmark leakage). Docs outside the pair graph are
    // singletons (cluster_id = doc_id). Composition: LSH candidates →
    // Jaccard-verified pairs → connected components → hash split on the
    // cluster label; the split stays a pure function of content.
    "q93_leakage_split" -> ((s, d) => {
      val m = minhashed(s, d)
        .withColumn("bands", Dedup.lshBands(col("sig"), 4, 2)).cache()
      val cand = Dedup.candidatePairs(m, "doc_id", "bands")
      val sh = shingled(s, d).cache()
      val verified = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
        .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      val labels = Dedup.connectedComponents(verified, "doc_a", "doc_b", maxIter = 50)
        .select(col("node").as("doc_id"), col("cluster_id"))
      val withCluster = Tables.documents(s, d).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      graft.operators.Curation.hashSplit(withCluster, "cluster_id",
        Seq(("train", 90), ("val", 5), ("test", 5)))
        .select(col("doc_id"), col("cluster_id"), col("split"))
    }),

    // Cross-source duplication matrix: for each unordered source pair, how
    // many DISTINCT 10-token spans appear in both — the diagnostic that
    // tells a curation pipeline which feeds copy from each other (and
    // therefore which pair a near-dup pass should prioritize). Shuffles on
    // span text; the pair fan-out is bounded by the (small) source count.
    "q91_source_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sp = Dedup.spanRelation(docs, "doc_id", "text", 10)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"), col("span_text")).distinct()
      val a = sp.select(col("source").as("src_a"), col("span_text"))
      val b = sp.select(col("source").as("src_b"), col("span_text"))
      a.join(b, Seq("span_text")).filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared_spans"))
    }))

  /** The near-dup cluster oracle (recursive reachability + min-id label),
    * shared verbatim by q52 (neighbor-min CC) and q165 (star-contraction
    * CC): both must hash-match the same DuckDB answer, which is the
    * cross-algorithm equivalence proof on real data.
    */
  private lazy val ClusterOracle: String =
    s"""${MhCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, bands AS (
       |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
       |  FROM mh, UNNEST(range(0, 4)) u(i)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |), verified AS (
       |  SELECT doc_a, doc_b
       |  FROM cand JOIN sh x ON cand.doc_a = x.doc_id
       |            JOIN sh y ON cand.doc_b = y.doc_id
       |  WHERE len(list_distinct(list_intersect(x.shingles, y.shingles))) /
       |        (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
       |         - len(list_distinct(list_intersect(x.shingles, y.shingles)))) >= 0.5
       |), edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM verified
       |  UNION SELECT doc_b, doc_a FROM verified
       |), reach AS (
       |  SELECT DISTINCT s AS node, s AS r FROM edges
       |  UNION
       |  SELECT reach.node, edges.d
       |  FROM reach JOIN edges ON reach.r = edges.s
       |)
       |SELECT node AS doc_id, min(r) AS cluster_id,
       |       node = min(r) AS is_canonical
       |FROM reach GROUP BY node""".stripMargin

  /** Shared by q143 (full build) and q217 (incremental build restricted
    * to new-involving pairs): one definition, so the delta proof's two
    * sides cannot drift.
    */
  private val MaximalSpansSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents
      |), sp AS (
      |  SELECT doc_id,
      |         unnest([struct_pack(p := i,
      |                   h := md5(array_to_string(toks[(i+1):(i+10)], ' ')))
      |                 FOR i IN range(0, len(toks) - 10 + 1)]) AS s
      |  FROM base WHERE len(toks) >= 10
      |), seeds AS (
      |  SELECT doc_id, s.p AS pos, s.h AS wh FROM sp
      |), m AS (
      |  SELECT a.doc_id AS doc_a, a.pos AS pos_a,
      |         b.doc_id AS doc_b, b.pos AS pos_b,
      |         b.pos - a.pos AS diag
      |  FROM seeds a JOIN seeds b ON a.wh = b.wh
      |  WHERE a.doc_id < b.doc_id
      |     OR (a.doc_id = b.doc_id AND a.pos < b.pos)
      |), isl AS (
      |  SELECT doc_a, doc_b, diag, pos_a,
      |         pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
      |                                    ORDER BY pos_a) AS grp
      |  FROM m
      |), spans AS (
      |  SELECT doc_a, doc_b, min(pos_a) AS start_a,
      |         min(pos_a) + diag AS start_b,
      |         max(pos_a) - min(pos_a) + 10 AS span_len
      |  FROM isl GROUP BY doc_a, doc_b, diag, grp
      |)
      |SELECT s.doc_a, s.doc_b, s.start_a, s.start_b, s.span_len,
      |       array_to_string(t.toks[(s.start_a+1):(s.start_a+s.span_len)], ' ')
      |         AS span_text
      |FROM spans s JOIN base t ON s.doc_a = t.doc_id""".stripMargin

  /** The ExactSubstr removal oracle (q303), shared verbatim by q307:
    * the prefiltered composition claims SET-IDENTITY with the full
    * removal pass, so the strongest possible check is hashing both
    * against the SAME brute-force-reconstructed text.
    */
  private[queries] val ExactSubstrRemoveSql: String =
    """WITH g AS (
      |  SELECT doc_id, i AS pos, substr(text, CAST(i AS INT) + 1, 30) AS gram
      |  FROM documents,
      |       LATERAL unnest(range(0, greatest(length(text) - 29, 0))) t(i)
      |), marked AS (
      |  SELECT doc_id, pos FROM g
      |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
      |), brk AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
      |                                        ORDER BY pos) <= 30
      |              THEN 0 ELSE 1 END AS b
      |  FROM marked
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      |  FROM brk
      |), iv AS (
      |  SELECT doc_id, g, min(pos) AS s, max(pos) + 30 AS e
      |  FROM isl GROUP BY doc_id, g
      |), segs AS (
      |  SELECT doc_id,
      |         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
      |           AS sp,
      |         s AS ep
      |  FROM iv
      |  UNION ALL
      |  SELECT v.doc_id, v.me AS sp, length(d.text) AS ep
      |  FROM (SELECT doc_id, max(e) AS me FROM iv GROUP BY doc_id) v
      |  JOIN documents d USING (doc_id)
      |), rebuilt AS (
      |  SELECT s.doc_id,
      |         string_agg(substr(d.text, CAST(s.sp AS INT) + 1,
      |           CAST(s.ep - s.sp AS INT)), '' ORDER BY s.sp) AS clean_text
      |  FROM segs s JOIN documents d USING (doc_id)
      |  GROUP BY s.doc_id
      |), rem AS (
      |  SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS removed_chars
      |  FROM iv GROUP BY doc_id
      |)
      |SELECT d.doc_id, coalesce(r.clean_text, d.text) AS clean_text,
      |       CAST(coalesce(m.removed_chars, 0) AS BIGINT) AS removed_chars
      |FROM documents d
      |LEFT JOIN rebuilt r USING (doc_id)
      |LEFT JOIN rem m USING (doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // q24's candidate CTE + component-agreement count + integer Jaccard.
    "q288_minhash_calibration" ->
      s"""$MhCte, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), matched AS (
         |  SELECT doc_a, doc_b,
         |         CAST((SELECT count(*) FROM UNNEST(range(0, 8)) v(i)
         |               WHERE x.sig[CAST(i AS INT) + 1]
         |                     = y.sig[CAST(i AS INT) + 1]) AS BIGINT)
         |           AS n_match,
         |         CAST(len(list_distinct(list_intersect(sx.shingles,
         |               sy.shingles))) AS BIGINT) AS inter,
         |         CAST(len(list_distinct(sx.shingles))
         |              + len(list_distinct(sy.shingles))
         |              - len(list_distinct(list_intersect(sx.shingles,
         |                  sy.shingles))) AS BIGINT) AS uni
         |  FROM cand JOIN mh x ON cand.doc_a = x.doc_id
         |            JOIN mh y ON cand.doc_b = y.doc_id
         |            JOIN sh sx ON cand.doc_a = sx.doc_id
         |            JOIN sh sy ON cand.doc_b = sy.doc_id
         |)
         |SELECT doc_a, doc_b, n_match,
         |       n_match * 125000 AS est_ppm,
         |       CAST(inter * 1000000 // uni AS BIGINT) AS exact_ppm,
         |       abs(n_match * 125000 - inter * 1000000 // uni)
         |         AS abs_err_ppm
         |FROM matched""".stripMargin,

    // Distinct 5-gram sets as md5 hashes; doc-frequency >= 2 marks a
    // gram shared with at least one other doc.
    "q280_dup_gram_share" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id,
        |         md5(array_to_string(tok[i+1:i+5], ' ')) AS gram_h
        |  FROM tok, UNNEST(range(0, greatest(len(tok) - 4, 0))) u(i)
        |), df AS (
        |  SELECT gram_h, count(*) AS n_docs FROM grams GROUP BY 1
        |)
        |SELECT g.doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_shared,
        |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) * 1000000
        |            // count(*) AS BIGINT) AS dup_share_ppm
        |FROM grams g JOIN df USING (gram_h)
        |GROUP BY 1""".stripMargin,

    "q22_dedup_exact" ->
      """SELECT doc_id, md5(text) AS text_hash,
        |       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |       count(*) OVER (PARTITION BY md5(text)) AS group_size,
        |       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        |FROM documents""".stripMargin,

    "q23_minhash_sig" ->
      s"""$MhCte
         |SELECT doc_id, sig[1] AS mh0, sig[2] AS mh1, sig[3] AS mh2,
         |       sig[4] AS mh3, sig[5] AS mh4, sig[6] AS mh5,
         |       sig[7] AS mh6, sig[8] AS mh7
         |FROM mh""".stripMargin,

    // Truth = the brute-force exact-Jaccard pairs (proving q151's filter
    // lossless is q151's own gate; here brute force IS the oracle's job);
    // predicted = the band-collision candidates reproduced as in q24.
    "q234_dedup_eval" ->
      s"""$MhCte, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
         |         - len(list_distinct(list_intersect(a.shingles, b.shingles)))) > 0
         |    AND len(list_distinct(list_intersect(a.shingles, b.shingles))) /
         |        (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
         |         - len(list_distinct(list_intersect(a.shingles, b.shingles)))) >= 0.5
         |), m AS (SELECT count(*) AS n_pred FROM cand),
         |t AS (SELECT count(*) AS n_truth FROM truth),
         |h AS (SELECT count(*) AS n_hit
         |      FROM cand JOIN truth USING (doc_a, doc_b))
         |SELECT CAST(t.n_truth AS BIGINT) AS n_truth,
         |       CAST(m.n_pred AS BIGINT) AS n_pred,
         |       CAST(h.n_hit AS BIGINT) AS n_hit,
         |       CAST(CASE WHEN m.n_pred > 0
         |            THEN h.n_hit * 1000000 // m.n_pred ELSE 0 END AS BIGINT)
         |         AS precision_ppm,
         |       CAST(CASE WHEN t.n_truth > 0
         |            THEN h.n_hit * 1000000 // t.n_truth ELSE 0 END AS BIGINT)
         |         AS recall_ppm
         |FROM m, t, h""".stripMargin,

    "q24_lsh_near_dup" ->
      s"""$MhCte, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b,
         |       len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |       (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |        - len(list_distinct(list_intersect(x.shingles, y.shingles)))) AS jac
         |FROM cand JOIN sh x ON cand.doc_a = x.doc_id
         |          JOIN sh y ON cand.doc_b = y.doc_id
         |WHERE len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |      (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |       - len(list_distinct(list_intersect(x.shingles, y.shingles)))) >= 0.5""".stripMargin,

    // Same candidate generation as q24; containment both ways, rounded.
    "q150_containment" ->
      s"""$MhCte, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), scored AS (
         |  SELECT doc_a, doc_b,
         |         round(CASE WHEN len(list_distinct(x.shingles)) = 0 THEN 0.0
         |           ELSE len(list_distinct(list_intersect(x.shingles, y.shingles)))
         |                / len(list_distinct(x.shingles)) END, 6) AS cont_ab,
         |         round(CASE WHEN len(list_distinct(y.shingles)) = 0 THEN 0.0
         |           ELSE len(list_distinct(list_intersect(y.shingles, x.shingles)))
         |                / len(list_distinct(y.shingles)) END, 6) AS cont_ba
         |  FROM cand JOIN sh x ON cand.doc_a = x.doc_id
         |            JOIN sh y ON cand.doc_b = y.doc_id
         |)
         |SELECT doc_a, doc_b, cont_ab, cont_ba FROM scored
         |WHERE cont_ab >= 0.5 OR cont_ba >= 0.5""".stripMargin,

    "q135_incremental_dedup" ->
      s"""$MhCte, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 10 = 7 OR b.doc_id % 10 = 7
         |)
         |SELECT doc_a, doc_b,
         |       len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |       (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |        - len(list_distinct(list_intersect(x.shingles, y.shingles)))) AS jac
         |FROM cand JOIN sh x ON cand.doc_a = x.doc_id
         |          JOIN sh y ON cand.doc_b = y.doc_id
         |WHERE len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |      (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |       - len(list_distinct(list_intersect(x.shingles, y.shingles)))) >= 0.5""".stripMargin,

    // q135's oracle with the takedown restriction on BOTH sides: a pair
    // touching a retracted doc must not exist.
    "q249_dedup_retract" ->
      s"""$MhCte, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  WHERE (a.doc_id % 10 = 7 OR b.doc_id % 10 = 7)
         |    AND a.doc_id % 10 <> 3 AND b.doc_id % 10 <> 3
         |)
         |SELECT doc_a, doc_b,
         |       len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |       (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |        - len(list_distinct(list_intersect(x.shingles, y.shingles)))) AS jac
         |FROM cand JOIN sh x ON cand.doc_a = x.doc_id
         |          JOIN sh y ON cand.doc_b = y.doc_id
         |WHERE len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |      (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |       - len(list_distinct(list_intersect(x.shingles, y.shingles)))) >= 0.5""".stripMargin,

    "q25_ngram_jaccard" ->
      s"""$ShCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CASE WHEN (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
         |                  - len(list_distinct(list_intersect(a.shingles, b.shingles)))) = 0
         |            THEN 0.0
         |            ELSE len(list_distinct(list_intersect(a.shingles, b.shingles))) /
         |                 (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
         |                  - len(list_distinct(list_intersect(a.shingles, b.shingles))))
         |       END AS jac
         |FROM sh a, sh b
         |WHERE a.doc_id % 25 = 0 AND a.doc_id < 5000
         |  AND b.doc_id % 25 = 0 AND b.doc_id < 5000
         |  AND a.doc_id < b.doc_id""".stripMargin,

    // Deliberately NOT the algorithm: the all-pairs quadratic scan. A hash
    // match against it proves the prefix filter drops no pair.
    "q151_prefix_join" ->
      s"""$ShCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       len(list_distinct(list_intersect(a.shingles, b.shingles))) /
         |       (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
         |        - len(list_distinct(list_intersect(a.shingles, b.shingles)))) AS jac
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_distinct(list_intersect(a.shingles, b.shingles))) /
         |      (len(list_distinct(a.shingles)) + len(list_distinct(b.shingles))
         |       - len(list_distinct(list_intersect(a.shingles, b.shingles)))) >= 0.5""".stripMargin,

    // Deliberately NOT the algorithm: brute force over ordered pairs.
    "q156_containment_join" ->
      s"""$ShCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       len(list_distinct(list_intersect(a.shingles, b.shingles)))
         |         / len(list_distinct(a.shingles)) AS cont
         |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
         |WHERE len(list_distinct(list_intersect(a.shingles, b.shingles)))
         |        / len(list_distinct(a.shingles)) >= 0.7""".stripMargin,

    "q52_dedup_clusters" -> ClusterOracle,

    // ClusterOracle's CC CTEs with the argmax-by-quality tail swapped in.
    "q295_quality_canonical" -> {
      val prefix = ClusterOracle.substring(0,
        ClusterOracle.indexOf("SELECT node AS doc_id"))
      prefix + ", " +
        """cc AS (
          |  SELECT node AS doc_id, min(r) AS cluster_id
          |  FROM reach GROUP BY node
          |), ln AS (
          |  SELECT doc_id,
          |         CAST(length(regexp_replace(text, '\s', '', 'g'))
          |           AS BIGINT) AS len_ns
          |  FROM documents
          |)
          |SELECT cluster_id, doc_id AS rep_doc_id, n_members,
          |       len_ns AS rep_len_ns
          |FROM (
          |  SELECT cc.cluster_id, cc.doc_id, ln.len_ns,
          |         count(*) OVER (PARTITION BY cc.cluster_id) AS n_members,
          |         row_number() OVER (PARTITION BY cc.cluster_id
          |           ORDER BY ln.len_ns DESC, cc.doc_id ASC) AS rnk
          |  FROM cc JOIN ln USING (doc_id)) z
          |WHERE rnk = 1""".stripMargin
    },

    // Brute-force weighted-Jaccard over all ordered pairs: the weighted
    // prefix filter must lose nothing against this.
    "q170_weighted_jaccard_join" ->
      s"""$ShCte, wtok AS (
         |  SELECT doc_id, unnest(list_distinct(shingles)) AS tok FROM sh
         |), n AS (SELECT count(*) AS n_docs FROM sh),
         |wt AS (
         |  SELECT tok,
         |         least(CAST(floor(1000000.0 * n.n_docs /
         |                          count(DISTINCT doc_id)) AS BIGINT),
         |               1000000000000) AS iw
         |  FROM wtok, n GROUP BY tok, n.n_docs
         |), tw AS (SELECT t.doc_id, t.tok, w.iw FROM wtok t JOIN wt w USING (tok)),
         |tot AS (SELECT doc_id, CAST(sum(iw) AS BIGINT) AS W FROM tw GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(sum(a.iw) AS BIGINT) AS inter_w
         |  FROM tw a JOIN tw b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT i.doc_a, i.doc_b, i.inter_w,
         |       ta.W + tb.W - i.inter_w AS union_w
         |FROM inter i
         |JOIN tot ta ON i.doc_a = ta.doc_id
         |JOIN tot tb ON i.doc_b = tb.doc_id
         |WHERE i.inter_w * 3 >= 1 * (ta.W + tb.W)""".stripMargin,

    // Same clusters, computed by star contraction on the Spark side —
    // the oracle is deliberately identical to q52's: the hash match IS
    // the proof the two CC algorithms agree on real data.
    "q165_cc_star" -> ClusterOracle,

    "q26_simhash_sig" ->
      s"""$SimCte SELECT doc_id, simhash FROM sim""".stripMargin,

    "q27_simhash_near_dup" ->
      s"""$SimCte, sbands AS (
         |  SELECT doc_id, i AS band, (simhash >> (i*15)) & 32767 AS bh
         |  FROM sim, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sbands a JOIN sbands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, bit_count(xor(x.simhash, y.simhash)) AS hamming
         |FROM cand JOIN sim x ON cand.doc_a = x.doc_id
         |          JOIN sim y ON cand.doc_b = y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 2""".stripMargin,

    // q27's band candidates at the wider hamming bound, joined to the
    // exact distinct-token Jaccard.
    "q296_simhash_calibration" ->
      s"""$SimCte, sbands AS (
         |  SELECT doc_id, i AS band, (simhash >> (i*15)) & 32767 AS bh
         |  FROM sim, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sbands a JOIN sbands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), h AS (
         |  SELECT doc_a, doc_b,
         |         CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT)
         |           AS hamming
         |  FROM cand JOIN sim x ON cand.doc_a = x.doc_id
         |            JOIN sim y ON cand.doc_b = y.doc_id
         |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
         |), tok AS (
         |  SELECT doc_id,
         |         list_distinct(list_filter(
         |           string_split_regex(trim(text), '\\s+'),
         |           x -> x <> '')) AS ts
         |  FROM documents
         |), j AS (
         |  SELECT doc_a, doc_b, hamming,
         |         CAST(len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS inter,
         |         CAST(len(ta.ts) + len(tb.ts)
         |              - len(list_intersect(ta.ts, tb.ts)) AS BIGINT) AS uni
         |  FROM h JOIN tok ta ON h.doc_a = ta.doc_id
         |         JOIN tok tb ON h.doc_b = tb.doc_id
         |)
         |SELECT doc_a, doc_b, hamming,
         |       CAST((60 - hamming) * 1000000 // 60 AS BIGINT) AS agree_ppm,
         |       CAST(inter * 1000000 // uni AS BIGINT) AS jaccard_ppm
         |FROM j""".stripMargin,

    // ClusterOracle's chain again: verified pairs per cluster over the
    // implied pair count.
    "q297_cluster_transitivity" -> {
      val prefix = ClusterOracle.substring(0,
        ClusterOracle.indexOf("SELECT node AS doc_id"))
      prefix + ", " +
        """cc AS (
          |  SELECT node AS doc_id, min(r) AS cluster_id
          |  FROM reach GROUP BY node
          |), sizes AS (
          |  SELECT cluster_id, count(*) AS n_members FROM cc GROUP BY 1
          |), direct AS (
          |  SELECT cc.cluster_id, count(*) AS n_direct
          |  FROM verified v JOIN cc ON v.doc_a = cc.doc_id
          |  GROUP BY 1
          |)
          |SELECT s.cluster_id, s.n_members, d.n_direct,
          |       CAST(s.n_members * (s.n_members - 1) // 2 AS BIGINT)
          |         AS n_implied,
          |       CAST(d.n_direct * 1000000
          |            // (s.n_members * (s.n_members - 1) // 2) AS BIGINT)
          |         AS transitivity_ppm
          |FROM sizes s JOIN direct d USING (cluster_id)""".stripMargin
    },

    // Brute-force 30-gram substring join: a position is marked iff its
    // exact 30-char substring occurs >= 2 times corpus-wide; coverage is
    // the per-doc gaps-and-islands union of [pos, pos+30) (an island
    // breaks when the gap to the previous mark exceeds 30). The Spark
    // side computes the SAME marks from the prefix-doubled suffix
    // ordering — the hash match is the suffix machinery's proof.
    "q298_exact_substr_coverage" ->
      """WITH g AS (
        |  SELECT doc_id, i AS pos, substr(text, CAST(i AS INT) + 1, 30) AS gram
        |  FROM documents,
        |       LATERAL unnest(range(0, greatest(length(text) - 29, 0))) t(i)
        |), marked AS (
        |  SELECT doc_id, pos FROM g
        |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
        |), brk AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |                                        ORDER BY pos) <= 30
        |              THEN 0 ELSE 1 END AS b
        |  FROM marked
        |), isl AS (
        |  SELECT doc_id, pos,
        |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM brk
        |), cov AS (
        |  SELECT doc_id, g, count(*) AS nst, max(pos) - min(pos) + 30 AS clen
        |  FROM isl GROUP BY doc_id, g
        |)
        |SELECT doc_id, CAST(sum(nst) AS BIGINT) AS n_dup_starts,
        |       CAST(sum(clen) AS BIGINT) AS covered_chars
        |FROM cov GROUP BY doc_id""".stripMargin,

    // q298's oracle shape with the token as the unit: brute-force
    // 5-token grams (space-joined), >= 2 occurrences, islands in token
    // units.
    "q312_token_substr_coverage" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, i AS pos,
        |         array_to_string(tok[CAST(i AS INT) + 1:CAST(i AS INT) + 5],
        |           ' ') AS gram
        |  FROM tk,
        |       LATERAL unnest(range(0, greatest(len(tok) - 4, 0))) t(i)
        |), marked AS (
        |  SELECT doc_id, pos FROM g
        |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
        |), brk AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |                                        ORDER BY pos) <= 5
        |              THEN 0 ELSE 1 END AS b
        |  FROM marked
        |), isl AS (
        |  SELECT doc_id, pos,
        |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM brk
        |), cov AS (
        |  SELECT doc_id, g, count(*) AS nst, max(pos) - min(pos) + 5 AS clen
        |  FROM isl GROUP BY doc_id, g
        |)
        |SELECT doc_id, CAST(sum(nst) AS BIGINT) AS n_dup_starts,
        |       CAST(sum(clen) AS BIGINT) AS covered_tokens
        |FROM cov GROUP BY doc_id""".stripMargin,

    // Raw suffix sort + lag; exact LCP brute-forced only on adjacent
    // pairs already sharing a 20-char prefix (exactly the pairs that
    // can reach the >= 20 cut), common prefix monotone so max(k) is
    // the LCP.
    "q306_longest_dup_substrings" ->
      """WITH sfx AS (
        |  SELECT doc_id, i AS pos, substr(text, CAST(i AS INT) + 1) AS s,
        |         length(text) - i AS rem
        |  FROM documents, LATERAL unnest(range(0, length(text))) t(i)
        |), ord AS (
        |  SELECT doc_id, pos, s, rem,
        |         lag(doc_id) OVER w AS pid, lag(pos) OVER w AS ppos,
        |         lag(s) OVER w AS ps, lag(rem) OVER w AS prem
        |  FROM sfx WINDOW w AS (ORDER BY s, doc_id, pos)
        |), cand AS (
        |  SELECT pid AS id_a, ppos AS pos_a, doc_id AS id_b, pos AS pos_b,
        |         ps, s, least(prem, rem) AS mx
        |  FROM ord
        |  WHERE pid IS NOT NULL AND substr(ps, 1, 20) = substr(s, 1, 20)
        |), lc AS (
        |  SELECT id_a, pos_a, id_b, pos_b, s,
        |         (SELECT coalesce(max(k), 0)
        |          FROM unnest(range(20, CAST(c.mx AS INT) + 1)) t(k)
        |          WHERE substr(c.ps, 1, CAST(k AS INT))
        |              = substr(c.s, 1, CAST(k AS INT))) AS lcp
        |  FROM cand c
        |)
        |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(pos_a AS BIGINT) AS pos_a,
        |       CAST(id_b AS BIGINT) AS id_b, CAST(pos_b AS BIGINT) AS pos_b,
        |       CAST(lcp AS BIGINT) AS lcp,
        |       substr(s, 1, CAST(lcp AS INT)) AS dup_text
        |FROM lc WHERE lcp >= 20
        |ORDER BY lcp DESC, id_a ASC, pos_a ASC, id_b ASC, pos_b ASC
        |LIMIT 20""".stripMargin,

    // Brute-force cross-corpus 20-gram join: test positions whose gram
    // exists in the benchmark slice, folded to per-doc interval-union
    // coverage exactly like q298.
    "q304_char_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id, i AS pos, substr(text, CAST(i AS INT) + 1, 20) AS gram
        |  FROM documents,
        |       LATERAL unnest(range(0, greatest(length(text) - 19, 0))) t(i)
        |), marked AS (
        |  SELECT doc_id, pos FROM g
        |  WHERE doc_id % 97 <> 0
        |    AND gram IN (SELECT gram FROM g WHERE doc_id % 97 = 0)
        |), brk AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |                                        ORDER BY pos) <= 20
        |              THEN 0 ELSE 1 END AS b
        |  FROM marked
        |), isl AS (
        |  SELECT doc_id, pos,
        |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM brk
        |), cov AS (
        |  SELECT doc_id, g, count(*) AS nh, max(pos) - min(pos) + 20 AS clen
        |  FROM isl GROUP BY doc_id, g
        |)
        |SELECT doc_id, CAST(sum(nh) AS BIGINT) AS n_hits,
        |       CAST(sum(clen) AS BIGINT) AS contaminated_chars
        |FROM cov GROUP BY doc_id""".stripMargin,

    // Same marks/islands as q298, then the kept text re-stitched as
    // string_agg over the gap segments (before each island + the tail),
    // ordered by segment start.
    "q303_exact_substr_remove" -> ExactSubstrRemoveSql,

    // SAME oracle as q303 BY DESIGN: q307 runs the identical removal on
    // the gram-prefiltered sub-corpus only (unflagged docs pass through
    // verbatim), and the prefilter's superset guarantee makes the two
    // outputs set-identical — the shared-oracle hash match IS the proof.
    "q307_prefiltered_substr_remove" -> ExactSubstrRemoveSql,

    // Full-corpus rebuild of the gram-count table with the identical
    // md5-int hash, then the same served per-doc flag counts — what the
    // maintained (save -> load -> delta) artifact must reproduce.
    "q314_prefilter_maintained" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(substr(text, CAST(i AS INT) + 1, 30)),
        |           1, 15))::BIGINT AS g
        |  FROM documents,
        |       LATERAL unnest(range(0, greatest(length(text) - 29, 0))) t(i)
        |), dup AS (
        |  SELECT g FROM g GROUP BY g HAVING count(*) >= 2
        |)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_dup_gram_positions
        |FROM g WHERE g IN (SELECT g FROM dup)
        |GROUP BY doc_id""".stripMargin,

    // q303's FULL removal restricted to the CHANGED set — exactly what
    // the incremental composition claims to emit: the batch (%10 = 7)
    // plus every old doc holding a gram (q314's md5-int hash) that the
    // batch also holds and that is duplicated corpus-wide. The hash
    // match proves incremental == rebuild on every emitted row.
    "q315_incremental_substr_remove" ->
      """WITH g AS (
        |  SELECT doc_id, i AS pos, substr(text, CAST(i AS INT) + 1, 30) AS gram
        |  FROM documents,
        |       LATERAL unnest(range(0, greatest(length(text) - 29, 0))) t(i)
        |), ghash AS (
        |  SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS g
        |  FROM g
        |), dupg AS (
        |  SELECT g FROM ghash GROUP BY g HAVING count(*) >= 2
        |), rel AS (
        |  SELECT DISTINCT g FROM ghash
        |  WHERE doc_id % 10 = 7 AND g IN (SELECT g FROM dupg)
        |), changed AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 10 = 7
        |  UNION
        |  SELECT DISTINCT doc_id FROM ghash WHERE g IN (SELECT g FROM rel)
        |), marked AS (
        |  SELECT doc_id, pos FROM g
        |  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
        |), brk AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
        |                                        ORDER BY pos) <= 30
        |              THEN 0 ELSE 1 END AS b
        |  FROM marked
        |), isl AS (
        |  SELECT doc_id, pos,
        |         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM brk
        |), iv AS (
        |  SELECT doc_id, grp, min(pos) AS s, max(pos) + 30 AS e
        |  FROM isl GROUP BY doc_id, grp
        |), segs AS (
        |  SELECT doc_id,
        |         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
        |           AS sp,
        |         s AS ep
        |  FROM iv
        |  UNION ALL
        |  SELECT v.doc_id, v.me AS sp, length(d.text) AS ep
        |  FROM (SELECT doc_id, max(e) AS me FROM iv GROUP BY doc_id) v
        |  JOIN documents d USING (doc_id)
        |), rebuilt AS (
        |  SELECT s.doc_id,
        |         string_agg(substr(d.text, CAST(s.sp AS INT) + 1,
        |           CAST(s.ep - s.sp AS INT)), '' ORDER BY s.sp) AS clean_text
        |  FROM segs s JOIN documents d USING (doc_id)
        |  GROUP BY s.doc_id
        |), rem AS (
        |  SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS removed_chars
        |  FROM iv GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(r.clean_text, d.text) AS clean_text,
        |       CAST(coalesce(m.removed_chars, 0) AS BIGINT) AS removed_chars
        |FROM documents d
        |LEFT JOIN rebuilt r USING (doc_id)
        |LEFT JOIN rem m USING (doc_id)
        |WHERE d.doc_id IN (SELECT doc_id FROM changed)""".stripMargin,

    "q88_span_dedup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents
        |), sp AS (
        |  SELECT doc_id,
        |         unnest([struct_pack(i := i,
        |                   t := array_to_string(toks[(i*10+1):(i*10+10)], ' '))
        |                 FOR i IN range(0, (len(toks)+9)//10)]) AS s
        |  FROM base WHERE len(toks) > 0
        |), flat AS (
        |  SELECT doc_id, s.i AS span_idx, s.t AS span_text FROM sp
        |), ranked AS (
        |  SELECT doc_id, span_idx, span_text,
        |         row_number() OVER (PARTITION BY span_text
        |                            ORDER BY doc_id, span_idx) AS rn
        |  FROM flat
        |)
        |SELECT doc_id,
        |       string_agg(span_text, ' ' ORDER BY span_idx) AS dedup_text,
        |       CAST(count(*) AS BIGINT) AS n_spans_kept
        |FROM ranked WHERE rn = 1 GROUP BY doc_id""".stripMargin,

    // Mirrors maximalSpans exactly: sliding md5 seed windows, seed
    // equi-join, islands by (pair, diagonal), slice back for the text.
    "q143_maximal_spans" -> MaximalSpansSql,

    // The incremental build must equal the FULL recompute restricted to
    // new-involving pairs — so the oracle IS q143's SQL plus that
    // restriction; the hash match is the delta==rebuild proof.
    "q217_maximal_spans_delta" ->
      (MaximalSpansSql + "\nWHERE s.doc_a % 10 = 7 OR s.doc_b % 10 = 7"),

    "q93_leakage_split" ->
      s"""${MhCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, bands AS (
         |  SELECT doc_id, i AS band, md5(sig[2*i+1] || sig[2*i+2]) AS bh
         |  FROM mh, UNNEST(range(0, 4)) u(i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), verified AS (
         |  SELECT doc_a, doc_b
         |  FROM cand JOIN sh x ON cand.doc_a = x.doc_id
         |            JOIN sh y ON cand.doc_b = y.doc_id
         |  WHERE len(list_distinct(list_intersect(x.shingles, y.shingles))) /
         |        (len(list_distinct(x.shingles)) + len(list_distinct(y.shingles))
         |         - len(list_distinct(list_intersect(x.shingles, y.shingles)))) >= 0.5
         |), e AS (
         |  SELECT doc_a AS s, doc_b AS d FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified
         |), reach AS (
         |  SELECT DISTINCT s AS node, s AS r FROM e
         |  UNION
         |  SELECT reach.node, e.d FROM reach JOIN e ON reach.r = e.s
         |), labels AS (
         |  SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
         |), wc AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
         |)
         |SELECT doc_id, cluster_id,
         |  ${OracleSql.splitCaseSql("cluster_id")} AS split
         |FROM wc""".stripMargin,

    "q91_source_overlap" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents
        |), sp AS (
        |  SELECT source,
        |         unnest([array_to_string(toks[(i*10+1):(i*10+10)], ' ')
        |                 FOR i IN range(0, (len(toks)+9)//10)]) AS span_text
        |  FROM base WHERE len(toks) > 0
        |), d AS (
        |  SELECT DISTINCT source, span_text FROM sp
        |)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(count(*) AS BIGINT) AS n_shared_spans
        |FROM d a JOIN d b
        |  ON a.span_text = b.span_text AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin)
}
