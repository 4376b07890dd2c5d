package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}
import graft.sources.Tables

/** Training-data curation queries over `documents`: deterministic
  * train/val/test split, benchmark n-gram decontamination, sequence
  * packing, and vocabulary building — the corpus → training-shards steps
  * of an LLM data pipeline, each with a DuckDB oracle.
  */
object CurationQueries {

  private def bucketSql(id: String, buckets: Int): String =
    OracleSql.bucketSql(id, buckets)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sliding-window RAG chunking: 200-char chunks stepping by 100 (50%
    // overlap), last chunk always covering the tail — stable (doc_id,
    // chunk_idx, pos) identity for downstream embedding/dedup joins.
    // Row-local explode(sequence)+substring: a pure map, no shuffle.
    "q226_chunk_overlap" -> ((s, d) =>
      Curation.overlapChunks(Tables.documents(s, d), "doc_id", "text",
        size = 200, stride = 100)),

    // Deterministic 90/5/5 split with per-(lang, split) accounting. The
    // assignment is a pure function of doc_id — stable across cluster
    // sizes, reruns, and corpus growth.
    "q62_hash_split" -> ((s, d) =>
      Curation.hashSplit(Tables.documents(s, d), "doc_id",
        Seq(("train", 90), ("val", 5), ("test", 5)))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))),

    // Benchmark decontamination: docs with doc_id % 97 == 0 stand in for
    // the benchmark; any corpus doc sharing an 8-gram with them is flagged
    // with its shared-gram count. Grams join as md5 hashes.
    "q63_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.contaminatedDocs(docs, bench, "doc_id", "text", 8)
        .select(col("doc_id"), col("n_shared").cast("long").as("n_shared"))
    }),

    // Curation v2 capstone — the round-7 operators COMPOSED: fingerprint
    // exact dedup → novelty filter (≤50% recycled 3-grams) → quality
    // scoring → per-source 10k-token budget, all stages proven to
    // compose under one CTE-chain oracle (the q78 proof shape with the
    // new soft-redundancy and budget stages swapped in).
    "q199_curation_v2" -> ((s, d) => {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(s, d)
      val canon = Dedup.exactDedup(
          docs.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
          Seq(col("fp")), "doc_id")
        .filter(col("is_canonical"))
        .select(col("doc_id"), col("text"), col("source"))
      // LEFT join + coalesce: a doc too short to have any 3-gram is 100%
      // novel (seen_ppm 0), not silently droppable — an inner join on
      // noveltyScores' output would exclude it from the corpus entirely
      val novel = canon.join(
        Curation.noveltyScores(canon, "doc_id", "text", 3)
          .select(col("doc_id"), col("seen_ppm")),
        Seq("doc_id"), "left")
        .filter(coalesce(col("seen_ppm"), lit(0L)) <= 500000)
        .drop("seen_ppm")
      val scored = novel.withColumn("tok", Dedup.tokens(col("text")))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("tok")).as("n_tokens"),
          TextAnalysis.qualityScore(col("text"), col("tok")).as("quality"))
      Curation.tokenBudgetSelect(scored, "source", "doc_id", "n_tokens",
        "quality", budget = 10000L)
    }),

    // Curation v3 (q311, round 12): q199's chain upgraded to the
    // STRONGEST dedup the engine has — the Lee et al. ExactSubstr
    // removal pass (q303) runs FIRST (the order the paper prescribes:
    // cut duplicated spans, then filter/score the cleaned text), and the
    // fingerprint dedup → novelty → quality → budget stages consume the
    // REBUILT text. One CTE-chain oracle extends q199's with the removal
    // stage as its head, so the composition is proven end to end, byte
    // for byte through the reconstruction.
    "q311_curation_v3" -> ((s, d) => {
      import graft.operators.TextAnalysis
      val raw = Tables.documents(s, d)
      val cleaned = Dedup.exactSubstrRemove(raw, "doc_id", "text", 30)
        .select(col("id").as("doc_id"), col("clean_text").as("text"))
        .join(raw.select(col("doc_id"), col("source")), Seq("doc_id"))
      val canon = Dedup.exactDedup(
          cleaned.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
          Seq(col("fp")), "doc_id")
        .filter(col("is_canonical"))
        .select(col("doc_id"), col("text"), col("source"))
      val novel = canon.join(
        Curation.noveltyScores(canon, "doc_id", "text", 3)
          .select(col("doc_id"), col("seen_ppm")),
        Seq("doc_id"), "left")
        .filter(coalesce(col("seen_ppm"), lit(0L)) <= 500000)
        .drop("seen_ppm")
      val scored = novel.withColumn("tok", Dedup.tokens(col("text")))
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("tok")).as("n_tokens"),
          TextAnalysis.qualityScore(col("text"), col("tok")).as("quality"))
      Curation.tokenBudgetSelect(scored, "source", "doc_id", "n_tokens",
        "quality", budget = 10000L)
    }),

    // n-gram novelty: per doc, the share of its distinct 3-grams already
    // introduced by a smaller-id doc (parts-per-million, integer div) —
    // the soft-redundancy score between exact span dedup and whole-doc
    // near-dup.
    "q185_novelty" -> ((s, d) =>
      Curation.noveltyScores(Tables.documents(s, d), "doc_id", "text", 3)),

    // q63 with the bloom prefilter: the benchmark gram set folds into one
    // bloom sketch, corpus grams probe it map-side before the exact
    // confirm join. The bloom only prunes — the oracle is q63's verbatim,
    // and the hash match proves the prefilter changes nothing but the
    // shuffle volume.
    "q144_decontaminate_bloom" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.contaminatedDocsBloom(docs, bench, "doc_id", "text", 8)
        .select(col("doc_id"), col("n_shared").cast("long").as("n_shared"))
    }),

    // Span-LEVEL decontamination: q63's benchmark set again, but instead
    // of dropping contaminated docs, only the tokens inside shared 8-gram
    // runs are cut and the rest reassembled (n_kept/n_removed audited).
    "q147_span_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Curation.spanDecontaminate(docs.filter(col("doc_id") % 97 =!= 0),
        bench, "doc_id", "text", 8)
    }),

    // Sequence packing: per source, docs ordered by doc_id are packed into
    // 4096-token bins by exclusive running sum (the deterministic
    // distributed packing). Emits per-doc bin assignment.
    "q64_pack_bins" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      Curation.packBins(toks, Seq(col("source")), col("doc_id"),
        col("n_tokens"), 4096)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("bin"))
    }),

    // Vocabulary: deterministic global top-100 tokens (count desc, token
    // asc) — the frequency table a tokenizer build starts from.
    "q65_vocab_topk" -> ((s, d) =>
      Curation.topTokens(Tables.documents(s, d), "text", 100)
        .select(col("token"), col("n"))),

    // One-scan dataset profile: null/distinct/min/max per column — the QA
    // pass before shards ship.
    "q66_profile" -> ((s, d) =>
      Curation.profile(Tables.documents(s, d),
        Seq("lang", "source", "n_chars"))),

    // Language-balanced resample: upsample smaller languages toward the
    // largest by floor(max/n) capped at 4; per-(lang, rep_idx) accounting.
    "q67_balanced_resample" -> ((s, d) =>
      Curation.balancedRepeat(Tables.documents(s, d), "lang", 4)
        .groupBy(col("lang"), col("rep_idx"))
        .agg(count(lit(1)).as("n_docs"))),

    // THE COMPOSED PIPELINE: exact dedup -> benchmark decontamination ->
    // deterministic split -> sequence packing, end to end, summarized per
    // (split, source). Every stage is an already-oracled operator; this
    // query proves they COMPOSE (the actual corpus -> training-shards
    // workflow), mirrored stage-for-stage by one CTE-chain oracle.
    "q68_corpus_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val deduped = graft.operators.Dedup.exactDedup(
        docs.withColumn("text_hash", md5(col("text"))),
        Seq(col("text_hash")), "doc_id")
        .filter(col("is_canonical"))
        .select(col("doc_id"), col("text"), col("source"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val contaminated = Curation
        .contaminatedDocs(docs, bench, "doc_id", "text", 8)
        .select(col("doc_id"))
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      val split = Curation.hashSplit(clean, "doc_id",
        Seq(("train", 90), ("val", 5), ("test", 5)))
      val toks = split.select(col("doc_id"), col("split"), col("source"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      Curation.packBins(toks, Seq(col("split"), col("source")),
        col("doc_id"), col("n_tokens"), 4096)
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          (max(col("bin")) + 1).cast("long").as("n_bins"))
    }),

    // Temperature-2 mixture weights per source: weight ∝ sqrt(tokens),
    // normalized by the largest source (sqrt is IEEE-exact; a weight SUM
    // would be float-order-dependent).
    "q77_mixture_weights" -> ((s, d) =>
      Curation.mixtureWeights(
        Tables.documents(s, d).withColumn("tok", Dedup.tokens(col("text"))),
        "source", "tok")),

    // The capstone composition — every curation stage in ONE verified
    // query: normalize -> fingerprint dedup (formatting-insensitive) ->
    // Gopher quality filter -> benchmark decontamination -> hash split ->
    // per-(split, source) shard stats. Each stage is the already-oracled
    // operator; this proves they COMPOSE.
    "q78_full_curation" -> ((s, d) => {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(s, d)
        .withColumn("norm", TextAnalysis.normalize(col("text")))
      val deduped = Dedup.exactDedup(
          docs.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
          Seq(col("fp")), "doc_id")
        .filter(col("is_canonical"))
        .select(col("doc_id"), col("norm"), col("source"))
        .withColumn("tok", Dedup.tokens(col("norm")))
      val kept = deduped.join(
        TextAnalysis.gopherFilter(deduped, "doc_id", "tok")
          .filter(col("keep")).select("doc_id"),
        Seq("doc_id"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val contaminated = Curation
        .contaminatedDocs(docs, bench, "doc_id", "text", 8)
        .select(col("doc_id"))
      val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")
      Curation.hashSplit(clean, "doc_id",
          Seq(("train", 90), ("val", 5), ("test", 5)))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("tok"))).cast("long").as("sum_tokens"))
    }),

    // Deterministic weighted sampling without replacement (priority /
    // bottom-k sampling): 50 documents drawn with probability rising in
    // token count (w = tokens + 1), as ONE bounded-state aggregate with
    // exact 128-bit ratio comparisons. The oracle is the O(n²) counting
    // formulation of the same total order in HUGEINT arithmetic — the
    // hash match proves the distributed bounded-heap selection picks
    // exactly the k smallest h/w.
    "q168_weighted_sample" -> ((s, d) =>
      Curation.weightedSample(
        Tables.documents(s, d)
          .withColumn("w", size(Dedup.tokens(col("text"))) + 1),
        "doc_id", col("w"), k = 50, salt = "ws")),

    // Per-source mixture sampling: 10 length-weighted documents per
    // source, one keyed bounded-state aggregate (state <= k x sources x
    // tasks). The per-group version of q168's priority sample.
    "q169_weighted_sample_per_source" -> ((s, d) =>
      Curation.weightedSamplePerGroup(
        Tables.documents(s, d)
          .withColumn("w", size(Dedup.tokens(col("text"))) + 1),
        "source", "doc_id", col("w"), k = 10, salt = "ws")),

    // Largest-remainder (Hamilton) apportionment of a 100k-slot sampling
    // budget across sources, weighted by corpus chars: Σ quota == budget
    // EXACTLY and every quota is within 1 of its ideal share, all in
    // BIGINT arithmetic — the integer companion to q77's mixture weights
    // (proportions a sampler can actually execute).
    "q205_lr_quota" -> ((s, d) =>
      Curation.largestRemainderQuota(Tables.documents(s, d),
          col("source"), col("n_chars"), seats = 100000L)
        .select(col("group").as("source"), col("weight"), col("base"),
          col("quota"))),

    // Concat-and-chunk packing: the corpus md5-shuffled onto one global
    // token tape and cut into 2048-token training sequences — one
    // (seq_id, doc_id) manifest row per span, with in-sequence offsets,
    // the GPT-style dataloader layout with zero padding. The tape
    // positions come from the segmented-scan prefix sum, never a
    // single-partition window.
    "q208_seq_pack" -> ((s, d) =>
      Curation.packSequences(
        Tables.documents(s, d)
          .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long")),
        "doc_id", col("n_tok"), seqLen = 2048L, salt = "ep1")),

    // q205 executed: a 100-document budget apportioned across sources by
    // doc count (largest remainder), then per source the first quota
    // docs of the md5 order are taken — exactly 100 rows, reproducible,
    // the sampler a mixture spec actually runs.
    "q209_quota_sample" -> ((s, d) =>
      Curation.quotaSample(Tables.documents(s, d), col("source"),
        "doc_id", seats = 100L, salt = "qs")),

    // Incremental pack maintenance: the q208 manifest for the old corpus
    // (doc_id%10 != 7) plus the DELTA pack of the new batch starting at
    // the old tape total (one O(1) control row) — union must hash-match
    // the oracle's FULL two-segment rebuild, proving packing is O(|delta|)
    // under append-at-end ordering (the q112/q135/q142 incremental
    // pattern applied to the training-batch layout).
    // TEMPERATURE-flattened mixture quotas (q272): the standard
    // multilingual/LLM corpus-mixing move (sample p^α, α = 0.5) executed
    // as integers — per source, token mass n, temperature weight
    // floor(sqrt(n)) (IEEE sqrt is correctly rounded and n < 2^52 is
    // exact in double, so the floor is engine-identical), then q205's
    // largest-remainder apportionment of a 1000-seat budget over the
    // FLATTENED weights. Head sources give up seats to the tail exactly
    // as the α-temperature intends; Σ quota == 1000 always.
    // Max-min fair token-budget allocation across sources: water-fill a
    // 20k budget over the per-source token supplies — small sources keep
    // everything, the shortfall lands entirely on the largest (the
    // anti-crowding mixture rule proportional quotas can't express).
    // Exact integers, remainder REPORTED not smeared.
    "q291_waterfill" -> ((s, d) => {
      val supplies = Tables.documents(s, d)
        .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("supply"))
      Curation.waterFill(supplies, "source", "supply", budget = 20000L)
    }),

    // Gini coefficient of token mass across sources, exact ppm: the
    // corpus-concentration audit (0 = perfectly even mixture, ->1e6 =
    // one source owns everything) — the one-number summary behind
    // q77/q272/q291's rebalancing knobs. Discrete formula
    // (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending mass:
    // rational end to end, tie-order invariant (equal masses commute).
    "q292_source_gini" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("x").asc, col("source").asc)
      t.withColumn("i", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n_sources"), sum(col("x")).as("total_tokens"),
          sum(col("i") * col("x")).as("_six"))
        .select(col("n_sources"), col("total_tokens"),
          graft.operators.Eval.stagedPpmDiv(
            lit(2L) * col("_six") - (col("n_sources") + 1) * col("total_tokens"),
            col("n_sources") * col("total_tokens")).as("gini_ppm"))
    }),

    // SELECTION CAPSTONE — the round's new operators COMPOSED into one
    // deterministic data-selection pipeline: lexical-diversity gate
    // (ttr >= 0.40) -> cross-doc duplication gate (dup 5-gram share <=
    // 0.20) -> DSIR importance top-5 per source. One CTE-chain oracle
    // proves the stages compose (the q78/q199/q262 capstone discipline
    // applied to the selection family). Docs under 5 tokens have no
    // 5-grams and drop at the dup gate — the "too short to score" rule,
    // mirrored in the oracle.
    "q290_selection_capstone" -> ((s, d) => {
      import graft.operators.{Relational, TextAnalysis}
      val docs = Tables.documents(s, d)
        .withColumn("tok", Dedup.tokens(col("text")))
      val lex = TextAnalysis.lexicalDiversity(docs, "doc_id", "tok")
        .filter(col("ttr_ppm") >= 400000L)
        .select(col("doc_id"), col("n_tokens"), col("ttr_ppm"))
      val dup = Dedup.crossDocGramShare(
          docs.select(col("doc_id"), col("tok")), "doc_id", "tok", n = 5)
        .filter(col("dup_share_ppm") <= 200000L)
        .select(col("doc_id"), col("dup_share_ppm"))
      val scored = Curation.dsirImportance(docs, "doc_id", "tok",
        col("lang") === "en", buckets = 128)
      val surv = scored.join(lex, Seq("doc_id")).join(dup, Seq("doc_id"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
      Relational.topKPerGroup(surv, Seq(col("source")),
          Seq(col("score_ppm").desc, col("doc_id").asc), 5, "rank")
        .select(col("source"), col("rank").cast("long").as("rank"),
          col("doc_id"), col("score_ppm"), col("ttr_ppm"),
          col("dup_share_ppm"), col("n_tokens"))
    }),

    // Rendezvous shard rebalance proof: assign every doc under 4 shards
    // and under 5, emit the (old, new) transition counts. The rendezvous
    // property makes minimal disruption EXACT, not expected: every
    // off-diagonal row must land on the new shard 'E' (surviving shards'
    // hashes didn't change, so keys can only be stolen by the newcomer)
    // — asserted in CurationSpec; the moved mass is ~1/5.
    "q286_rendezvous" -> ((s, d) => {
      val ids = Tables.documents(s, d).select(col("doc_id"))
      val before = Curation.rendezvousShard(ids, "doc_id",
        Seq("A", "B", "C", "D")).select(col("doc_id"),
        col("shard").as("old_shard"))
      val after = Curation.rendezvousShard(ids, "doc_id",
        Seq("A", "B", "C", "D", "E")).select(col("doc_id"),
        col("shard").as("new_shard"))
      before.join(after, Seq("doc_id"))
        .groupBy(col("old_shard"), col("new_shard"))
        .agg(count(lit(1)).as("n_keys"))
    }),

    // DSIR rates as a MAINTAINED artifact: the bucket-count table is
    // purely additive, so ingesting a batch folds its counts in instead
    // of rescanning the corpus. Proof in the house style: rates(old) ⊕
    // rates(delta batch, doc_id % 10 == 7) serves the full corpus and
    // must hash-match q276's from-scratch pipeline (full scores, no
    // top-k, so the match is total). Retraction is the same fold with
    // negated counts (property-tested in GraftProperties).
    "q285_dsir_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("tok", Dedup.tokens(col("text")))
      val old = docs.filter(col("doc_id") % 10 =!= 7)
      val delta = docs.filter(col("doc_id") % 10 === 7)
      val maintained = Curation.dsirCombineRates(
        Curation.dsirRates(old, "doc_id", "tok",
          col("lang") === "en", 128),
        Curation.dsirRates(delta, "doc_id", "tok",
          col("lang") === "en", 128))
      Curation.dsirImportanceFrom(docs, "doc_id", "tok", 128, maintained)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_feat"), col("score_ppm"))
    }),

    // Data-constrained epoch schedule (Muennighoff et al. 2023,
    // arXiv:2305.16264: repeated data helps up to ~4 epochs): per
    // source, fit a 5000-token budget as full_epochs = min(4,
    // budget div tokens) whole passes plus a PARTIAL epoch — the
    // md5-ordered prefix of docs whose cumulative tokens fit the
    // remainder (the q179 prefix rule, so the partial set is a stable
    // function of content, and corpus growth never reshuffles it).
    // Exact integers; the partial epoch is a concrete doc set, not a
    // fraction.
    "q283_epoch_schedule" -> ((s, d) => {
      val budget = 5000L
      val docs = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          size(Dedup.tokens(col("text"))).cast("long").as("n_tok"))
      val tot = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("full_epochs",
          least(lit(4L), expr(s"$budget div n_tokens")))
        .withColumn("rem_budget",
          when(col("full_epochs") < 4,
            lit(budget) - col("full_epochs") * col("n_tokens"))
            .otherwise(0L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val partial = docs.withColumn("cum", sum(col("n_tok")).over(w))
        .join(broadcast(tot.select(col("source"), col("rem_budget"))),
          Seq("source"))
        .filter(col("cum") <= col("rem_budget"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("partial_docs"),
          sum(col("n_tok")).as("partial_tokens"))
      tot.join(partial, Seq("source"), "left")
        .withColumn("partial_docs", coalesce(col("partial_docs"), lit(0L)))
        .withColumn("partial_tokens",
          coalesce(col("partial_tokens"), lit(0L)))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("full_epochs"), col("rem_budget"), col("partial_docs"),
          col("partial_tokens"),
          (col("full_epochs") * col("n_tokens") + col("partial_tokens"))
            .as("scheduled_tokens"))
    }),

    // DSIR-style importance selection (Xie et al. 2023): score every doc
    // by its hashed-bigram rate ratio against the lang='en' target slice
    // and keep the top 100 — domain-targeted data selection with no
    // trained classifier, exact integers end to end (the log-likelihood
    // ratio's monotone no-log analogue; see Curation.dsirImportance).
    // The 128-bucket ratio table broadcasts; en docs should dominate the
    // selection (asserted in CurationSpec).
    "q276_dsir_importance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("tok", Dedup.tokens(col("text")))
      Curation.dsirImportance(docs, "doc_id", "tok",
          col("lang") === "en", buckets = 128)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .orderBy(col("score_ppm").desc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("lang"), col("n_feat"), col("score_ppm"))
    }),

    "q272_temperature_mixture" -> ((s, d) => {
      val mass = Tables.documents(s, d)
        .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
        .withColumn("weight", floor(sqrt(col("n_tokens"))).cast("long"))
      Curation.largestRemainderQuota(mass, col("source"), col("weight"),
          seats = 1000L)
        .join(mass.select(col("source").as("group"), col("n_tokens")),
          Seq("group"))
        .select(col("group"), col("n_tokens"), col("weight"), col("quota"))
    }),

    // RETRACTION for the packed tape — the q208 manifest minus a takedown
    // set (doc_id % 10 == 3), maintained incrementally: per-doc tape
    // intervals recovered from the manifest itself, the prefix before the
    // first deleted position passes through VERBATIM, and only the
    // affected suffix is shifted left and recut. Oracle = the full repack
    // over (corpus ∖ deleted): the hash match proves confined repack ==
    // rebuild, closing the last one-way persisted surface (takedown now
    // reaches the artifact that actually feeds training).
    "q260_pack_retract" -> ((s, d) => {
      val manifest = Curation.packSequences(
        Tables.documents(s, d)
          .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long")),
        "doc_id", col("n_tok"), seqLen = 2048L, salt = "ep1")
      Curation.retractFromPack(manifest,
        Tables.documents(s, d).filter(col("doc_id") % 10 === 3)
          .select(col("doc_id")), seqLen = 2048L)
    }),

    "q211_pack_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long"))
      val old = docs.filter(col("doc_id") % 10 =!= 7)
      val fresh = docs.filter(col("doc_id") % 10 === 7)
      // O(1) control row (the BPE-argmax discipline): the old tape total
      val oldTotal = old.filter(col("n_tok") > 0)
        .agg(coalesce(sum(col("n_tok")), lit(0L))).first().getLong(0)
      Curation.packSequences(old, "doc_id", col("n_tok"), 2048L, "ep1")
        .unionByName(Curation.packSequences(fresh, "doc_id", col("n_tok"),
          2048L, "ep1", tapeOffset = oldTotal))
    }),

    // The two maintenance directions COMPOSED on the tape (q265): q211's
    // append-at-end delta (the %10==7 batch packs from the old tape
    // total) followed by q260's takedown (%10==3 leaves, suffix-confined
    // repack) — the maintained manifest must equal the two-segment
    // rebuild of the FINAL corpus. Retraction recovers tape intervals
    // from the manifest alone, so it composes over a delta-built tape
    // with no special casing; survivors keep the append-order tape and
    // close ranks. The takedown lives in the OLD segment, so the entire
    // fresh segment is inside the shifted suffix — both directions'
    // arithmetic is exercised in one proof.
    "q265_pack_delta_retract" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tok", size(Dedup.tokens(col("text"))).cast("long"))
      val old = docs.filter(col("doc_id") % 10 =!= 7)
      val fresh = docs.filter(col("doc_id") % 10 === 7)
      val oldTotal = old.filter(col("n_tok") > 0)
        .agg(coalesce(sum(col("n_tok")), lit(0L))).first().getLong(0)
      val maintained = Curation
        .packSequences(old, "doc_id", col("n_tok"), 2048L, "ep1")
        .unionByName(Curation.packSequences(fresh, "doc_id", col("n_tok"),
          2048L, "ep1", tapeOffset = oldTotal))
      Curation.retractFromPack(maintained,
        docs.filter(col("doc_id") % 10 === 3).select(col("doc_id")), 2048L)
    }))

  val oracles: Map[String, String] = Map(
    // Same prefix rule: md5-ordered cumulative window against the
    // per-source remainder budget.
    "q283_epoch_schedule" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                              x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), tot AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1
        |), sch AS (
        |  SELECT source, n_docs, n_tokens,
        |         CAST(least(4, 5000 // n_tokens) AS BIGINT) AS full_epochs,
        |         CAST(CASE WHEN least(4, 5000 // n_tokens) < 4
        |              THEN 5000 - least(4, 5000 // n_tokens) * n_tokens
        |              ELSE 0 END AS BIGINT) AS rem_budget
        |  FROM tot
        |), cum AS (
        |  SELECT source, n_tok,
        |         sum(n_tok) OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d
        |), part AS (
        |  SELECT c.source, count(*) AS partial_docs,
        |         CAST(sum(c.n_tok) AS BIGINT) AS partial_tokens
        |  FROM cum c JOIN sch USING (source)
        |  WHERE c.cum <= sch.rem_budget
        |  GROUP BY 1
        |)
        |SELECT s.source, s.n_docs, s.n_tokens, s.full_epochs, s.rem_budget,
        |       CAST(coalesce(p.partial_docs, 0) AS BIGINT) AS partial_docs,
        |       CAST(coalesce(p.partial_tokens, 0) AS BIGINT)
        |         AS partial_tokens,
        |       CAST(s.full_epochs * s.n_tokens
        |            + coalesce(p.partial_tokens, 0) AS BIGINT)
        |         AS scheduled_tokens
        |FROM sch s LEFT JOIN part p USING (source)""".stripMargin,

    // The same ascending-supply window; the empty-level case collapses
    // to a sentinel via aggregate-over-empty (NULL level, max idx).
    "q291_waterfill" ->
      """WITH d AS (
        |  SELECT source,
        |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                              x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), tot AS (
        |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS supply
        |  FROM d GROUP BY 1
        |), r AS (
        |  SELECT source, supply,
        |         row_number() OVER w AS idx,
        |         CAST(coalesce(sum(supply) OVER (w ROWS BETWEEN
        |           UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |           AS cum_before,
        |         count(*) OVER () AS n
        |  FROM tot
        |  WINDOW w AS (ORDER BY supply ASC, source ASC)
        |), r2 AS (
        |  SELECT source, supply, idx,
        |         (20000 - cum_before) // (n - idx + 1) AS l_here
        |  FROM r
        |), lvl AS (
        |  SELECT coalesce(min(level_idx), 9223372036854775807) AS level_idx,
        |         min(level) AS level
        |  FROM (SELECT idx AS level_idx, l_here AS level FROM r2
        |        WHERE l_here < supply ORDER BY idx LIMIT 1)
        |), o AS (
        |  SELECT source, supply,
        |         CASE WHEN idx < level_idx THEN supply
        |              ELSE coalesce(level, supply) END AS alloc,
        |         level
        |  FROM r2, lvl
        |), rem AS (
        |  SELECT CAST(20000 - sum(alloc) AS BIGINT) AS remainder FROM o
        |)
        |SELECT source, supply, CAST(alloc AS BIGINT) AS alloc,
        |       CAST(level AS BIGINT) AS level, remainder
        |FROM o, rem""".stripMargin,

    "q292_source_gini" ->
      """WITH d AS (
        |  SELECT source,
        |         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                              x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), t AS (
        |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS x
        |  FROM d GROUP BY 1
        |), r AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x ASC, source ASC)
        |           AS BIGINT) AS i
        |  FROM t
        |), a AS (
        |  SELECT count(*) AS n_sources, CAST(sum(x) AS BIGINT) AS total_tokens,
        |         CAST(sum(i * x) AS BIGINT) AS six
        |  FROM r
        |)
        |SELECT n_sources, total_tokens,
        |       CAST((2 * six - (n_sources + 1) * total_tokens) * 1000000
        |            // (n_sources * total_tokens) AS BIGINT) AS gini_ppm
        |FROM a""".stripMargin,

    // The three stage oracles chained as CTEs, then the per-source
    // top-5 window — stage composition under one query.
    "q290_selection_capstone" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), per AS (
        |  SELECT doc_id, term, count(*) AS c
        |  FROM (SELECT doc_id, unnest(tok) AS term FROM t)
        |  GROUP BY 1, 2
        |), lex AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_ppm
        |  FROM per GROUP BY 1
        |  HAVING count(*) * 1000000 // sum(c) >= 400000
        |), grams AS (
        |  SELECT DISTINCT doc_id,
        |         md5(array_to_string(tok[i+1:i+5], ' ')) AS gram_h
        |  FROM t, UNNEST(range(0, greatest(len(tok) - 4, 0))) u(i)
        |), gdf AS (
        |  SELECT gram_h, count(*) AS n_docs FROM grams GROUP BY 1
        |), dup AS (
        |  SELECT g.doc_id,
        |         CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) * 1000000
        |              // count(*) AS BIGINT) AS dup_share_ppm
        |  FROM grams g JOIN gdf USING (gram_h)
        |  GROUP BY 1
        |  HAVING sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) * 1000000
        |         // count(*) <= 200000
        |), inst AS (
        |  SELECT doc_id, (lang = 'en') AS tgt,
        |         ('0x' || substr(md5(bg), 1, 8))::BIGINT % 128 AS bucket
        |  FROM (
        |    SELECT doc_id, lang,
        |           unnest(list_transform(range(1, len(tok)),
        |             i -> tok[i] || ' ' || tok[i + 1])) AS bg
        |    FROM t WHERE len(tok) >= 2)
        |), rates AS (
        |  SELECT bucket, count(*) AS rc,
        |         CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
        |  FROM inst GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(rc) AS BIGINT) AS rt,
        |         CAST(sum(tc) AS BIGINT) AS tt
        |  FROM rates
        |), ratio AS (
        |  SELECT bucket,
        |         CAST((tc * 1000000000 // tt) * 1000000
        |              // (rc * 1000000000 // rt) AS BIGINT) AS ratio_ppm
        |  FROM rates, tot
        |  WHERE rc * 1000000000 // rt > 0
        |), sc AS (
        |  SELECT i.doc_id,
        |         CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS score_ppm
        |  FROM inst i JOIN ratio USING (bucket) GROUP BY 1
        |), surv AS (
        |  SELECT d.source, sc.doc_id, sc.score_ppm, lex.ttr_ppm,
        |         dup.dup_share_ppm, lex.n_tokens
        |  FROM sc JOIN lex USING (doc_id) JOIN dup USING (doc_id)
        |  JOIN documents d USING (doc_id)
        |)
        |SELECT source, rank, doc_id, score_ppm, ttr_ppm, dup_share_ppm,
        |       n_tokens
        |FROM (
        |  SELECT source, doc_id, score_ppm, ttr_ppm, dup_share_ppm,
        |         n_tokens,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY score_ppm DESC, doc_id ASC) AS rank
        |  FROM surv) z
        |WHERE rank <= 5""".stripMargin,

    // arg_max over the same md5(shard|key) weights, both shard lists.
    "q286_rendezvous" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |h4 AS (
        |  SELECT doc_id, s, md5(s || '|' || CAST(doc_id AS VARCHAR)) AS hv
        |  FROM ids, (SELECT unnest(['A', 'B', 'C', 'D']) AS s)
        |), b AS (SELECT doc_id, arg_max(s, hv) AS old_shard
        |         FROM h4 GROUP BY 1),
        |h5 AS (
        |  SELECT doc_id, s, md5(s || '|' || CAST(doc_id AS VARCHAR)) AS hv
        |  FROM ids, (SELECT unnest(['A', 'B', 'C', 'D', 'E']) AS s)
        |), a AS (SELECT doc_id, arg_max(s, hv) AS new_shard
        |         FROM h5 GROUP BY 1)
        |SELECT old_shard, new_shard, count(*) AS n_keys
        |FROM b JOIN a USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,

    // The from-scratch pipeline (q276 without the top-k): the maintained
    // fold must land on exactly these full-corpus scores.
    "q285_dsir_delta" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), inst AS (
        |  SELECT doc_id, (lang = 'en') AS tgt,
        |         ('0x' || substr(md5(bg), 1, 8))::BIGINT % 128 AS bucket
        |  FROM (
        |    SELECT doc_id, lang,
        |           unnest(list_transform(range(1, len(tok)),
        |             i -> tok[i] || ' ' || tok[i + 1])) AS bg
        |    FROM t WHERE len(tok) >= 2)
        |), rates AS (
        |  SELECT bucket, count(*) AS rc,
        |         CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
        |  FROM inst GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(rc) AS BIGINT) AS rt,
        |         CAST(sum(tc) AS BIGINT) AS tt
        |  FROM rates
        |), ratio AS (
        |  SELECT bucket,
        |         CAST((tc * 1000000000 // tt) * 1000000
        |              // (rc * 1000000000 // rt) AS BIGINT) AS ratio_ppm
        |  FROM rates, tot
        |  WHERE rc * 1000000000 // rt > 0
        |), sc AS (
        |  SELECT i.doc_id, count(*) AS n_feat,
        |         CAST(sum(ratio_ppm) AS BIGINT) AS s
        |  FROM inst i JOIN ratio USING (bucket) GROUP BY 1
        |)
        |SELECT sc.doc_id, d.lang, n_feat,
        |       CAST(s // n_feat AS BIGINT) AS score_ppm
        |FROM sc JOIN documents d USING (doc_id)""".stripMargin,

    // Same hashed-bigram features (md5 first-8-hex mod 128), same
    // ppb-rate ratio truncation points, same top-100 total order.
    "q276_dsir_importance" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), inst AS (
        |  SELECT doc_id, (lang = 'en') AS tgt,
        |         ('0x' || substr(md5(bg), 1, 8))::BIGINT % 128 AS bucket
        |  FROM (
        |    SELECT doc_id, lang,
        |           unnest(list_transform(range(1, len(tok)),
        |             i -> tok[i] || ' ' || tok[i + 1])) AS bg
        |    FROM t WHERE len(tok) >= 2)
        |), rates AS (
        |  SELECT bucket, count(*) AS rc,
        |         CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
        |  FROM inst GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(rc) AS BIGINT) AS rt,
        |         CAST(sum(tc) AS BIGINT) AS tt
        |  FROM rates
        |), ratio AS (
        |  SELECT bucket,
        |         CAST((tc * 1000000000 // tt) * 1000000
        |              // (rc * 1000000000 // rt) AS BIGINT) AS ratio_ppm
        |  FROM rates, tot
        |  WHERE rc * 1000000000 // rt > 0
        |), sc AS (
        |  SELECT i.doc_id, count(*) AS n_feat,
        |         CAST(sum(ratio_ppm) AS BIGINT) AS s
        |  FROM inst i JOIN ratio USING (bucket) GROUP BY 1
        |)
        |SELECT sc.doc_id, d.lang, n_feat,
        |       CAST(s // n_feat AS BIGINT) AS score_ppm
        |FROM sc JOIN documents d USING (doc_id)
        |ORDER BY score_ppm DESC, sc.doc_id ASC LIMIT 100""".stripMargin,

    "q226_chunk_overlap" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |), k AS (
        |  SELECT doc_id, text,
        |         CASE WHEN len > 200 THEN (len - 200 + 100 - 1) // 100
        |              ELSE 0 END AS kk
        |  FROM d
        |), c AS (
        |  SELECT doc_id, text, unnest(generate_series(0, kk)) AS i FROM k
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |       CAST(i * 100 + 1 AS BIGINT) AS pos,
        |       substr(text, i * 100 + 1, 200) AS chunk,
        |       CAST(length(substr(text, i * 100 + 1, 200)) AS BIGINT)
        |         AS chunk_len
        |FROM c""".stripMargin,

    "q62_hash_split" ->
      s"""WITH split AS (
         |  SELECT lang, n_chars,
         |         CASE WHEN ${bucketSql("doc_id", 100)} < 90 THEN 'train'
         |              WHEN ${bucketSql("doc_id", 100)} < 95 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents
         |)
         |SELECT lang, split, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM split GROUP BY 1, 2""".stripMargin,

    "q199_curation_v2" -> {
      val quality = OracleSql.qualitySql
      s"""WITH fp AS (
         |  SELECT doc_id, text, source,
         |         md5(trim(regexp_replace(regexp_replace(lower(text),
         |             '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
         |  FROM documents
         |), canon AS (
         |  SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source,
         |           min(doc_id) OVER (PARTITION BY fp) AS cid
         |    FROM fp) z
         |  WHERE doc_id = cid
         |), ct AS (
         |  SELECT doc_id, text, source,
         |         list_filter(string_split_regex(trim(text), '\\s+'),
         |                     x -> x <> '') AS tok
         |  FROM canon
         |), grams AS (
         |  SELECT DISTINCT doc_id,
         |         md5(array_to_string(tok[i+1:i+3], ' ')) AS gram_h
         |  FROM ct, UNNEST(range(0, greatest(len(tok) - 2, 0))) u(i)
         |), fg AS (SELECT gram_h, min(doc_id) AS f FROM grams GROUP BY 1),
         |nov AS (
         |  SELECT g.doc_id, count(*) AS n_grams,
         |         sum(CASE WHEN fg.f < g.doc_id THEN 1 ELSE 0 END) AS n_seen
         |  FROM grams g JOIN fg USING (gram_h) GROUP BY 1
         |), scored AS (
         |  SELECT ct.doc_id, ct.source, CAST(len(tok) AS BIGINT) AS n_tokens,
         |         $quality AS quality
         |  FROM ct LEFT JOIN nov USING (doc_id)
         |  WHERE coalesce(nov.n_seen * 1000000 // nov.n_grams, 0) <= 500000
         |)
         |SELECT doc_id, source, n_tokens, quality, cum_tokens
         |FROM (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id ASC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM scored)
         |WHERE cum_tokens <= 10000""".stripMargin
    },

    // q199's CTE chain with the ExactSubstr removal stage (q303's oracle
    // verbatim, as a nested-WITH subquery) prepended: every later stage
    // reads the byte-for-byte rebuilt clean text.
    "q311_curation_v3" -> {
      val quality = OracleSql.qualitySql
      s"""WITH removed AS (
         |${DedupQueries.ExactSubstrRemoveSql}
         |), docs2 AS (
         |  SELECT r.doc_id, r.clean_text AS text, d.source
         |  FROM removed r JOIN documents d USING (doc_id)
         |), fp AS (
         |  SELECT doc_id, text, source,
         |         md5(trim(regexp_replace(regexp_replace(lower(text),
         |             '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
         |  FROM docs2
         |), canon AS (
         |  SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source,
         |           min(doc_id) OVER (PARTITION BY fp) AS cid
         |    FROM fp) z
         |  WHERE doc_id = cid
         |), ct AS (
         |  SELECT doc_id, text, source,
         |         list_filter(string_split_regex(trim(text), '\\s+'),
         |                     x -> x <> '') AS tok
         |  FROM canon
         |), grams AS (
         |  SELECT DISTINCT doc_id,
         |         md5(array_to_string(tok[i+1:i+3], ' ')) AS gram_h
         |  FROM ct, UNNEST(range(0, greatest(len(tok) - 2, 0))) u(i)
         |), fg AS (SELECT gram_h, min(doc_id) AS f FROM grams GROUP BY 1),
         |nov AS (
         |  SELECT g.doc_id, count(*) AS n_grams,
         |         sum(CASE WHEN fg.f < g.doc_id THEN 1 ELSE 0 END) AS n_seen
         |  FROM grams g JOIN fg USING (gram_h) GROUP BY 1
         |), scored AS (
         |  SELECT ct.doc_id, ct.source, CAST(len(tok) AS BIGINT) AS n_tokens,
         |         $quality AS quality
         |  FROM ct LEFT JOIN nov USING (doc_id)
         |  WHERE coalesce(nov.n_seen * 1000000 // nov.n_grams, 0) <= 500000
         |)
         |SELECT doc_id, source, n_tokens, quality, cum_tokens
         |FROM (
         |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY quality DESC, doc_id ASC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM scored)
         |WHERE cum_tokens <= 10000""".stripMargin
    },

    "q185_novelty" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), grams AS (
        |  SELECT DISTINCT doc_id,
        |         md5(array_to_string(tok[i+1:i+3], ' ')) AS gram_h
        |  FROM tok, UNNEST(range(0, greatest(len(tok) - 2, 0))) u(i)
        |), first AS (
        |  SELECT gram_h, min(doc_id) AS f FROM grams GROUP BY 1
        |), agg AS (
        |  SELECT g.doc_id, count(*) AS n_grams,
        |         sum(CASE WHEN f.f < g.doc_id THEN 1 ELSE 0 END) AS n_seen
        |  FROM grams g JOIN first f USING (gram_h)
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_grams, CAST(n_seen AS BIGINT) AS n_seen,
        |       CAST(n_seen * 1000000 // n_grams AS BIGINT) AS seen_ppm
        |FROM agg""".stripMargin,

    "q63_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |         md5(array_to_string(tok[i+1:i+8], ' ')) AS gram_h
        |  FROM tok, UNNEST(range(0, greatest(len(tok) - 7, 0))) u(i)
        |), bench AS (
        |  SELECT DISTINCT gram_h FROM grams WHERE doc_id % 97 = 0
        |)
        |SELECT g.doc_id, count(DISTINCT g.gram_h) AS n_shared
        |FROM grams g JOIN bench b USING (gram_h)
        |GROUP BY 1""".stripMargin,

    // The bloom prefilter is pruning-only, so the oracle is exactly q63's:
    // the exact gram join decides membership in both engines.
    "q144_decontaminate_bloom" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS tok
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id,
        |         md5(array_to_string(tok[i+1:i+8], ' ')) AS gram_h
        |  FROM tok, UNNEST(range(0, greatest(len(tok) - 7, 0))) u(i)
        |), bench AS (
        |  SELECT DISTINCT gram_h FROM grams WHERE doc_id % 97 = 0
        |)
        |SELECT g.doc_id, count(DISTINCT g.gram_h) AS n_shared
        |FROM grams g JOIN bench b USING (gram_h)
        |GROUP BY 1""".stripMargin,

    // Mirrors spanDecontaminate: sliding md5 seed windows on both sides,
    // covered = union of matching windows' positions, anti-join, repack.
    "q147_span_decontaminate" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents
        |), corpus AS (
        |  SELECT * FROM base WHERE doc_id % 97 <> 0
        |), bench_seeds AS (
        |  SELECT DISTINCT md5(array_to_string(toks[i+1:i+8], ' ')) AS wh
        |  FROM base, UNNEST(range(0, greatest(len(toks) - 7, 0))) u(i)
        |  WHERE doc_id % 97 = 0
        |), corpus_seeds AS (
        |  SELECT doc_id, i AS spos,
        |         md5(array_to_string(toks[i+1:i+8], ' ')) AS wh
        |  FROM corpus, UNNEST(range(0, greatest(len(toks) - 7, 0))) u(i)
        |), covered AS (
        |  SELECT DISTINCT s.doc_id, s.spos + j AS pos
        |  FROM corpus_seeds s JOIN bench_seeds b USING (wh),
        |       UNNEST(range(0, 8)) v(j)
        |), tokpos AS (
        |  SELECT doc_id, i AS pos, toks[i+1] AS tok
        |  FROM corpus, UNNEST(range(0, len(toks))) u(i)
        |), kept AS (
        |  SELECT t.doc_id, t.pos, t.tok
        |  FROM tokpos t LEFT JOIN covered c
        |    ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.doc_id IS NULL
        |), totals AS (
        |  SELECT doc_id, count(*) AS n_total FROM tokpos GROUP BY 1
        |)
        |SELECT k.doc_id,
        |       string_agg(k.tok, ' ' ORDER BY k.pos) AS clean_text,
        |       CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(any_value(t.n_total) - count(*) AS BIGINT) AS n_removed
        |FROM kept k JOIN totals t ON k.doc_id = t.doc_id
        |GROUP BY 1""".stripMargin,

    "q64_pack_bins" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |                         x -> x <> '')) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY source
        |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |              AND 1 PRECEDING), 0) / 4096) AS INT) AS bin
        |FROM toks""".stripMargin,

    "q65_vocab_topk" ->
      """SELECT tok AS token, count(*) AS n
        |FROM documents,
        |     UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
        |                        x -> x <> '')) t(tok)
        |GROUP BY 1
        |ORDER BY n DESC, token ASC
        |LIMIT 100""".stripMargin,

    "q66_profile" ->
      """SELECT 'lang' AS col_name, count(*) AS n_rows,
        |       count(*) - count(lang) AS n_nulls,
        |       count(DISTINCT lang) AS n_distinct,
        |       CAST(min(lang) AS VARCHAR) AS min_val,
        |       CAST(max(lang) AS VARCHAR) AS max_val
        |FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |       count(DISTINCT source),
        |       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |       count(DISTINCT n_chars),
        |       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |FROM documents""".stripMargin,

    "q67_balanced_resample" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n FROM documents GROUP BY 1
        |), factors AS (
        |  SELECT lang,
        |         least(4, greatest(1, CAST(floor(
        |           (SELECT max(n) FROM counts) * 1.0 / n) AS BIGINT))) AS rep
        |  FROM counts
        |)
        |SELECT d.lang, CAST(i AS BIGINT) AS rep_idx, count(*) AS n_docs
        |FROM documents d
        |JOIN factors f ON d.lang = f.lang,
        |     UNNEST(range(1, f.rep + 1)) u(i)
        |GROUP BY 1, 2""".stripMargin,

    "q68_corpus_pipeline" ->
      s"""WITH dedup AS (
         |  SELECT doc_id, text, source FROM (
         |    SELECT doc_id, text, source,
         |           min(doc_id) OVER (PARTITION BY md5(text)) AS canon
         |    FROM documents) WHERE doc_id = canon
         |), tok AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
         |                             x -> x <> '') AS tok
         |  FROM documents
         |), grams AS (
         |  SELECT doc_id, md5(array_to_string(tok[i+1:i+8], ' ')) AS gram_h
         |  FROM tok, UNNEST(range(0, greatest(len(tok) - 7, 0))) u(i)
         |), bench AS (
         |  SELECT DISTINCT gram_h FROM grams WHERE doc_id % 97 = 0
         |), contaminated AS (
         |  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram_h)
         |), clean AS (
         |  SELECT d.* FROM dedup d
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |), split AS (
         |  SELECT *, CASE WHEN ${bucketSql("doc_id", 100)} < 90 THEN 'train'
         |                 WHEN ${bucketSql("doc_id", 100)} < 95 THEN 'val'
         |                 ELSE 'test' END AS split
         |  FROM clean
         |), toks AS (
         |  SELECT s.doc_id, s.split, s.source, len(t.tok) AS n_tokens
         |  FROM split s JOIN tok t USING (doc_id)
         |), packed AS (
         |  SELECT doc_id, split, source, n_tokens,
         |         CAST(floor(coalesce(sum(n_tokens) OVER (
         |              PARTITION BY split, source ORDER BY doc_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |              0) / 4096) AS INT) AS bin
         |  FROM toks
         |)
         |SELECT split, source, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       CAST(max(bin) + 1 AS BIGINT) AS n_bins
         |FROM packed GROUP BY 1, 2""".stripMargin,

    "q78_full_curation" -> {
      val stopIn = graft.operators.TextAnalysis.Stopwords
        .map(w => s"'$w'").mkString("(", ",", ")")
      s"""WITH n AS (
         |  SELECT doc_id, source, text,
         |    trim(regexp_replace(regexp_replace(lower(text),
         |         '[\\x00-\\x1F\\x7F]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |        '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
         |  FROM documents
         |), dedup AS (
         |  SELECT doc_id, source, norm FROM (
         |    SELECT doc_id, source, norm,
         |           min(doc_id) OVER (PARTITION BY fp) AS canon
         |    FROM n) WHERE doc_id = canon
         |), ntok AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(norm), '\\s+'),
         |                             x -> x <> '') AS tok
         |  FROM dedup
         |), qg AS (
         |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
         |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_cnt,
         |         CAST(max(cnt) AS BIGINT) AS top_cnt
         |  FROM (SELECT doc_id, gram, count(*) AS cnt FROM (
         |          SELECT doc_id, unnest(list_transform(range(1, len(tok)),
         |            i -> [tok[i], tok[i + 1]])) AS gram
         |          FROM ntok WHERE len(tok) >= 2) GROUP BY 1, 2)
         |  GROUP BY doc_id
         |), qbase AS (
         |  SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
         |         CAST(coalesce(list_sum(list_transform(tok, x -> len(x))), 0)
         |              AS BIGINT) AS sum_len,
         |         CAST(len(list_filter(tok, x -> x IN $stopIn)) AS BIGINT) AS stop_hits
         |  FROM ntok
         |), qkeep AS (
         |  SELECT b.doc_id FROM qbase b LEFT JOIN qg g USING (doc_id)
         |  WHERE b.n_tokens BETWEEN 10 AND 500
         |    AND 3 * b.n_tokens <= b.sum_len AND b.sum_len <= 10 * b.n_tokens
         |    AND b.stop_hits >= 1
         |    AND coalesce(g.dup_cnt * 10 <= g.n_grams * 6, TRUE)
         |    AND coalesce(g.top_cnt * 10 <= g.n_grams * 3, TRUE)
         |), tok AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
         |                             x -> x <> '') AS tok
         |  FROM documents
         |), grams AS (
         |  SELECT doc_id, md5(array_to_string(tok[i+1:i+8], ' ')) AS gram_h
         |  FROM tok, UNNEST(range(0, greatest(len(tok) - 7, 0))) u(i)
         |), bench AS (
         |  SELECT DISTINCT gram_h FROM grams WHERE doc_id % 97 = 0
         |), contaminated AS (
         |  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram_h)
         |), clean AS (
         |  SELECT d.doc_id, d.source FROM dedup d
         |  JOIN qkeep q USING (doc_id)
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |), split AS (
         |  SELECT *, CASE WHEN ${bucketSql("doc_id", 100)} < 90 THEN 'train'
         |                 WHEN ${bucketSql("doc_id", 100)} < 95 THEN 'val'
         |                 ELSE 'test' END AS split
         |  FROM clean
         |)
         |SELECT split, source, count(*) AS n_docs,
         |       CAST(sum(len(t.tok)) AS BIGINT) AS sum_tokens
         |FROM split s JOIN ntok t USING (doc_id)
         |GROUP BY 1, 2""".stripMargin
    },

    "q77_mixture_weights" ->
      """WITH t AS (
        |  SELECT source,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |             x -> x <> '')) AS n_tok
        |  FROM documents
        |), per AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY source
        |), mx AS (
        |  SELECT max(n_tokens) AS max_tokens FROM per
        |)
        |SELECT source, n_docs, n_tokens,
        |       round(sqrt(n_tokens) / sqrt(max_tokens), 6) AS rel_weight
        |FROM per, mx""".stripMargin,

    // Counting formulation of the same total order (smallest h/w first,
    // ties on doc_id), cross-multiplied in HUGEINT so the comparison is
    // exact — a row is in the sample iff fewer than k rows precede it.
    "q168_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5('ws|' || doc_id), 1, 15))::BIGINT AS h,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |             x -> x <> '')) + 1 AS w
        |  FROM documents
        |)
        |SELECT a.doc_id, a.h, CAST(a.w AS BIGINT) AS w
        |FROM t a
        |WHERE (SELECT count(*) FROM t b
        |       WHERE b.h::HUGEINT * a.w < a.h::HUGEINT * b.w
        |          OR (b.h::HUGEINT * a.w = a.h::HUGEINT * b.w
        |              AND b.doc_id < a.doc_id)) < 50""".stripMargin,

    // q168's counting oracle, partitioned by source.
    "q169_weighted_sample_per_source" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |         ('0x' || substr(md5('ws|' || doc_id), 1, 15))::BIGINT AS h,
        |         len(list_filter(string_split_regex(trim(text), '\s+'),
        |             x -> x <> '')) + 1 AS w
        |  FROM documents
        |)
        |SELECT a.source, a.doc_id, a.h, CAST(a.w AS BIGINT) AS w
        |FROM t a
        |WHERE (SELECT count(*) FROM t b
        |       WHERE b.source = a.source
        |         AND (b.h::HUGEINT * a.w < a.h::HUGEINT * b.w
        |          OR (b.h::HUGEINT * a.w = a.h::HUGEINT * b.w
        |              AND b.doc_id < a.doc_id))) < 10""".stripMargin,

    // Mirrors Curation.largestRemainderQuota: `//` floor division ==
    // Spark `div` on the nonnegative products used here; remainder ties
    // break toward the smaller source.
    "q205_lr_quota" ->
      """WITH per AS (
        |  SELECT source AS grp, CAST(sum(n_chars) AS BIGINT) AS weight
        |  FROM documents GROUP BY 1
        |),
        |tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wt FROM per),
        |based AS (
        |  SELECT grp, weight,
        |         CAST((100000 * weight) // wt AS BIGINT) AS base,
        |         CAST((100000 * weight) % wt AS BIGINT) AS rem
        |  FROM per CROSS JOIN tot
        |),
        |ex AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS extra
        |       FROM based),
        |rnk AS (
        |  SELECT grp, weight, base, rem,
        |         row_number() OVER (ORDER BY rem DESC, grp ASC) AS r
        |  FROM based
        |)
        |SELECT grp AS source, weight, base,
        |       CAST(base + CASE WHEN r <= ex.extra THEN 1 ELSE 0 END
        |            AS BIGINT) AS quota
        |FROM rnk CROSS JOIN ex""".stripMargin,

    // Mirrors packSequences: same tokenization as q168, same md5 tape
    // order (id appended for strict uniqueness), window cumsum, and the
    // span arithmetic over generate_series (inclusive, like Spark's
    // sequence()).
    "q208_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(trim(text),
        |              '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         md5('ep1|' || doc_id) || '|' || doc_id AS ord
        |  FROM t WHERE n_tok > 0
        |), c AS (
        |  SELECT doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (ORDER BY ord
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS run
        |  FROM o
        |), s AS (
        |  SELECT doc_id, run - n_tok AS ts, run AS te FROM c
        |)
        |SELECT u.seq AS seq_id, s.doc_id,
        |       CAST(greatest(s.ts - u.seq * 2048, 0) AS BIGINT)
        |         AS offset_in_seq,
        |       CAST(least(s.te, (u.seq + 1) * 2048)
        |            - greatest(s.ts, u.seq * 2048) AS BIGINT)
        |         AS tokens_in_seq
        |FROM s, UNNEST(generate_series(s.ts // 2048, (s.te - 1) // 2048))
        |     u(seq)""".stripMargin,

    // q205's apportionment chain (weight = doc count, 100 seats), then
    // the per-source md5 rank executes it.
    "q209_quota_sample" ->
      """WITH per AS (
        |  SELECT source AS grp, CAST(count(*) AS BIGINT) AS weight
        |  FROM documents GROUP BY 1
        |),
        |tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wt FROM per),
        |based AS (
        |  SELECT grp, weight,
        |         CAST((100 * weight) // wt AS BIGINT) AS base,
        |         CAST((100 * weight) % wt AS BIGINT) AS rem
        |  FROM per CROSS JOIN tot
        |),
        |ex AS (SELECT CAST(100 - sum(base) AS BIGINT) AS extra FROM based),
        |q AS (
        |  SELECT grp, CAST(base + CASE WHEN r <= ex.extra THEN 1 ELSE 0 END
        |              AS BIGINT) AS quota
        |  FROM (SELECT grp, base, rem,
        |               row_number() OVER (ORDER BY rem DESC, grp ASC) AS r
        |        FROM based) CROSS JOIN ex
        |),
        |ranked AS (
        |  SELECT source AS grp, doc_id,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY md5('qs|' || doc_id), doc_id) AS BIGINT) AS rnk
        |  FROM documents
        |)
        |SELECT r.grp AS "group", r.doc_id, r.rnk, q.quota
        |FROM ranked r JOIN q ON r.grp = q.grp
        |WHERE r.rnk <= q.quota""".stripMargin,

    // The FULL REPACK over (corpus ∖ deleted): survivors keep their md5
    // tape order and close ranks; the suffix-confined Spark retraction
    // hash-matching this proves confined repack == rebuild.
    "q260_pack_retract" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(trim(text),
        |              '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         md5('ep1|' || doc_id) || '|' || doc_id AS ord
        |  FROM t WHERE n_tok > 0 AND doc_id % 10 <> 3
        |), c AS (
        |  SELECT doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (ORDER BY ord
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS run
        |  FROM o
        |), s AS (
        |  SELECT doc_id, run - n_tok AS ts, run AS te FROM c
        |)
        |SELECT u.seq AS seq_id, s.doc_id,
        |       CAST(greatest(s.ts - u.seq * 2048, 0) AS BIGINT)
        |         AS offset_in_seq,
        |       CAST(least(s.te, (u.seq + 1) * 2048)
        |            - greatest(s.ts, u.seq * 2048) AS BIGINT)
        |         AS tokens_in_seq
        |FROM s, UNNEST(generate_series(s.ts // 2048, (s.te - 1) // 2048))
        |     u(seq)""".stripMargin,

    // The q209 apportionment chain over floor(sqrt(token-mass)) weights.
    "q272_temperature_mixture" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(len(list_filter(string_split_regex(trim(text),
        |              '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), mass AS (
        |  SELECT source AS grp, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1
        |), wt AS (
        |  SELECT grp, n_tokens,
        |         CAST(floor(sqrt(n_tokens)) AS BIGINT) AS weight
        |  FROM mass
        |), tot AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM wt),
        |based AS (
        |  SELECT grp, n_tokens, weight,
        |         CAST((1000 * weight) // w_total AS BIGINT) AS base,
        |         CAST((1000 * weight) % w_total AS BIGINT) AS rem
        |  FROM wt CROSS JOIN tot
        |),
        |ex AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS extra FROM based)
        |SELECT grp AS "group", n_tokens, weight,
        |       CAST(base + CASE WHEN r <= ex.extra THEN 1 ELSE 0 END
        |            AS BIGINT) AS quota
        |FROM (SELECT grp, n_tokens, weight, base, rem,
        |             row_number() OVER (ORDER BY rem DESC, grp ASC) AS r
        |      FROM based) z CROSS JOIN ex""".stripMargin,

    // q211's two-segment rebuild minus the takedown set: survivors keep
    // the append-order tape ('0'-prefixed old md5 order, then the
    // '1'-prefixed fresh batch) and close ranks — the composed
    // delta-then-retract Spark result hash-matching this proves the two
    // maintenance directions commute with the rebuild.
    "q265_pack_delta_retract" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(trim(text),
        |              '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         CASE WHEN doc_id % 10 = 7 THEN '1' ELSE '0' END
        |           || md5('ep1|' || doc_id) || '|' || doc_id AS ord
        |  FROM t WHERE n_tok > 0 AND doc_id % 10 <> 3
        |), c AS (
        |  SELECT doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (ORDER BY ord
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS run
        |  FROM o
        |), s AS (
        |  SELECT doc_id, run - n_tok AS ts, run AS te FROM c
        |)
        |SELECT u.seq AS seq_id, s.doc_id,
        |       CAST(greatest(s.ts - u.seq * 2048, 0) AS BIGINT)
        |         AS offset_in_seq,
        |       CAST(least(s.te, (u.seq + 1) * 2048)
        |            - greatest(s.ts, u.seq * 2048) AS BIGINT)
        |         AS tokens_in_seq
        |FROM s, UNNEST(generate_series(s.ts // 2048, (s.te - 1) // 2048))
        |     u(seq)""".stripMargin,

    // The FULL REBUILD with the append-at-end two-segment order (old
    // docs' md5 order, then the new batch's): the delta-built Spark
    // result hash-matching this proves incremental == rebuild.
    "q211_pack_delta" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(trim(text),
        |              '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         CASE WHEN doc_id % 10 = 7 THEN '1' ELSE '0' END
        |           || md5('ep1|' || doc_id) || '|' || doc_id AS ord
        |  FROM t WHERE n_tok > 0
        |), c AS (
        |  SELECT doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (ORDER BY ord
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS run
        |  FROM o
        |), s AS (
        |  SELECT doc_id, run - n_tok AS ts, run AS te FROM c
        |)
        |SELECT u.seq AS seq_id, s.doc_id,
        |       CAST(greatest(s.ts - u.seq * 2048, 0) AS BIGINT)
        |         AS offset_in_seq,
        |       CAST(least(s.te, (u.seq + 1) * 2048)
        |            - greatest(s.ts, u.seq * 2048) AS BIGINT)
        |         AS tokens_in_seq
        |FROM s, UNNEST(generate_series(s.ts // 2048, (s.te - 1) // 2048))
        |     u(seq)""".stripMargin)
}
