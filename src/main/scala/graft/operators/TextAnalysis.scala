package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Iterate._

/** Text-analysis operators for corpus curation: token statistics, quality
  * scoring, stopword-vote language ID, and document fingerprinting.
  * Everything is a row-local column expression (whole-stage codegen, zero
  * shuffle) — per-document analysis is embarrassingly parallel at any scale.
  */
object TextAnalysis {

  /** Language marker words for the stopword-vote classifier. Tiny on
    * purpose: the operator contract is the vote mechanism; production swaps
    * in real per-language lexicons (or an n-gram model) without touching the
    * pipeline shape.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Canonical text normalization for dedup/signature robustness:
    * lowercase, strip control characters, collapse whitespace runs to one
    * space, trim. Row-local regexp chain in codegen; the regex subset
    * (classes + quantifiers) evaluates identically in Java and RE2-family
    * engines, which keeps it oracle-checkable.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1F\\x7F]", " "),
      "\\s+", " "))

  /** PII redaction: emails → <EMAIL>, long digit runs (8+, phone/account
    * numbers) → <NUM>. Deliberately simple patterns — the operator contract
    * is the redaction pass (row-local, composable before signatures);
    * production swaps in its compliance-grade pattern set.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{8,}", "<NUM>")

  /** Tokens count of the whitespace tokenization. */
  def tokenCount(tokensCol: Column): Column = size(tokensCol).cast("long")

  /** Distinct-token count. */
  def distinctTokenCount(tokensCol: Column): Column =
    size(array_distinct(tokensCol)).cast("long")

  /** BPE-ish subword count: ceil(len/4) units per token — a cheap stand-in
    * with the right scaling behavior for budget estimation (real BPE is a
    * vocabulary lookup; the pipeline shape is identical).
    */
  def subwordCount(tokensCol: Column): Column =
    aggregate(tokensCol, lit(0L),
      (acc, t) => acc + ceil(length(t) / 4.0).cast("long"))

  /** Count of tokens that appear in `words`. */
  def wordHits(tokensCol: Column, words: Seq[String]): Column =
    size(filter(tokensCol, t => t.isin(words: _*))).cast("long")

  /** Ratio of non-letter, non-digit, non-space characters. Unicode classes
    * so accented/CJK letters count as letters, not punctuation — otherwise
    * clean non-English documents get floored by the quality score.
    */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")
    when(length(text) === 0, 0.0).otherwise(length(stripped) / length(text))
  }

  /** Composite quality score in [0,1]: length credit, stopword naturalness,
    * punctuation penalty. Fixed evaluation order keeps it bit-deterministic.
    */
  def qualityScore(text: Column, tokensCol: Column): Column = {
    val nTok = size(tokensCol)
    val stopRatio = when(nTok === 0, 0.0)
      .otherwise(wordHits(tokensCol, Stopwords) / nTok)
    round(least(lit(1.0), nTok / 50.0) * 0.5 + stopRatio * 0.3 +
      (lit(1.0) - punctRatio(text)) * 0.2, 4)
  }

  /** Stopword-vote language ID: count marker hits per language, pick the
    * argmax (ties resolved by LangMarkers order), "und" when no marker hits.
    */
  def langId(tokensCol: Column): Column = {
    val votes = LangMarkers.map { case (lang, words) =>
      lang -> wordHits(tokensCol, words)
    }
    val maxVote = greatest(votes.map(_._2): _*)
    val picks = votes.foldLeft(when(maxVote === 0, "und")) {
      case (acc, (lang, v)) => acc.when(v === maxVote, lang)
    }
    picks.otherwise("und")
  }

  /** Canonical-text fingerprint: lowercase, strip non-alphanumerics to
    * spaces, collapse runs, trim, md5. Robust to case/punct/whitespace
    * variation — the exact-dedup key for "same modulo formatting".
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "),
      " +", " ")))

  /** Raw per-doc n-gram counts: (id, n_grams, dup_cnt, top_cnt) as exact
    * BIGINTs — shared by `repetitionStats` (fractions) and `gopherFilter`
    * (integer threshold flags). Docs with < n tokens emit nothing.
    *
    * Grams are ARRAY-typed (the token sequence itself, grouped as a value),
    * NOT a separator-joined string: ["a b", "c"] and ["a", "b c"] must stay
    * distinct grams for any caller whose tokens may contain whitespace.
    * `tokCol` must be an already-materialized token array column (never
    * inline the tokenizer into the gram lambda: interpreted HOFs re-evaluate
    * their argument per element). Gram formation is row-local; counting is a
    * (doc, gram) hash aggregate with map-side partial combine — one shuffle
    * of O(distinct grams), never all-pairs, so the shape survives 100 TB.
    */
  def gramCountStats(docs: DataFrame, idCol: String, tokCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    val grams = docs
      .select(col(idCol), col(tokCol).as("tok"))
      .filter(size(col("tok")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("tok")) - n),
        i => array((0 until n).map(o => col("tok")(i + o)): _*)))
        .as("gram"))
    val counts = grams.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(idCol)).agg(
      sum(col("cnt")).cast("long").as("n_grams"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(0L))
        .cast("long").as("dup_cnt"),
      max(col("cnt")).cast("long").as("top_cnt"))
  }

  /** Per-document n-gram repetition metrics — the Gopher repetition quality
    * rules (Rae et al. 2021 §A1.1: "duplicate n-gram fraction" and "top
    * n-gram fraction"), the standard filter for boilerplate/looping text in
    * training-data curation.
    *
    * Output per doc (docs with fewer than n tokens have no grams and drop
    * out): `n_grams` = instance count (n_tok - n + 1), `dup_frac` = fraction
    * of instances whose gram occurs more than once in-doc, `top_frac` =
    * frequency share of the most frequent gram.
    */
  def repetitionStats(docs: DataFrame, idCol: String, tokCol: String,
      n: Int = 2): DataFrame =
    gramCountStats(docs, idCol, tokCol, n)
      .select(col(idCol), col("n_grams"),
        round(col("dup_cnt") / col("n_grams"), 6).as("dup_frac"),
        round(col("top_cnt") / col("n_grams"), 6).as("top_frac"))

  /** Composed Gopher-style keep/reject verdict (Rae et al. 2021 §A1.1,
    * adapted to the implemented metrics): token-count range, mean word
    * length in [3, 10], at least one stopword, duplicate-2gram fraction
    * ≤ 0.6, top-2gram share ≤ 0.3. Every flag is an INTEGER comparison
    * (e.g. mean-length bounds as 3n ≤ Σlen ≤ 10n, fraction thresholds
    * cross-multiplied) — no float thresholds to drift at a rounding
    * boundary between engines. Docs with < 2 tokens have no gram row:
    * LEFT join + the repetition flags pass VACUOUSLY (a doc with no grams
    * has no repetition — coalescing to false would let the repetition
    * filter reject clean short docs whenever minTokens < 2). Base stats
    * are row-local; the only shuffles are the gram aggregate and the
    * (id-keyed) join.
    */
  def gopherFilter(docs: DataFrame, idCol: String, tokCol: String,
      minTokens: Long = 10L, maxTokens: Long = 500L): DataFrame = {
    val g = gramCountStats(docs, idCol, tokCol, 2)
    val base = docs.select(col(idCol),
      size(col(tokCol)).cast("long").as("n_tokens"),
      aggregate(col(tokCol), lit(0L),
        (acc, x) => acc + length(x).cast("long")).as("sum_len"),
      wordHits(col(tokCol), Stopwords).cast("long").as("stop_hits"))
    base.join(g, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens").between(minTokens, maxTokens).as("f_len"),
        (lit(3L) * col("n_tokens") <= col("sum_len") &&
          col("sum_len") <= lit(10L) * col("n_tokens")).as("f_wordlen"),
        (col("stop_hits") >= 1L).as("f_stop"),
        coalesce(col("dup_cnt") * 10L <= col("n_grams") * 6L, lit(true))
          .as("f_dup"),
        coalesce(col("top_cnt") * 10L <= col("n_grams") * 3L, lit(true))
          .as("f_top"))
      .withColumn("keep", col("f_len") && col("f_wordlen") &&
        col("f_stop") && col("f_dup") && col("f_top"))
  }

  // -------------------------------------------- statistical text modeling
  //
  // Cross-engine determinism rule for this family: NO transcendental
  // functions (log differs across libm implementations by ulps, enough to
  // flip a rounding boundary). Scores are built from +,*,/ and floor only —
  // all correctly-rounded per IEEE 754, hence bit-identical in any engine —
  // with per-token values floored to SCALED BIGINTs so the corpus-level
  // sums are exact integers (float sums are order-dependent; integer sums
  // are not, so the shuffle's nondeterministic reduce order is harmless).

  /** Saturation ceiling for scaled rarity/idf values (10^12): keeps any
    * per-doc sum / tf product inside BIGINT at ANY corpus size (the uncapped
    * hapax value scale·N is unbounded and would wrap Spark's non-ANSI sum
    * silently negative while the DuckDB oracle's checked BIGINT errors).
    * Oracles mirror the cap with least().
    */
  val RarityCap: Long = 1000000000000L

  /** Token-instance relation (one row per occurrence) — the base table for
    * corpus-frequency passes. Row-local explode, no shuffle.
    */
  def tokenInstances(docs: DataFrame, idCol: String, tokCol: String): DataFrame =
    docs.select(col(idCol), explode(col(tokCol)).as("term"))

  /** CCNet-style rarity scoring with a unigram corpus model: a document's
    * score is the mean inverse relative frequency of its tokens — high for
    * rare/unnatural text, low for common prose (the no-log stand-in for LM
    * perplexity filtering). Two passes, both single-shuffle: corpus term
    * frequencies, then an instance→frequency equi-join aggregated per doc.
    * The join is a hot/cold split (`Relational.hotColdJoin`): the Zipf head
    * joins broadcast so hot terms never shuffle; the cold tail joins by key
    * (the FULL table is never broadcast — vocabulary size is
    * corpus-dependent and unbounded at 100 TB).
    *
    * Per-token rarity is floor(scale · N / freq(term)) — an exact BIGINT —
    * so the per-doc sum is order-independent; the only float ops are one
    * IEEE-exact division per distinct term and the final rounded mean.
    * Docs with zero tokens have no instances and drop out.
    */
  def rarityScore(docs: DataFrame, idCol: String, tokCol: String,
      scale: Long = 1000000L): DataFrame = {
    val inst = tokenInstances(docs, idCol, tokCol)
    val freq = inst.groupBy(col("term")).agg(count(lit(1)).as("freq"))
    // N from a narrow pre-explode scan (sum of token-array sizes == total
    // instances): avoids re-deriving the whole frequency aggregate — a
    // second corpus explode + exchange — just to sum it into one number
    val total = docs.agg(
      coalesce(sum(size(col(tokCol)).cast("long")), lit(0L)).as("n_total"))
    // RarityCap bounds the per-token value so the per-doc BIGINT sum cannot
    // overflow at any corpus size (a hapax at N tokens scores scale·N —
    // unbounded): capped, a 10^6-token doc sums to ≤ 10^18 < Long.Max.
    // Tokens rarer than 1-in-(cap/scale) all saturate at "max rarity" —
    // ordering beyond that point carries no signal for a quality filter.
    val scaled = freq.crossJoin(broadcast(total))
      .select(col("term"), col("freq"),
        least(floor(lit(scale.toDouble) * col("n_total") / col("freq")),
          lit(RarityCap)).cast("long").as("rarity_scaled"))
    // hot/cold split on the Zipf head: the corpus frequency IS the join's
    // key skew, so the heaviest terms join broadcast and never shuffle
    Relational.hotColdJoin(inst, scaled, "term", "freq", 1000)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rarity_scaled")).as("rs"))
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        round(col("rs").cast("long") / col("n_tokens") / scale.toDouble, 6)
          .as("rarity"))
  }

  /** TF-IDF keyword extraction, ratio-idf variant: per (doc, term) score =
    * tf · floor(scale · n_docs / df) — exact BIGINTs end to end, so the
    * top-k ranking has no float ties to break (residual ties break on term).
    * Two aggregates ((doc, term) then term) and one key join; the heavy
    * relation (tf) shuffles once on term and once on doc.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, tokCol: String,
      k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val inst = tokenInstances(docs, idCol, tokCol)
    val tf = inst.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // docs with >= 1 token == docs that appear in inst, via a narrow
    // pre-explode scan instead of countDistinct over the instance relation
    val nDocs = docs.filter(size(col(tokCol)) > 0)
      .agg(count(lit(1)).as("n_docs"))
    // same saturation bound as rarityScore: tf ≤ 10^6 × idf ≤ 10^12 keeps
    // the product within BIGINT instead of silently wrapping negative
    val idf = df.crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"),
        least(floor(lit(scale.toDouble) * col("n_docs") / col("df")),
          lit(RarityCap)).cast("long").as("idf_scaled"))
    // document frequency is the (doc, term) relation's key skew: hot/cold
    // split keeps the head terms out of the shuffle
    val scored = Relational.hotColdJoin(tf, idf, "term", "df", 1000)
      .withColumn("tfidf", (col("tf") * col("idf_scaled")).cast("long"))
    Relational.topKPerGroup(scored, Seq(col(idCol)),
        Seq(col("tfidf").desc, col("term").asc), k, "rank")
      .select(col(idCol), col("term"), col("rank").cast("long").as("rank"),
        col("tfidf"))
  }

  /** BM25 retrieval scoring (Robertson's k1 = 1.2, b = 0.75) under the
    * family's no-transcendental rule:
    * - idf is the ratio variant as an exact scaled BIGINT:
    *   floor(scale · (2N − 2df + 1) / (2df + 1)) — the textbook
    *   (N − df + 0.5) / (df + 0.5) with the halves cleared by doubling —
    *   capped at [[RarityCap]] like every idf in this family.
    * - the tf-saturation term is an exact integer rational: with
    *   avgdl = S/N (S = total corpus tokens), multiplying numerator and
    *   denominator by 20·S clears k1 = 6/5 and b = 3/4 into
    *   44·S·tf / (20·S·tf + 6S + 18·dl·N). All factors are integers and
    *   exact as doubles below 2^53 (rescale the 20S clearing at corpora
    *   past ~10^14 tokens); past that the ops stay IEEE-correctly-rounded
    *   and therefore still engine-identical.
    * - per (term, doc): score = round(idf_scaled · num / den / scale, 6) —
    *   left-associated, mirrored exactly by the oracle. Scores stay
    *   per-TERM rows: a cross-term float SUM would reintroduce
    *   summation-order dependence, the one thing round(·, 6) can't always
    *   absorb.
    *
    * Shuffles: the instance→tf aggregate keyed on (doc, term) — but the
    * instance stream is pre-filtered to the query terms by a broadcast
    * semi-join, so the exchange carries only matching occurrences — plus
    * one doc-keyed join for dl. Corpus scalars (S, N) ride a broadcast.
    *
    * Output: per query term, top-k docs by (score desc, doc asc).
    */
  def bm25TopDocs(docs: DataFrame, idCol: String, tokCol: String,
      queryTerms: DataFrame, k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val inst = tokenInstances(docs, idCol, tokCol)
    val dl = docs.filter(size(col(tokCol)) > 0)
      .select(col(idCol), size(col(tokCol)).cast("long").as("dl"))
    val stats = docs.agg(
      coalesce(sum(size(col(tokCol)).cast("long")), lit(0L)).as("s_total"),
      sum(when(size(col(tokCol)) > 0, 1L).otherwise(0L)).as("n_docs"))
    // distinct: a duplicated query-term row would fan every matching
    // instance out and DOUBLE tf while df/dl/S stay correct — the
    // saturation term is jointly nonlinear in (tf, dl), so rankings flip
    // (bm25TermScoresE6 already guards the same way)
    val tf = inst
      .join(broadcast(queryTerms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), least(floor(lit(scale.toDouble) *
          (lit(2) * col("n_docs") - lit(2) * col("df") + lit(1)) /
          (lit(2) * col("df") + lit(1))), lit(RarityCap))
        .cast("long").as("idf_scaled"))
    val scored = tf.join(broadcast(idf), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("score", round(
        col("idf_scaled") *
          (lit(44.0) * col("s_total") * col("tf")) /
          (lit(20.0) * col("s_total") * col("tf") + lit(6.0) * col("s_total")
            + lit(18.0) * col("dl") * col("n_docs")) /
          lit(scale.toDouble), 6))
    Relational.topKPerGroup(scored, Seq(col("term")),
        Seq(col("score").desc, col(idCol).asc), k, "rank")
      .select(col("term"), col(idCol), col("rank").cast("long").as("rank"),
        col("score"))
  }

  /** Multi-query BM25 scoring for retrieval FUSION: `queryTerms` maps each
    * query_id to its terms; the result is one summed score per (query,
    * doc) instead of q149's per-term ranking. Same idf / tf-saturation
    * arithmetic as [[bm25TopDocs]], with one determinism upgrade: the
    * per-(term, doc) score is snapped to integer micro-units BEFORE the
    * per-query sum (round(idf·num/den) as BIGINT), so the multi-term sum
    * is integer and summation-order-proof — a float sum over 3+ terms
    * would hash-drift between engines. Term statistics (df, idf) are
    * computed once per DISTINCT term across all queries, not per query.
    */
  def bm25QueryScores(docs: DataFrame, idCol: String, tokCol: String,
      queryTerms: DataFrame, scale: Long = 1000000L): DataFrame =
    bm25TermScoresE6(docs, idCol, tokCol, queryTerms.select(col("term")),
        scale)
      .join(broadcast(queryTerms), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("score_e6")).as("lex_e6"))

  /** ROCCHIO-STYLE pseudo-relevance feedback (PRF) query expansion
    * (Rocchio 1971; the standard BM25 PRF shape, e.g. Büttcher et al.
    * ch. 8): round 1 ranks each query term's BM25 top-`fbDocs`
    * "pseudo-relevant" documents; the `fbTerms` most frequent OTHER terms
    * inside that feedback set join the query; round 2 re-ranks the corpus
    * against the expanded weighted query — the original term at integer
    * weight `wOrig`, expansions at weight 1, per-(query, doc) score
    * Σ w·score_e6 over [[bm25QueryScores]]' micro-unit-snapped term
    * scores, so the weighted sum is BIGINT and summation-order-proof.
    *
    * Determinism: feedback docs are round 1's exact ranking (score desc,
    * doc asc); expansion terms order by (feedback tf desc, term asc);
    * every downstream number is integer.
    *
    * Scale shape: round 1 is [[bm25TopDocs]] (postings filtered to the
    * query terms before any shuffle); the feedback join touches
    * |queries|·fbDocs documents; round 2 is one more filtered-postings
    * scoring pass over ≤ |queries|·(fbTerms+1) distinct terms — two
    * bounded passes, never a corpus rescan beyond the token-instance
    * reads.
    */
  def prfExpandedBm25(docs: DataFrame, idCol: String, tokCol: String,
      queryTerms: DataFrame, fbDocs: Int, fbTerms: Int, wOrig: Long,
      k: Int): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1 && wOrig >= 1 && k >= 1,
      s"fbDocs/fbTerms/wOrig/k must be positive")
    val inst = tokenInstances(docs, idCol, tokCol)
    val fb = bm25TopDocs(docs, idCol, tokCol, queryTerms, fbDocs)
      .select(col("term").as("query_id"), col(idCol))
    val expCand = inst.join(fb, Seq(idCol))
      .filter(col("term") =!= col("query_id"))
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("ftf"))
    val exp = Relational.topKPerGroup(expCand, Seq(col("query_id")),
        Seq(col("ftf").desc, col("term").asc), fbTerms, "_rn")
      .select(col("query_id"), col("term"))
    val expanded = queryTerms
      .select(col("term").as("query_id"), col("term"), lit(wOrig).as("w"))
      .unionByName(exp.withColumn("w", lit(1L)))
    val scored = bm25TermScoresE6(docs, idCol, tokCol,
      expanded.select(col("term")).distinct())
    val perDoc = scored.join(broadcast(expanded), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("w") * col("score_e6")).as("score_e6"))
    Relational.topKPerGroup(perDoc, Seq(col("query_id")),
        Seq(col("score_e6").desc, col(idCol).asc), k, "rank")
      .select(col("query_id"), col(idCol),
        col("rank").cast("long").as("rank"), col("score_e6"))
  }

  /** The micro-unit per-(term, doc) BM25 relation both multi-term serve
    * paths sum over — factored from [[bm25QueryScores]] so the weighted
    * PRF path cannot drift from the unweighted fusion path.
    */
  private def bm25TermScoresE6(docs: DataFrame, idCol: String,
      tokCol: String, terms: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    val inst = tokenInstances(docs, idCol, tokCol)
    val dl = docs.filter(size(col(tokCol)) > 0)
      .select(col(idCol), size(col(tokCol)).cast("long").as("dl"))
    val stats = docs.agg(
      coalesce(sum(size(col(tokCol)).cast("long")), lit(0L)).as("s_total"),
      sum(when(size(col(tokCol)) > 0, 1L).otherwise(0L)).as("n_docs"))
    val tf = inst.join(broadcast(terms.select(col("term")).distinct()),
        Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), least(floor(lit(scale.toDouble) *
          (lit(2) * col("n_docs") - lit(2) * col("df") + lit(1)) /
          (lit(2) * col("df") + lit(1))), lit(RarityCap))
        .cast("long").as("idf_scaled"))
    tf.join(broadcast(idf), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("score_e6", round(
        col("idf_scaled") *
          (lit(44.0) * col("s_total") * col("tf")) /
          (lit(20.0) * col("s_total") * col("tf") + lit(6.0) * col("s_total")
            + lit(18.0) * col("dl") * col("n_docs"))).cast("long"))
      .select(col("term"), col(idCol), col("score_e6"))
  }

  /** Count-based bigram language model — the trainable artifact of the
    * corpus: P(w2 | w1) as floor(scale · c(w1,w2) / c(w1,·)), where the
    * prefix marginal c(w1,·) counts bigram instances (self-consistent:
    * probabilities per prefix sum to ~1). Gram formation is row-local; the
    * count is one (w1, w2) hash aggregate; the marginal is a window sum
    * over the (small) model table partitioned by w1. `minCount` prunes the
    * long tail BEFORE the window pass (standard LM count pruning) — note
    * the marginal is over the KEPT bigrams, a pruned-model convention the
    * oracle mirrors.
    */
  /** Bigram-instance relation — ONE definition of "what is a bigram",
    * shared by the train (`bigramModel`) and apply (`bigramScore`) sides so
    * gram formation can never silently diverge between them. `keep` carries
    * extra columns through (e.g. the doc id on the apply side).
    */
  private def bigramPairs(docs: DataFrame, tokCol: String,
      keep: Seq[Column]): DataFrame =
    docs
      .select(keep :+ col(tokCol).as("tok"): _*)
      .filter(size(col("tok")) >= 2)
      .select(keep :+ explode(transform(
        sequence(lit(0), size(col("tok")) - 2),
        i => struct(col("tok")(i).as("w1"), col("tok")(i + 1).as("w2"))))
        .as("bg"): _*)
      .select(keep :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)

  def bigramModel(docs: DataFrame, tokCol: String, minCount: Long,
      scale: Long = 1000000L): DataFrame = {
    val counts = bigramPairs(docs, tokCol, Seq.empty)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    counts
      .withColumn("prefix_cnt", sum(col("cnt")).over(w))
      .select(col("w1"), col("w2"), col("cnt").cast("long").as("cnt"),
        col("prefix_cnt").cast("long").as("prefix_cnt"),
        floor(lit(scale.toDouble) * col("cnt") / col("prefix_cnt"))
          .cast("long").as("cond_scaled"))
  }

  /** Hashing-trick document features (Weinberger et al. 2009): each token
    * hashes to one of `dim` buckets with a ±1 sign, a doc's feature vector
    * is the signed count per bucket — text becomes a vector with NO
    * trained embedding model, so documents plug straight into the
    * `Similarity` stack (cosine over the assembled Array[Double]; proven
    * in `IngestOpsSpec`). Emitted as the SPARSE (id, bucket, w) relation:
    * only touched buckets, exact BIGINT weights, one (id, bucket) hash
    * aggregate — dense assembly is the caller's choice (and pointless to
    * shuffle at 100 TB when most buckets are 0 for short docs).
    *
    * Bucket and sign derive from md5 of the token (first 8 hex chars mod
    * dim; 9th-char parity), the engine-portable recipe every oracle in
    * this repo reproduces.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, tokCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val inst = tokenInstances(docs, idCol, tokCol)
      .withColumn("_h", md5(col("term")))
    inst
      .select(col(idCol),
        (conv(substring(col("_h"), 1, 8), 16, 10).cast("long") % dim)
          .as("bucket"),
        when(conv(substring(col("_h"), 9, 1), 16, 10).cast("long") % 2 === 0L,
          lit(1L)).otherwise(lit(-1L)).as("sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sign")).cast("long").as("w"))
      .filter(col("w") =!= 0L)
  }

  /** Score documents under a trained `bigramModel` — the APPLY side of the
    * count-based LM (train on the corpus, score each doc's fluency under
    * it; the no-log analogue of perplexity filtering with an n-gram LM).
    * Per doc: `n_bigrams` instances, `n_known` found in the (pruned) model,
    * `coverage` = n_known/n_bigrams, `avg_cond` = mean conditional
    * probability with unknown bigrams contributing 0 (unsmoothed — docs
    * full of unseen transitions score low, which is the filter's point).
    *
    * The doc→model join is keyed on (w1, w2): the model is O(distinct kept
    * bigrams) and joins by key, never broadcast wholesale; sums are exact
    * BIGINTs of the model's scaled values, so the result is
    * order-independent. Docs with < 2 tokens have no bigrams and drop out.
    *
    * `modelScale` MUST equal the `scale` the model was trained with — the
    * model's cond_scaled values are in those units, and a mismatched
    * divisor skews every score by the ratio with no error raised.
    */
  def bigramScore(docs: DataFrame, idCol: String, tokCol: String,
      model: DataFrame, modelScale: Long = 1000000L): DataFrame = {
    bigramPairs(docs, tokCol, Seq(col(idCol)))
      .join(model.select(col("w1"), col("w2"), col("cond_scaled")),
        Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("cond_scaled")).as("n_known"),
        coalesce(sum(col("cond_scaled")), lit(0L)).as("s"))
      .select(col(idCol),
        col("n_bigrams").cast("long").as("n_bigrams"),
        col("n_known").cast("long").as("n_known"),
        round(col("n_known") / col("n_bigrams"), 6).as("coverage"),
        round(col("s").cast("long") / col("n_bigrams") / modelScale.toDouble, 6)
          .as("avg_cond"))
  }

  /** One greedy left-to-right BPE merge of the adjacent pair (a, b) over a
    * symbol array, as a row-local fold: append each symbol unless it is `b`
    * and the last appended symbol is `a`, in which case the two fuse into
    * `a+b`. The fold naturally enforces non-overlapping merges — after
    * [a,a,a] merges (a,a) the result is [aa, a], because the fused "aa"
    * no longer string-equals the pattern's left side.
    */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Byte-pair-encoding trainer (Sennrich et al. 2016): start from
    * characters, repeatedly fuse the corpus-wide most frequent adjacent
    * symbol pair (count ties broken lexicographically, so training is
    * deterministic). Classic BPE counting: pair frequencies are weighted
    * by WORD frequency and count overlapping occurrences; merges apply
    * greedily left-to-right.
    *
    * Scale shape: the corpus collapses to its word-frequency table in one
    * shuffle (vocabulary-sized from then on — Heaps' law, not corpus-
    * sized); each round is a row-local pair explode + one aggregation,
    * ONE driver-collected row (the argmax pair), and a row-local rewrite
    * fold, with `localCheckpoint` truncating the per-round lineage the
    * same way connectedComponents does. Returns the merge table
    * (iteration, pair_a, pair_b, cnt) — `nMerges` rows unless the corpus
    * exhausts first.
    */
  def bpeMerges(docs: DataFrame, tokCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(col(tokCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("freq"))
      .ckpt()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      // guard size >= 2 BEFORE sequence(0, size-2): Spark's sequence
      // defaults to step -1 when stop < start, so a 1-symbol word would
      // generate [0, -1] instead of no pairs
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(syms) - 2),
            |  i -> struct(element_at(syms, i + 1) AS a,
            |              element_at(syms, i + 2) AS b))""".stripMargin))
          .as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((i + 1L, a, b, top(0).getLong(2)))
        vocab = vocab
          .select(mergeFold(col("syms"), a, b).as("syms"), col("freq"))
          .ckpt()
      }
      i += 1
    }
    merges.result().toDF("iteration", "pair_a", "pair_b", "cnt")
  }

  /** BATCHED BPE training — [[bpeMerges]]' scale fix for real vocabularies.
    * The sequential trainer pays one driver round trip (collect + rewrite
    * job) per merge; a production tokenizer needs 30k–100k merges = 30k+
    * sequential Spark jobs, and THAT — not the per-round compute — is the
    * bottleneck. This variant collects the round's top `candidateWindow`
    * pairs once and accepts up to `batchSize` of them greedily in sorted
    * order (count desc, a asc, b asc — the sequential tie-break), subject
    * to SYMBOL DISJOINTNESS: a candidate is skipped if its left, right, or
    * fused symbol string-equals any symbol of an earlier acceptance in the
    * round. Disjoint merges touch disjoint positions of every word, so the
    * one chained rewrite pass that applies the whole batch is exactly the
    * sequential application of its members — one collect + one checkpoint
    * per ROUND, ~batchSize× fewer driver round trips.
    *
    * Batched-greedy is a DIFFERENT (deterministic, documented) training
    * order than fully-sequential BPE: a merge can create new pairs (x, ab)
    * whose count exceeds a later batch member's, which a per-merge
    * recount would have ranked first (new-pair counts are bounded by the
    * CREATING merge's count, not the batch tail's). This is the standard
    * trade of every batched/parallel BPE trainer; `TextSpec` verifies the
    * distributed implementation EXACTLY (100+ merges) against an
    * independent in-memory trainer of the same spec, pins batchSize=1 ==
    * [[bpeMerges]], and measures the sequential-vs-batched agreement on
    * the real corpus. q114/q189 keep the sequential trainer.
    */
  def bpeMergesBatched(docs: DataFrame, tokCol: String, nMerges: Int,
      batchSize: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    val candidateWindow = batchSize * 4
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(col(tokCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("freq"))
      .ckpt()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(syms) - 2),
            |  i -> struct(element_at(syms, i + 1) AS a,
            |              element_at(syms, i + 2) AS b))""".stripMargin))
          .as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(candidateWindow).collect()
      if (top.isEmpty) exhausted = true
      else {
        val want = math.min(batchSize, nMerges - i)
        val used = scala.collection.mutable.Set.empty[String]
        val batch = Seq.newBuilder[(String, String, Long)]
        var taken = 0
        val it = top.iterator
        while (taken < want && it.hasNext) {
          val r = it.next()
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(a) && !used(b) && !used(a + b)) {
            batch += ((a, b, c))
            used += a; used += b; used += (a + b)
            taken += 1
          }
        }
        val accepted = batch.result()
        accepted.zipWithIndex.foreach { case ((a, b, c), j) =>
          merges += ((i + j + 1L, a, b, c))
        }
        vocab = vocab
          .select(accepted.foldLeft(col("syms")) {
            case (s, (a, b, _)) => mergeFold(s, a, b)
          }.as("syms"), col("freq"))
          .ckpt()
        i += accepted.size
      }
    }
    merges.result().toDF("iteration", "pair_a", "pair_b", "cnt")
  }

  /** Exact phrase search over whitespace tokens: documents containing the
    * consecutive token sequence `phrase`, with the exact occurrence count.
    *
    * Positional-postings intersection (the q132 inverted index's query
    * path): slot i of the phrase contributes its positions re-keyed to
    * `anchor = pos - i`, so every occurrence of the full phrase is one
    * anchor value shared by ALL slots — the k-term phrase becomes k−1
    * equi-joins on (doc, anchor), each over a single term's posting list.
    * Scale shape: the per-term filters cut the exploded token stream to
    * the queried terms' postings BEFORE anything shuffles, so each join
    * exchanges only those postings — the standard inverted-index phrase
    * plan, never a full-corpus scan-join. (Against a pre-materialized
    * q132-style postings table the same joins prune at the scan; here the
    * index is built inline from the raw text.)
    * Repeated words in the phrase work because each slot filters
    * independently ("join join" at positions p,p+1 intersects to the
    * single anchor p).
    *
    * Each slot frame is duplicate-free by construction (one token per
    * position), so the k-way join yields exactly one row per phrase
    * occurrence and the final count is exact.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = df.select(col(idCol),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "tok")))
    val slots = phrase.zipWithIndex.map { case (w, i) =>
      toks.filter(col("tok") === w)
        .select(col(idCol), (col("pos") - i).as("anchor"))
    }
    slots.reduce((a, b) => a.join(b, Seq(idCol, "anchor")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** PROXIMITY search: documents where `termA` and `termB` occur within
    * `window` token positions of each other (unordered), with the pair
    * count and the closest distance — the "NEAR/n" retrieval operator,
    * ranking co-mention tightness where [[booleanRetrieval]] only tests
    * co-presence.
    *
    * Postings filter to the two query terms BEFORE any shuffle (the
    * [[phraseSearch]] discipline), then meet by the bin trick
    * ([[EventTime.selfRangeJoinBinned]]'s): positions bucket by
    * floor(pos/window); a qualifying pair's bins differ by ≤ 1, so
    * replicating one side to its 3 neighbor bins makes the join a plain
    * (doc, bin) equi-join — candidates ∝ matched postings, never the
    * |A-postings|×|B-postings| per-document product a bare doc-join
    * forms on a term-heavy document.
    */
  def proximityPairs(df: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(termA != termB, "proximity terms must differ")
    val toks = df.select(col(idCol),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "tok")))
    val pa = toks.filter(col("tok") === termA)
      .select(col(idCol), col("pos").cast("long").as("pa"))
      .withColumn("bin", explode(array(
        expr(s"pa div $window") - 1, expr(s"pa div $window"),
        expr(s"pa div $window") + 1)))
    val pb = toks.filter(col("tok") === termB)
      .select(col(idCol), col("pos").cast("long").as("pb"),
        expr(s"pb div $window").as("bin"))
    // each (pa, pb) pair meets exactly once: pb carries ONE bin and pa's
    // three replicas have distinct bins — no dedup pass needed
    pa.join(pb, Seq(idCol, "bin"))
      .filter(abs(col("pa") - col("pb")) <= window)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pa") - col("pb"))).as("min_dist"))
  }

  /** Conjunctive (AND) boolean retrieval: documents containing EVERY term
    * in `terms`, with the total occurrence count of query terms.
    *
    * Not a k-way postings join: the token stream filters to the query
    * terms first (a tiny fraction of the corpus at any scale), then ONE
    * doc-keyed aggregate checks `countDistinct(term) == k`. The single
    * shuffle carries only matched postings — strictly less data than any
    * join cascade, and the count-distinct state is bounded by k.
    */
  def booleanRetrieval(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    require(terms.distinct.size == terms.size, s"terms must be distinct: $terms")
    df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("tok")).as("n_terms"),
        count(lit(1)).as("n_hits"))
      .filter(col("n_terms") === terms.size)
      .select(col(idCol), col("n_hits"))
  }

  /** Tokenizer INFERENCE for a trained merge table: segment one word into
    * the subwords `merges` produce, by replaying the merges in training
    * order as row-local folds. O(nMerges) chained expressions — fine for
    * the vocabulary sizes the trainer above produces in tests; a
    * production tokenizer compiles the merges into a trie lookup.
    */
  def bpeSegment(wordColName: String, merges: Seq[(String, String)]): Column = {
    val charSyms = expr(
      s"transform(sequence(1, length($wordColName)), " +
        s"i -> substring($wordColName, i, 1))")
    merges.foldLeft(charSyms) { case (syms, (a, b)) => mergeFold(syms, a, b) }
  }

  /** RAKE keyphrase extraction (Rose et al., "Automatic Keyword
    * Extraction from Individual Documents", 2010) — the unsupervised
    * keyphrase miner of a curation pipeline (topic inventories, index
    * vocabularies, tag suggestions), exact-integer end to end:
    *
    *   - candidate phrases are maximal runs of non-stopword tokens
    *     (stopwords are the delimiters; the classic gaps-and-islands
    *     grouping `pos − row_number` over each doc), capped at `maxLen`
    *     words;
    *   - word statistics over candidate occurrences: freq(w) = how many
    *     phrase slots w fills, deg(w) = Σ length of the phrases those
    *     slots sit in (co-occurrence degree, self included);
    *   - word score = deg·10⁶ div freq (exact ppm — RAKE's
    *     degree-to-frequency ratio favors words that live in long
    *     phrases), phrase score = Σ its words' scores with multiplicity;
    *   - output: the global top-`k` DISTINCT phrases by (score desc,
    *     phrase asc) with occurrence counts — identical phrase strings
    *     always score identically (word scores are corpus-global), so
    *     the dedup loses nothing. PRECONDITION: tokens must not contain
    *     whitespace (true of every tokenizer in this repo — they split
    *     on whitespace); a whitespace-bearing token could make distinct
    *     word sequences collide on one space-joined phrase string, and
    *     the dedup would then merge phrases with different word
    *     multisets (gramCountStats keeps grams ARRAY-typed for exactly
    *     this reason — here the phrase STRING is the output contract).
    *
    * Scale shape: one keyed window (doc, pos) for the islands, one
    * phrase aggregate, two word-keyed aggregates (partial map-side), a
    * global TakeOrderedAndProject for the k selection. All BIGINT.
    */
  def rakeKeyphrases(docs: DataFrame, idCol: String, tokCol: String,
      maxLen: Int, k: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive, got $maxLen")
    require(k >= 1, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val grouped = docs
      .select(col(idCol).as("doc_id"),
        posexplode(col(tokCol)).as(Seq("pos", "term")))
      .filter(!col("term").isInCollection(Stopwords))
      .withColumn("grp", col("pos") - row_number().over(w))
    val phr = grouped.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("len"),
        array_join(transform(array_sort(collect_list(struct(col("pos"),
          col("term")))), s => s.getField("term")), " ").as("phrase"))
      .filter(col("len") <= maxLen)
    val occ = grouped.join(phr, Seq("doc_id", "grp"))
    val ws = occ.groupBy(col("term"))
      .agg(expr("(sum(len) * 1000000L) div count(1)").as("wscore"))
    val ps = occ.join(ws, Seq("term"))
      .groupBy(col("doc_id"), col("grp"), col("phrase"))
      .agg(sum(col("wscore")).as("score_ppm"))
    ps.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("score_ppm")).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase").asc)
      .limit(k)
      .select(col("phrase"), col("score_ppm"), col("n_occurrences"))
  }

  /** Cluster LABELING by term lift (the c-TF-IDF idea behind topic "data
    * maps": BERTopic, Grootendorst 2022, arXiv:2203.05794 — re-expressed
    * without the log): for each cluster, the top-`topK` terms whose
    * in-cluster rate most exceeds their corpus rate. Lift is the exact
    * rate ratio in the [[graft.operators.Curation.dsirImportance]]
    * discipline — both rates pass through parts-per-billion so no
    * corpus-scale product ever forms:
    * `lift_ppm = (cnt_cell·10⁹ div tot_cell)·10⁶ div (cnt_corp·10⁹ div tot_corp)`.
    * 10⁶ = "exactly at corpus rate"; a cluster's label terms run 10-100×.
    * `minCount` suppresses hapax noise (a term seen once in a tiny cell
    * has huge lift and zero descriptive value). Ties break (lift desc,
    * cnt_cell desc, term asc) — fully deterministic.
    *
    * Scale shape: token instances join the (id → cluster) assignment on
    * the doc key (one doc-keyed shuffle), then two keyed aggregates —
    * (cluster, term) and term — and a broadcast of the 1-row corpus
    * total; ranking is one window over the (cluster, term) aggregate,
    * which is vocabulary-sized, not corpus-sized.
    *
    * @param assign  (idCol, clusterCol) one row per doc
    * @param docs    tokenized documents
    * @return (clusterCol, rank, term, cnt_cell, lift_ppm)
    */
  def clusterTermLift(assign: DataFrame, docs: DataFrame, idCol: String,
      tokCol: String, clusterCol: String, topK: Int,
      minCount: Long): DataFrame = {
    val inst = tokenInstances(docs, idCol, tokCol)
      .join(assign.select(col(idCol), col(clusterCol)), Seq(idCol))
    val cellTerm = inst.groupBy(col(clusterCol), col("term"))
      .agg(count(lit(1)).as("cnt_cell"))
    val cellTot = cellTerm.groupBy(col(clusterCol))
      .agg(sum(col("cnt_cell")).as("tot_cell"))
    val corpTerm = inst.groupBy(col("term")).agg(count(lit(1)).as("cnt_corp"))
    val corpTot = corpTerm.agg(sum(col("cnt_corp")).as("tot_corp"))
    val scored = cellTerm
      .filter(col("cnt_cell") >= minCount)
      .join(cellTot, Seq(clusterCol))
      .join(corpTerm, Seq("term"))
      .crossJoin(broadcast(corpTot))
      .withColumn("cell_ppb", expr("cnt_cell * 1000000000 div tot_cell"))
      // corp_ppb floors to 0 once the corpus passes 1e9 tokens — exactly
      // the rarest (highest-lift) terms; a filter(> 0) would silently
      // DROP a cluster's most distinctive labels at the scale this
      // operator advertises. Saturate instead (the RarityCap convention):
      // ppb 0 clamps to 1, the term keeps max measurable lift.
      .withColumn("corp_ppb",
        expr("greatest(cnt_corp * 1000000000 div tot_corp, 1)"))
      .withColumn("lift_ppm", expr("cell_ppb * 1000000 div corp_ppb"))
    graft.operators.Relational.topKPerGroup(scored, Seq(col(clusterCol)),
        Seq(col("lift_ppm").desc, col("cnt_cell").desc, col("term").asc),
        topK, "rank")
      .select(col(clusterCol), col("rank").cast("long").as("rank"),
        col("term"), col("cnt_cell"), col("lift_ppm"))
  }

  /** Per-document LEXICAL DIVERSITY in exact ppm — the vocabulary-richness
    * leg of quality filtering ([[repetitionStats]] catches looped text;
    * this catches templated/boilerplate text whose tokens are individually
    * common but whose vocabulary never grows): type-token ratio, hapax
    * share (types seen exactly once — low for keyword-stuffed spam), and
    * the Simpson repeat index `Σ n_t(n_t−1) / (n(n−1))` — the probability
    * two random token draws collide, 0 for all-distinct text, 10⁶ for a
    * single repeated token, and exactly rational where Shannon entropy
    * (the usual diversity number) is not.
    *
    * Scale shape: one (doc, term) aggregate then one doc aggregate — both
    * partial-aggregated map-side; no join, no window. Single-token docs
    * yield NULL simpson (0/0); zero-token docs don't emit a row.
    */
  def lexicalDiversity(docs: DataFrame, idCol: String,
      tokCol: String): DataFrame = {
    tokenInstances(docs, idCol, tokCol)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c") * (col("c") - 1)).as("_rep2"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"),
        // DECIMAL(38,0): _rep2 ≈ n² for the repetitive docs this filter
        // exists to catch, so _rep2·10⁶ wraps BIGINT past ~3M tokens/doc
        // (non-ANSI: a silently NEGATIVE simpson that passes any
        // "too high" reject gate); 38 digits are exact and the integral
        // divide returns the identical BIGINT wherever longs sufficed
        when(col("n_tokens") > 1,
          expr("CAST(_rep2 AS DECIMAL(38,0)) * 1000000" +
            " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))"))
          .as("simpson_ppm"))
  }
}
