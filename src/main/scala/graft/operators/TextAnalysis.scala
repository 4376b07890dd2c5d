package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Per-document n-gram repetition metrics — the Gopher repetition quality
    * rules (Rae et al. 2021 §A1.1: "duplicate n-gram fraction" and "top
    * n-gram fraction"), the standard filter for boilerplate/looping text in
    * training-data curation.
    *
    * `tokCol` must be an already-materialized token array column (never
    * inline the tokenizer into the gram lambda: interpreted HOFs re-evaluate
    * their argument per element). Gram formation is row-local; counting is a
    * (doc, gram) hash aggregate with map-side partial combine — one shuffle
    * of O(distinct grams), never all-pairs, so the shape survives 100 TB.
    *
    * Output per doc (docs with fewer than n tokens have no grams and drop
    * out): `n_grams` = instance count (n_tok - n + 1), `dup_frac` = fraction
    * of instances whose gram occurs more than once in-doc, `top_frac` =
    * frequency share of the most frequent gram.
    */
  def repetitionStats(docs: DataFrame, idCol: String, tokCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    val grams = docs
      .select(col(idCol), col(tokCol).as("tok"))
      .filter(size(col("tok")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("tok")) - n),
        i => concat_ws(" ", (0 until n).map(o => col("tok")(i + o)): _*)))
        .as("gram"))
    val counts = grams.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("n_grams"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_cnt"),
      max(col("cnt")).as("top_cnt"))
      .select(col(idCol),
        col("n_grams").cast("long").as("n_grams"),
        round(col("dup_cnt") / col("n_grams"), 6).as("dup_frac"),
        round(col("top_cnt") / col("n_grams"), 6).as("top_frac"))
  }
}
