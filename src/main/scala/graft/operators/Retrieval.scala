package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained RETRIEVAL INDEX — the q135/q142/q211
  * delta==rebuild pattern applied to lexical search. The reference keeps its
  * whole store live in memory and rebuilds derived state on every read
  * (`ingestService.js:3`); at 100 TB the analogous cost is rebuilding
  * postings + document frequencies + avgdl from scratch per run — exactly
  * the way index build dominated ANN before q142. This module makes the
  * inverted index a FIRST-CLASS persisted artifact:
  *
  *   - [[RetrievalIndex.postings]]  (term_bucket, term, doc_id, tf,
  *     positions) — the posting lists, directory-partitioned by a stable
  *     md5 bucket of the term so a query's scan prunes to its buckets;
  *   - [[RetrievalIndex.terms]]     (term, df) — document frequencies,
  *     maintained additively;
  *   - [[RetrievalIndex.docs]]      (doc_id, dl) — document lengths (the
  *     avgdl numerator is their sum);
  *   - [[RetrievalIndex.stats]]     one row (s_total, n_docs) — the exact
  *     BIGINT corpus scalars BM25 needs (avgdl = s_total / n_docs is never
  *     materialized as a float; the scoring rational clears it).
  *
  * Maintenance ([[applyIndexDelta]]) folds a new document batch in
  * O(|delta| postings): new postings append (new doc ids are new posting
  * rows — old lists never rewrite because a posting's key is (term, doc)),
  * df adds per-term, dl appends, the two scalars add. Every piece is
  * integer arithmetic, so delta-maintained == full-rebuild bit-for-bit:
  * q213 proves the postings surface (through a save→load disk round-trip)
  * and q214 proves df/dl/stats by reproducing q149's BM25 scores from the
  * maintained tables alone.
  *
  * PRECONDITION (the append-only ingest contract): the delta batch's doc
  * ids are disjoint from the indexed corpus. A re-ingested doc needs its
  * old postings retracted first — [[retractDocs]] implements exactly that
  * negated algebra (anti-join the doc ids out of postings/docs, subtract
  * their term counts from terms/stats, drop df=0 terms), and
  * [[upsertDocs]] composes retract-then-append for the update path.
  */
object Retrieval {

  /** In-flight handle: four DataFrames, all integer-exact. */
  final case class RetrievalIndex(postings: DataFrame, terms: DataFrame,
      docs: DataFrame, stats: DataFrame)

  private val TermBuckets = 64

  /** Stable term → directory bucket (md5, engine-portable like
    * [[Curation.hashBucket]]): the partition-pruning key for term lookups.
    */
  def termBucket(term: Column): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % TermBuckets

  /** Build the index from a tokenized corpus: one posexplode + one
    * (term, doc) aggregate (the only data-sized shuffle), then the three
    * derived tables are aggregates of the postings/doc relation. Positions
    * ride along per posting (sorted, so every downstream serialization is
    * deterministic) — they make the index serve phrase/NEAR queries, not
    * just BM25.
    */
  def buildIndex(docs: DataFrame, idCol: String, tokCol: String)
      : RetrievalIndex = {
    val post = docs
      .select(col(idCol).as("doc_id"),
        posexplode(col(tokCol)).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("term_bucket", termBucket(col("term")))
      .select(col("term_bucket"), col("term"), col("doc_id"), col("tf"),
        col("positions"))
    val terms = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = docs.filter(size(col(tokCol)) > 0)
      .select(col(idCol).as("doc_id"), size(col(tokCol)).cast("long").as("dl"))
    val stats = docs.agg(
      coalesce(sum(size(col(tokCol)).cast("long")), lit(0L)).as("s_total"),
      coalesce(sum(when(size(col(tokCol)) > 0, 1L).otherwise(0L)), lit(0L))
        .as("n_docs"))
    RetrievalIndex(post, terms, dl, stats)
  }

  /** Persist under `dir`: postings as true on-disk inverted lists —
    * directory-partitioned by term_bucket (a query's terms hash to their
    * buckets, so the scan prunes to those directories), files bounded and
    * (term, doc_id)-sorted so each term's list is contiguous. The three
    * small tables coalesce to single files.
    */
  def saveIndex(index: RetrievalIndex, dir: String,
      maxRecordsPerFile: Long = 1L << 20): Unit =
    graft.sources.Generations.save(dir) { g =>
      // the four tables land in DISJOINT subdirs of the staged
      // generation, so their write jobs are independent — run them on a
      // small pool (optimization round 16, guide §2.6) instead of four
      // driver-serial write jobs; the generation still commits only
      // after every write returns, so crash-atomicity is unchanged
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val writes = Seq(
          scala.concurrent.Future {
            Curation.writeShards(index.postings, s"$g/postings",
              Seq("term_bucket"), maxRecordsPerFile,
              Seq(col("term"), col("doc_id")))
          },
          scala.concurrent.Future(index.terms.coalesce(1).write
            .mode("overwrite").parquet(s"$g/terms")),
          scala.concurrent.Future(index.docs.coalesce(1).write
            .mode("overwrite").parquet(s"$g/docs")),
          scala.concurrent.Future(index.stats.coalesce(1).write
            .mode("overwrite").parquet(s"$g/stats")))
        writes.foreach(scala.concurrent.Await.result(_,
          scala.concurrent.duration.Duration.Inf))
      } finally { pool.shutdown(); () }
    }: Unit

  /** Load a persisted index; column order re-pinned (partitionBy moved
    * term_bucket to the directory level).
    */
  def loadIndex(spark: SparkSession, dir: String): RetrievalIndex = {
    val g = graft.sources.Generations.loadPath(dir)
    RetrievalIndex(
      spark.read.parquet(s"$g/postings")
        .select(col("term_bucket").cast("long").as("term_bucket"),
          col("term"), col("doc_id"), col("tf"), col("positions")),
      spark.read.parquet(s"$g/terms").select(col("term"), col("df")),
      spark.read.parquet(s"$g/docs").select(col("doc_id"), col("dl")),
      spark.read.parquet(s"$g/stats").select(col("s_total"), col("n_docs")))
  }

  /** Fold a new document batch into the index WITHOUT rebuilding — work is
    * O(|delta| postings), never O(corpus):
    *   - postings: the batch's own (term, doc) lists append (disjoint doc
    *     ids ⇒ no existing posting row changes);
    *   - terms: per-term df adds via a full outer join keyed on the
    *     DELTA's term set — the maintained side shuffles only the terms
    *     the batch touches after a partition-pruned read at 100 TB (and
    *     an untouched term's (term, df) row passes through unchanged);
    *   - docs: new dl rows append;
    *   - stats: the two BIGINT scalars add (1-row cross join).
    * Everything is integer, so the folded index is bit-identical to
    * [[buildIndex]] over old ∪ new — the q213/q214 hash proofs.
    */
  def applyIndexDelta(index: RetrievalIndex, newDocs: DataFrame,
      idCol: String, tokCol: String): RetrievalIndex = {
    val delta = buildIndex(newDocs, idCol, tokCol)
    val terms = index.terms.select(col("term"), col("df").as("_df_old"))
      .join(delta.terms.select(col("term"), col("df").as("_df_new")),
        Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("_df_old"), lit(0L)) + coalesce(col("_df_new"), lit(0L)))
          .as("df"))
    val stats = index.stats
      .select(col("s_total").as("_s0"), col("n_docs").as("_n0"))
      .crossJoin(delta.stats)
      .select((col("_s0") + col("s_total")).as("s_total"),
        (col("_n0") + col("n_docs")).as("n_docs"))
    RetrievalIndex(
      index.postings.unionByName(delta.postings),
      terms,
      index.docs.unionByName(delta.docs),
      stats)
  }

  /** RETRACTION — the negated [[applyIndexDelta]] algebra, closing the
    * append-only precondition: takedown/opt-out and re-ingest both need
    * documents to LEAVE the index without a rebuild.
    *
    *   - postings/docs: anti-join the retracted ids out (a takedown set is
    *     small ⇒ broadcast anti-join — one pass over the inverted lists,
    *     no shuffle of the index);
    *   - terms: subtract the retracted docs' per-term document counts —
    *     computed from the retracted POSTINGS rows themselves, so the
    *     subtraction is exactly the counts those docs contributed — and
    *     drop terms whose df reaches 0 (buildIndex never emits a df=0
    *     term, so keeping them would break the rebuild hash);
    *   - stats: subtract the retracted docs' Σdl and doc count (1-row
    *     broadcast cross join).
    *
    * Work is O(index scan) map-side + an aggregate over the RETRACTED
    * postings only; the terms join broadcasts that (small) per-term
    * subtraction. Ids absent from the index subtract nothing — retraction
    * is idempotent, and `retract ∘ append == identity` over the index
    * surface (property-tested in `GraftProperties`; q246/q247 carry the
    * delta==rebuild hash proof against the (corpus ∖ deleted) ∪ updated
    * rebuild through a disk round-trip).
    */
  def retractDocs(index: RetrievalIndex, docIds: DataFrame,
      idCol: String): RetrievalIndex = {
    val ids = broadcast(docIds.select(col(idCol).as("doc_id")).distinct())
    val gone = index.postings.join(ids, Seq("doc_id"), "left_semi")
    val dfGone = gone.groupBy(col("term")).agg(count(lit(1)).as("_df_gone"))
    val terms = index.terms.join(broadcast(dfGone), Seq("term"), "left")
      .select(col("term"),
        (col("df") - coalesce(col("_df_gone"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    val statsGone = index.docs.join(ids, Seq("doc_id"), "left_semi")
      .agg(coalesce(sum(col("dl")), lit(0L)).as("_s_gone"),
        count(lit(1)).as("_n_gone"))
    val stats = index.stats.crossJoin(broadcast(statsGone))
      .select((col("s_total") - col("_s_gone")).as("s_total"),
        (col("n_docs") - col("_n_gone")).as("n_docs"))
    RetrievalIndex(
      index.postings.join(ids, Seq("doc_id"), "left_anti")
        .select(col("term_bucket"), col("term"), col("doc_id"), col("tf"),
          col("positions")),
      terms,
      index.docs.join(ids, Seq("doc_id"), "left_anti"),
      stats)
  }

  /** RE-INGEST (update in place, the one behavior of the reference's
    * mutable store — `ingestService.js:128-134` — the append-only delta
    * path couldn't reproduce): retract the batch's ids, then fold the
    * batch's new content in. After the retract the ids are disjoint from
    * the index again, so [[applyIndexDelta]]'s precondition holds by
    * construction; docs NOT previously indexed retract nothing and simply
    * append — upsert semantics, one code path.
    */
  def upsertDocs(index: RetrievalIndex, docs: DataFrame, idCol: String,
      tokCol: String): RetrievalIndex =
    applyIndexDelta(retractDocs(index, docs.select(col(idCol)), idCol),
      docs, idCol, tokCol)

  /** The q132 inverted-index surface served FROM the index (token,
    * doc_freq, n_postings, deterministic "doc:pos" postings string) — the
    * delta==rebuild observable for the postings table. Per-posting entry
    * strings are row-local; one term-keyed aggregate flattens and
    * byte-sorts them exactly like the from-scratch build.
    */
  def invertedIndexFromIndex(index: RetrievalIndex): DataFrame =
    index.postings
      .select(col("term").as("token"), col("doc_id"), col("tf"),
        transform(col("positions"),
          p => concat(col("doc_id"), lit(":"), p)).as("entries"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"),
        sum(col("tf")).as("n_postings"),
        array_join(sort_array(flatten(collect_list(col("entries")))), ",")
          .as("postings"))

  /** BM25 served from the MAINTAINED tables alone — same arithmetic as
    * [[TextAnalysis.bm25TopDocs]] expression-for-expression (scaled-BIGINT
    * ratio idf capped at [[TextAnalysis.RarityCap]], ×20S integer rational
    * for the tf saturation, one IEEE division per (term, doc), round 6),
    * but tf comes from postings, df from the terms table, dl from docs and
    * (s_total, n_docs) from stats — the corpus is NEVER rescanned. The
    * postings read broadcast-prunes to the query terms (and, on a loaded
    * index, partition-prunes to their term_buckets); df/stats ride a
    * broadcast. Reproducing q149's scores from these tables is the proof
    * that df/dl/stats maintenance is exact (q214).
    */
  def bm25FromIndex(index: RetrievalIndex, queryTerms: DataFrame, k: Int,
      scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val scored = termDocScores(index, queryTerms, scale)
    Relational.topKPerGroup(scored, Seq(col("term")),
        Seq(col("score").desc, col("doc_id").asc), k, "rank")
      .select(col("term"), col("doc_id"), col("rank").cast("long").as("rank"),
        col("score"))
  }

  /** The per-(term, doc) BM25 relation both serve paths rank over. */
  private def termDocScores(index: RetrievalIndex, queryTerms: DataFrame,
      scale: Long): DataFrame = {
    val q = queryTerms.select(col("term")).distinct()
    val tf = index.postings.join(broadcast(q), Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"))
    val idf = index.terms.join(broadcast(q), Seq("term"))
      .crossJoin(broadcast(index.stats))
      .select(col("term"), least(floor(lit(scale.toDouble) *
          (lit(2) * col("n_docs") - lit(2) * col("df") + lit(1)) /
          (lit(2) * col("df") + lit(1))), lit(TextAnalysis.RarityCap))
        .cast("long").as("idf_scaled"))
    tf.join(broadcast(idf), Seq("term"))
      .join(index.docs, Seq("doc_id"))
      .crossJoin(broadcast(index.stats))
      .withColumn("score", round(
        col("idf_scaled") *
          (lit(44.0) * col("s_total") * col("tf")) /
          (lit(20.0) * col("s_total") * col("tf") + lit(6.0) * col("s_total")
            + lit(18.0) * col("dl") * col("n_docs")) /
          lit(scale.toDouble), 6))
  }

  /** Per-DOCUMENT BM25 for a multi-term query, served from the maintained
    * tables: Σ over the query's terms of the per-(term, doc) score, then
    * the top-`k` documents (score desc, doc asc). This is the serve-path
    * shape a search frontend calls per query — the postings read prunes to
    * the query's terms (broadcast semi-join; term_bucket partition pruning
    * on a loaded index), so per-query cost is O(matched postings), never
    * O(index).
    */
  def bm25QueryFromIndex(index: RetrievalIndex, queryTerms: DataFrame,
      k: Int, scale: Long = 1000000L): DataFrame =
    bm25QueriesFromIndex(index,
      queryTerms.select(lit(0L).as("_q"), col("term")), "_q", k, scale)
      .drop("_q")

  /** The BATCH serve path: many queries at once — `queryTerms` carries
    * (queryCol, term) — amortizing job scheduling across the whole query
    * set; per-query work is unchanged (postings prune to the union of the
    * queries' terms, scoring keys on (query, doc)). One job serves the
    * fleet: this is how a Spark retrieval layer actually serves load, with
    * the one-query form above as the latency path.
    */
  def bm25QueriesFromIndex(index: RetrievalIndex, queryTerms: DataFrame,
      queryCol: String, k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val q = queryTerms.select(col(queryCol), col("term")).distinct()
    val perDoc = termDocScores(index, q.select(col("term")), scale)
      .join(broadcast(q), Seq("term"))
      .groupBy(col(queryCol), col("doc_id"))
      .agg(round(sum(col("score")), 6).as("score"))
    Relational.topKPerGroup(perDoc, Seq(col(queryCol)),
        Seq(col("score").desc, col("doc_id").asc), k, "rank")
      .select(col(queryCol), col("doc_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** Exact phrase search served from the MAINTAINED index — the positional
    * payload earning its keep: slot i of the phrase reads term i's posting
    * list (on a loaded index: partition-pruned to that term's bucket),
    * explodes its positions re-keyed to `anchor = pos − i`, and the k-term
    * phrase becomes k−1 equi-joins on (doc, anchor) —
    * [[TextAnalysis.phraseSearch]]'s plan, but the corpus is NEVER
    * rescanned: tf/df/dl aside, positions too survive delta, retraction,
    * and upsert (q246 hash-proves the maintained positions byte-for-byte;
    * q253 proves the phrase SERVE path over a retracted index against an
    * independent string-space oracle).
    */
  def phraseFromIndex(index: RetrievalIndex, phrase: Seq[String])
      : DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val slots = phrase.zipWithIndex.map { case (w, i) =>
      index.postings.filter(col("term") === w)
        .select(col("doc_id"), explode(col("positions")).as("pos"))
        .select(col("doc_id"), (col("pos") - i).as("anchor"))
    }
    slots.reduce((a, b) => a.join(b, Seq("doc_id", "anchor")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Total-occurrence top terms from the index (the q149 query-derivation
    * served without touching the corpus): Σtf per term, (count desc, term
    * asc) total order.
    */
  def topTermsFromIndex(index: RetrievalIndex, k: Int): DataFrame =
    index.postings.groupBy(col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .select(col("term"))

  /** SNIPPET extraction from the positions lists — the serve step after
    * ranking: for every (term, doc) in the BM25 top-`k`, the best
    * `windowTokens`-token window — the one holding the MOST occurrences
    * of the term, earliest start on ties — exactly what a result page
    * highlights. This gives the positions column its post-ranking
    * consumer (phrase/NEAR consume it pre-ranking).
    *
    * All integers: occurrence counting is a `RANGE BETWEEN CURRENT ROW
    * AND w−1 FOLLOWING` count over each posting's sorted positions (the
    * per-(term, doc) window rides one keyed exchange), and best-window
    * selection is rank pushdown. The postings read prunes to the query's
    * terms and the ranked docs before positions ever explode.
    */
  def snippetsFromIndex(index: RetrievalIndex, queryTerms: DataFrame,
      k: Int, windowTokens: Int): DataFrame = {
    require(windowTokens >= 1,
      s"windowTokens must be positive, got $windowTokens")
    val ranked = bm25FromIndex(index, queryTerms, k)
      .select(col("term"), col("doc_id"), col("rank"))
    val pos = index.postings
      .join(broadcast(queryTerms.select(col("term")).distinct()),
        Seq("term"), "left_semi")
      .join(ranked.select(col("term"), col("doc_id")),
        Seq("term", "doc_id"), "left_semi")
      .select(col("term"), col("doc_id"),
        explode(col("positions")).as("pos"))
    val w = Window.partitionBy(col("term"), col("doc_id"))
      .orderBy(col("pos"))
      .rangeBetween(Window.currentRow, windowTokens - 1)
    val hits = pos.withColumn("n_hits", count(lit(1)).over(w))
    Relational.topKPerGroup(hits, Seq(col("term"), col("doc_id")),
        Seq(col("n_hits").desc, col("pos").asc), 1, "wrank")
      .join(ranked, Seq("term", "doc_id"))
      .select(col("term"), col("doc_id"), col("rank"),
        col("pos").as("window_start"), col("n_hits"))
  }

  /** QUERY-LIKELIHOOD retrieval with Dirichlet smoothing (Zhai &
    * Lafferty, SIGIR 2001) served from the maintained tables — the
    * language-modeling counterpart to [[bm25FromIndex]], completing the
    * classic probabilistic-retrieval pair. Per query term t and doc d:
    *
    *   p(t|d) = (tf + μ·cf_t/S) / (dl + μ)
    *
    * with cf_t the COLLECTION frequency (Σ tf over t's postings) and S
    * the corpus token total — both read from the index, never the
    * corpus. Smoothing means EVERY doc scores against every query term
    * (a doc without the term still carries the background probability —
    * that is the model's point), so the score relation is docs ×
    * queryTerms with tf left-joined in.
    *
    * Engine-exact evaluation: the per-term value is the exact BIGINT
    * rational `(tf·S + μ·cf)·1000` over `(dl + μ)·S` resolved by ONE
    * IEEE division and rounded to 9 decimals (the bm25 discipline; the
    * ×1000 keeps sub-1 probabilities meaningful at that rounding), and
    * the query score is the term values' product in FIXED query-rank
    * order `(v1·v2)·v3` — explicit parenthesization, because IEEE
    * multiplication is commutative but not associative, and a partial
    * aggregate's fold order would differ by partitioning. Rank order is
    * identical to the log-space formulation (log is monotone; products
    * of positives preserve order), with none of log's cross-engine
    * last-ulp risk.
    *
    * Scale shape: cf is a pruned postings read (the query's terms only);
    * the docs table crossJoins the tiny (term, cf) broadcast (nTerms
    * rows) and left-joins tf on (term, doc_id); the global top-k is a
    * TakeOrderedAndProject. Nothing rescans text.
    */
  def queryLikelihoodFromIndex(index: RetrievalIndex, nTerms: Int,
      mu: Long, k: Int): DataFrame = {
    require(nTerms >= 1 && nTerms <= 8, s"nTerms must be in [1,8]: $nTerms")
    require(mu >= 1, s"mu must be positive, got $mu")
    require(k >= 1, s"k must be positive, got $k")
    val qterms = broadcast(
      index.postings.groupBy(col("term"))
        .agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc)
        .limit(nTerms)
        .select(col("term"),
          row_number().over(Window.orderBy(col("cnt").desc, col("term").asc))
            .as("trank"))
        .select(col("term"), col("trank")))
    val cf = broadcast(index.postings
      .join(qterms.select(col("term")), Seq("term"), "left_semi")
      .groupBy(col("term")).agg(sum(col("tf")).as("cf")))
    val tfs = index.postings
      .join(qterms.select(col("term")), Seq("term"), "left_semi")
      .select(col("term"), col("doc_id"), col("tf"))
    val stats = broadcast(index.stats.select(col("s_total")))
    val vals = index.docs
      .crossJoin(qterms.join(cf, Seq("term")))
      .join(tfs, Seq("term", "doc_id"), "left")
      .withColumn("tf", coalesce(col("tf"), lit(0L)))
      .crossJoin(stats)
      .withColumn("v", round(
        ((col("tf") * col("s_total") + lit(mu) * col("cf")) * lit(1000L))
          / ((col("dl") + lit(mu)) * col("s_total")), 9))
    val pivots = (1 to nTerms).map(r =>
      max(when(col("trank") === r, col("v"))).as(s"v$r"))
    val scored = vals.groupBy(col("doc_id"))
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("score", round(
        (2 to nTerms).foldLeft(col("v1"))((acc, r) => acc * col(s"v$r")), 6))
      // a corpus with fewer than nTerms distinct terms leaves pivot
      // columns null — emit nothing rather than null-scored ranks
      .filter(col("score").isNotNull)
      .select(col("doc_id"), col("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc,
          col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rank"), col("score"))
  }
}
