package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Quality, Relational}
import graft.sources.Tables

/** END-TO-END TAKEDOWN CAPSTONE (q262) — the GDPR story as one proof.
  *
  * One takedown set (ids ≡ 3 mod 10, the convention every per-surface
  * retraction proof q246–q249/q255/q260 already uses) flows through EVERY
  * persisted surface of the engine, and every serve path is then read
  * from the MAINTAINED (retracted) state:
  *
  *   - the inverted index's postings surface (q246 chain),
  *   - BM25 served from the maintained df/dl/stats tables (q247 chain),
  *   - IVF ANN top-k from the retracted inverted lists (q248 chain),
  *   - near-dup candidate pairs over retracted signatures (q249 chain),
  *   - connected-component labels after confined recompute (q255 chain),
  *   - the packed training tape after suffix repack (q260 chain),
  *   - Merkle bucket checksums advanced by the deletion delta (q141's
  *     algebra on the documents table),
  *   - the persisted MRL hot tier after anti-join retraction, served
  *     through q271's tiered shortlist+re-rank (q301 chain, round 11),
  *   - the NB quality classifier's count table after the negated fold,
  *     decisions served on the kept held-out slice (q308 chain, round 12),
  *   - the bigram-LM count table, same retraction algebra, fluency
  *     scores served on the kept slice (q309 chain, round 12),
  *   - the dedup prefilter's gram-count table after the negated fold,
  *     per-doc duplicated-gram counts served over the kept corpus
  *     (q314 chain, round 12),
  *   - the incremental removal's gram POSTINGS table after the negated
  *     fold, per-doc distinct dup-partner counts served from the
  *     retracted postings (q315 chain, round 13),
  *   - the STREAMING postings store's merge-on-read state after the
  *     takedown enters as one negated-postings segment — the same
  *     partner-count serve read through `StreamingGramPostings`'s
  *     additive-segment algebra instead of the batch combine
  *     (round 14; the streaming twin joins the oracled gate).
  *
  * Each serve output reduces to ONE row: (surface, n_rows, fold,
  * deleted_refs) where `fold` is the order-independent BIGINT sum of a
  * 40-bit md5 prefix over the surface's canonical row string (the q136
  * checksum recipe applied to query RESULTS — 40 bits × ≤10⁵ rows stays
  * far from 2⁶³), and `deleted_refs` counts rows whose id-typed columns
  * reference a takedown id. The DuckDB oracle computes the SAME reduction
  * over the REBUILT-from-scratch serves (each per-surface oracle reused
  * verbatim as a subquery — the capstone cannot drift from the
  * per-surface proofs). Hash match ⇒ every serve over maintained state ==
  * the serve over (corpus ∖ deleted) rebuilt state, AND deleted_refs == 0
  * on both sides ⇒ the takedown ids are unfindable through every path.
  */
object CapstoneQueries {

  /** The per-surface maintained-state serves, by query name — reusing the
    * exact lambdas the per-surface proofs run, so the capstone and the
    * individual proofs cannot diverge.
    */
  private def maintained(name: String): (SparkSession, String) => DataFrame =
    (TextQueries.extraQueries ++ DedupQueries.queries ++
      SimilarityQueries.extraQueries ++ CurationQueries.queries)(name)

  private def perSurfaceOracle(name: String): String =
    (TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ CurationQueries.oracles)(name)

  /** One surface folded to one row. `refCols` are the id-typed columns
    * checked against the takedown set (empty ⇒ deleted_refs 0 by
    * construction, e.g. the aggregated postings surface).
    */
  private def fold(df: DataFrame, surface: String, rowStr: Column,
      refCols: Seq[Column]): DataFrame = {
    val refHit =
      if (refCols.isEmpty) lit(false)
      else refCols.map(c => c % 10 === 3).reduce(_ || _)
    df.agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(conv(substring(md5(rowStr), 1, 10), 16, 10)
          .cast("long")), lit(0L)).as("fold"),
        coalesce(sum(when(refHit, 1L).otherwise(0L)), lit(0L))
          .as("deleted_refs"))
      .select(lit(surface).as("surface"), col("n_rows"), col("fold"),
        col("deleted_refs"))
  }

  /** DuckDB mirror of [[fold]], wrapping a per-surface oracle verbatim. */
  private def foldSql(surface: String, sql: String, rowExpr: String,
      refExpr: String): String =
    s"""SELECT '$surface' AS surface, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(coalesce(sum(('0x' || substr(md5($rowExpr), 1, 10))::BIGINT),
       |         0) AS BIGINT) AS fold,
       |       CAST(coalesce(sum(CASE WHEN $refExpr THEN 1 ELSE 0 END), 0)
       |         AS BIGINT) AS deleted_refs
       |FROM (
       |$sql
       |) t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q262_takedown_capstone" -> ((s, d) => {
      // The 13 surfaces are INDEPENDENT pipelines, so each builds as a
      // Future on a small pool (optimization round 16, guide §2.6
      // "overlap independent jobs"): the eager per-surface work —
      // generation saves, checkpoint jobs, star-contraction loops, the
      // streaming store's segment writes — overlaps instead of running
      // strictly serially on the driver, whose per-surface jobs left
      // the 32-way executor mostly idle (measured at sf0.1: serial
      // construction was most of the capstone's 39 s). Job submission
      // from driver threads is Spark's documented concurrency model;
      // artifact dirs are per-surface; the awaited union preserves
      // surface order, so the output is bit-identical to the serial
      // build.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      def sFut(df: => DataFrame): scala.concurrent.Future[DataFrame] =
        scala.concurrent.Future(df)
      // surfaces 1-6: the maintained-state serves of the per-surface
      // retraction proofs, reduced to canonical-row folds
      val postings = sFut(fold(maintained("q246_index_retract")(s, d), "postings",
        concat_ws("|", col("token"), col("doc_freq"), col("n_postings"),
          col("postings")), Seq.empty))
      val bm25 = sFut(fold(maintained("q247_bm25_after_retract")(s, d), "bm25",
        concat_ws("|", col("term"), col("doc_id"), col("rank"),
          round(col("score") * 1e6).cast("long")), Seq(col("doc_id"))))
      val ivf = sFut(fold(maintained("q248_ivf_retract")(s, d), "ivf",
        concat_ws("|", col("query_id"), col("neighbor_id"), col("rank"),
          round(col("sim") * 1e6).cast("long")), Seq(col("neighbor_id"))))
      val dedup = sFut(fold(maintained("q249_dedup_retract")(s, d), "dedup",
        concat_ws("|", col("doc_a"), col("doc_b"),
          round(col("jac") * 1e6).cast("long")),
        Seq(col("doc_a"), col("doc_b"))))
      val cc = sFut(fold(maintained("q255_cc_retract")(s, d), "cc",
        concat_ws("|", col("vec_id"), col("cluster_id"),
          col("is_canonical").cast("string")),
        Seq(col("vec_id"), col("cluster_id"))))
      val tape = sFut(fold(maintained("q260_pack_retract")(s, d), "tape",
        concat_ws("|", col("seq_id"), col("doc_id"), col("offset_in_seq"),
          col("tokens_in_seq")), Seq(col("doc_id"))))
      // surface 7: Merkle bucket checksums of the documents table,
      // advanced by the deletion delta (q141's signed-digest algebra) —
      // never rescanning the kept rows. Buckets fully emptied by the
      // takedown drop out (the rebuild never emits them).
      val docsC = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("source"), col("n_chars"))
      val ckCols = Seq(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))
      val diff = Relational.snapshotDiff(docsC,
        docsC.filter(col("doc_id") % 10 =!= 3), Seq("doc_id"),
        Seq("lang", "source", "n_chars"))
      val ck = sFut(fold(
        Quality.applyChecksumDelta(
            Quality.tableChecksum(docsC, "doc_id", ckCols, 64), diff,
            "doc_id", Seq("lang", "source", "n_chars"), 64)
          .filter(col("n_rows") > 0),
        "checksum",
        concat_ws("|", col("bucket"), col("n_rows"), col("checksum")),
        Seq.empty))
      // surface 8 (round 11): the persisted MRL hot tier (q301) after
      // takedown — the tier is a projection, so retraction is the plain
      // anti-join; the serve runs q271's shortlist+re-rank from the
      // RETRACTED tier against the retracted full-vector store, and the
      // oracle rebuilds the whole tiered serve from (corpus ∖ deleted)
      import graft.operators.Similarity
      graft.functions.GraftFunctions.register(s)
      val emb = Similarity.prepared(Tables.embeddings(s, d), "embedding")
        .select(col("vec_id"), col("vec"), col("nrm")).cache()
      val kept = emb.filter(col("vec_id") % 10 =!= 3)
      val tier = Similarity.retractFromMrlTier(
        Similarity.buildMrlTier(emb, 32),
        emb.filter(col("vec_id") % 10 === 3).select(col("vec_id")))
      val mrl = sFut(fold(
        Similarity.mrlRerankTopK(tier, kept, kept.filter(col("vec_id") < 5),
          dims = 32, shortlist = 50, k = 10),
        "mrl",
        concat_ws("|", col("query_id"), col("neighbor_id"), col("rank"),
          round(col("sim") * 1e6).cast("long")),
        Seq(col("query_id"), col("neighbor_id"))))
      // surfaces 9-10 (round 12): the persisted learned filters
      // (q308/q309's NB and bigram-LM count tables) after takedown —
      // the takedown docs' counts leave via the NEGATED FOLD (the
      // additive-table retraction, property-tested) and decisions are
      // served on the KEPT held-out slice; the oracle rebuilds both
      // models from (train ∖ deleted). Float outputs fold through
      // floor(fmod(x, 2^20)·10⁶): fmod and floor are IEEE-exact on the
      // already-hash-proven served doubles, engine-independently —
      // round() tie conventions and float-to-string formats are not.
      import graft.operators.Eval
      val docsT = Tables.documents(s, d)
        .select(col("doc_id"), (col("lang") === "en").as("y"),
          graft.operators.Dedup.tokens(col("text")).as("tok"))
        .withColumn("bkt",
          graft.operators.Curation.hashBucket(col("doc_id"), 100))
      val trainT = docsT.filter(col("bkt") < 70)
      val servT = docsT.filter(col("bkt") >= 70 && col("doc_id") % 10 =!= 3)
      val nbCnt = Eval.nbCombineCounts(
        Eval.nbCounts(trainT, "doc_id", "tok", col("y"), 64),
        Eval.negateCounts(Eval.nbCounts(
          trainT.filter(col("doc_id") % 10 === 3),
          "doc_id", "tok", col("y"), 64)))
      val nb = sFut(fold(
        Eval.nbClassify(servT, "doc_id", "tok", nbCnt, 64)
          .join(docsT.select(col("doc_id"), col("y")), Seq("doc_id")),
        "nb",
        concat_ws("|", col("doc_id"), col("n_toks"),
          floor((col("odds") % 1048576.0d) * 1e6).cast("long"),
          col("pred").cast("string"), col("y").cast("string")),
        Seq(col("doc_id"))))
      val lmCnt = Eval.bigramLmCombineCounts(
        Eval.bigramLmCounts(trainT, "doc_id", "tok", 4096),
        Eval.negateCounts(Eval.bigramLmCounts(
          trainT.filter(col("doc_id") % 10 === 3),
          "doc_id", "tok", 4096)))
      val lm = sFut(fold(
        Eval.bigramLmScore(servT, "doc_id", "tok", lmCnt, 4096),
        "lm",
        concat_ws("|", col("id"), col("n_bigrams"),
          floor((col("score") % 1048576.0d) * 1e6).cast("long")),
        Seq(col("id"))))
      // surface 11 (round 12): the dedup prefilter's gram-count table
      // (q314) after takedown — the deleted docs' one-pass counts leave
      // via the negated fold (counts(full) ⊖ counts(deleted) ==
      // counts(kept) by additivity, never rescanning the kept corpus),
      // and the prefilter is served over the kept docs from the
      // retracted table; the oracle rebuilds from (docs ∖ deleted).
      import graft.operators.Dedup
      val docsRaw = Tables.documents(s, d)
      val keptDocs = docsRaw.filter(col("doc_id") % 10 =!= 3)
      val gramCnt = Dedup.combineGramCounts(
        Dedup.dupGramCounts(docsRaw, "doc_id", "text", 30),
        Dedup.dupGramCounts(docsRaw.filter(col("doc_id") % 10 === 3),
          "doc_id", "text", 30).withColumn("cnt", -col("cnt")))
      val gram = sFut(fold(
        Dedup.dupGramStats(keptDocs, "doc_id", "text", 30, gramCnt),
        "gram",
        concat_ws("|", col("id"), col("n_dup_gram_positions")),
        Seq(col("id"))))
      // surface 12 (round 13): the incremental removal's gram POSTINGS
      // table (q315) after takedown — the deleted docs' doc-level
      // postings leave via the same negated fold (additivity zeroes
      // exactly their (g, id) rows, so the retracted table references no
      // deleted id at all), and the serve is the read only postings can
      // answer: per kept doc, the number of DISTINCT partner docs
      // sharing at least one duplicated 30-gram — the witness-resolution
      // surface q315's changed-set machinery is built on. The oracle
      // rebuilds the partner counts from (docs ∖ deleted).
      val postT = Dedup.combineGramPostings(
        Dedup.gramPostings(docsRaw, "doc_id", "text", 30),
        Dedup.gramPostings(docsRaw.filter(col("doc_id") % 10 === 3),
          "doc_id", "text", 30).withColumn("n", -col("n")))
      val gpost = sFut(fold(
        partnerCounts(postT.select(col("g"), col("id"))),
        "gpost",
        concat_ws("|", col("id"), col("n_dup_partners")),
        Seq(col("id"))))
      // surface 13 (round 14): the STREAMING postings store — the same
      // postings state reached through StreamingGramPostings' additive
      // segment algebra (bootstrap = one base segment over the full
      // corpus, takedown = one negated-postings segment) instead of the
      // in-memory batch combine above. loadPostings' merge-on-read fold
      // over the commit-marker-last segments must be bit-identical to
      // the rebuild, so the serve is surface 12's partner-count read and
      // the ORACLE is surface 12's rebuilt SQL verbatim — the streaming
      // twin's equality claim lands in the DuckDB-oracled gate instead
      // of only ScalaTest. Both writes are skip-if-committed, so the
      // bench's repeat runs re-serve without re-folding.
      import graft.streaming.StreamingGramPostings
      val segs = sFut {
        val segDir = Tables.artifactDir("capsegs", d)
        StreamingGramPostings.init(s, segDir, docsRaw, "doc_id", "text", 30)
        StreamingGramPostings.retractBatch(s, segDir,
          docsRaw.filter(col("doc_id") % 10 === 3), "doc_id", "text", 30,
          "takedown")
        fold(
          partnerCounts(StreamingGramPostings.loadPostings(s, segDir)
            .select(col("g"), col("id"))),
          "segs",
          concat_ws("|", col("id"), col("n_dup_partners")),
          Seq(col("id")))
      }
      try Seq(postings, bm25, ivf, dedup, cc, tape, ck, mrl, nb, lm,
          gram, gpost, segs)
        .map(scala.concurrent.Await.result(_,
          scala.concurrent.duration.Duration.Inf))
        .reduce(_ unionByName _)
      finally { pool.shutdown(); () }
    }))

  /** Per-doc DISTINCT dup-partner counts over a `(g, id)` posting
    * relation — the witness-resolution serve of capstone surfaces 12
    * and 13. Both join sides first restrict to grams with ≥ 2 posting
    * rows (optimization round 16): a single-posting gram can only
    * produce the self-pair the `id ≠ id2` filter drops, so the
    * restriction is output-identical while the self-join's input falls
    * from every posting row to the duplicated slice (guide §3.2 —
    * pre-filter the big side of a join when the filter is selective).
    */
  private def partnerCounts(pd: DataFrame): DataFrame = {
    val dupG = pd.groupBy(col("g")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= 2).select(col("g"))
    val slim = pd.join(dupG, Seq("g"), "left_semi")
    slim.join(slim.select(col("g"), col("id").as("id2")), Seq("g"))
      .filter(col("id") =!= col("id2"))
      .groupBy(col("id"))
      .agg(count_distinct(col("id2")).as("n_dup_partners"))
  }

  val oracles: Map[String, String] = Map(
    "q262_takedown_capstone" -> Seq(
      foldSql("postings", perSurfaceOracle("q246_index_retract"),
        "t.token || '|' || t.doc_freq || '|' || t.n_postings || '|' || " +
          "t.postings",
        "FALSE"),
      foldSql("bm25", perSurfaceOracle("q247_bm25_after_retract"),
        "t.term || '|' || t.doc_id || '|' || t.rank || '|' || " +
          "CAST(round(t.score * 1000000) AS BIGINT)",
        "t.doc_id % 10 = 3"),
      foldSql("ivf", perSurfaceOracle("q248_ivf_retract"),
        "t.query_id || '|' || t.neighbor_id || '|' || t.rank || '|' || " +
          "CAST(round(t.sim * 1000000) AS BIGINT)",
        "t.neighbor_id % 10 = 3"),
      foldSql("dedup", perSurfaceOracle("q249_dedup_retract"),
        "t.doc_a || '|' || t.doc_b || '|' || " +
          "CAST(round(t.jac * 1000000) AS BIGINT)",
        "t.doc_a % 10 = 3 OR t.doc_b % 10 = 3"),
      foldSql("cc", perSurfaceOracle("q255_cc_retract"),
        "t.vec_id || '|' || t.cluster_id || '|' || " +
          "CAST(t.is_canonical AS VARCHAR)",
        "t.vec_id % 10 = 3 OR t.cluster_id % 10 = 3"),
      foldSql("tape", perSurfaceOracle("q260_pack_retract"),
        "t.seq_id || '|' || t.doc_id || '|' || t.offset_in_seq || '|' || " +
          "t.tokens_in_seq",
        "t.doc_id % 10 = 3"),
      foldSql("checksum",
        """WITH dk AS (
          |  SELECT doc_id, lang, source, n_chars FROM documents
          |  WHERE doc_id % 10 <> 3
          |)
          |SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |         % 64 AS bucket,
          |       CAST(count(*) AS BIGINT) AS n_rows,
          |       CAST(sum(('0x' || substr(md5(
          |         coalesce(CAST(doc_id AS VARCHAR), '') || '|' ||
          |         coalesce(lang, '') || '|' ||
          |         coalesce(source, '') || '|' ||
          |         coalesce(CAST(n_chars AS VARCHAR), '')), 1, 8))
          |         ::BIGINT) AS BIGINT) AS checksum
          |FROM dk GROUP BY 1""".stripMargin,
        "t.bucket || '|' || t.n_rows || '|' || t.checksum",
        "FALSE"),
      foldSql("mrl",
        """WITH v AS (
          |  SELECT vec_id,
          |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
          |  FROM embeddings WHERE vec_id % 10 <> 3
          |), n AS (
          |  SELECT vec_id, vec, sqrt(list_dot_product(vec, vec)) AS nrm
          |  FROM v
          |), t32 AS (
          |  SELECT vec_id, vec[1:32] AS v,
          |         sqrt(list_dot_product(vec[1:32], vec[1:32])) AS nr
          |  FROM n
          |), sl AS (
          |  SELECT query_id, neighbor_id FROM (
          |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |           row_number() OVER (PARTITION BY q.vec_id
          |             ORDER BY round(list_dot_product(q.v, c.v)
          |               / (q.nr * c.nr), 6) DESC, c.vec_id ASC) AS srank
          |    FROM t32 q, t32 c
          |    WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id) z
          |  WHERE srank <= 50
          |), rr AS (
          |  SELECT s.query_id, s.neighbor_id,
          |         round(list_dot_product(q.vec, c.vec)
          |           / (q.nrm * c.nrm), 6) AS sim
          |  FROM sl s JOIN n q ON s.query_id = q.vec_id
          |            JOIN n c ON s.neighbor_id = c.vec_id
          |)
          |SELECT query_id, neighbor_id, rank, sim FROM (
          |  SELECT query_id, neighbor_id, sim,
          |         row_number() OVER (PARTITION BY query_id
          |           ORDER BY sim DESC, neighbor_id ASC) AS rank
          |  FROM rr) z
          |WHERE rank <= 10""".stripMargin,
        "t.query_id || '|' || t.neighbor_id || '|' || t.rank || '|' || " +
          "CAST(round(t.sim * 1000000) AS BIGINT)",
        "t.query_id % 10 = 3 OR t.neighbor_id % 10 = 3"),
      foldSql("nb", EvalQueries.NbTakedownSql,
        "t.doc_id || '|' || t.n_toks || '|' || " +
          "CAST(floor(fmod(t.odds, 1048576.0) * 1000000) AS BIGINT) || " +
          "'|' || CAST(t.pred AS VARCHAR) || '|' || CAST(t.y AS VARCHAR)",
        "t.doc_id % 10 = 3"),
      foldSql("lm", EvalQueries.BigramLmTakedownSql,
        "t.doc_id || '|' || t.n_bigrams || '|' || " +
          "CAST(floor(fmod(t.score, 1048576.0) * 1000000) AS BIGINT)",
        "t.doc_id % 10 = 3"),
      foldSql("gram",
        """WITH dk AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3
          |), g AS (
          |  SELECT doc_id,
          |         ('0x' || substr(md5(substr(text, CAST(i AS INT) + 1, 30)),
          |           1, 15))::BIGINT AS g
          |  FROM dk,
          |       LATERAL unnest(range(0, greatest(length(text) - 29, 0))) t(i)
          |), dup AS (
          |  SELECT g FROM g GROUP BY g HAVING count(*) >= 2
          |)
          |SELECT doc_id,
          |       CAST(count(*) AS BIGINT) AS n_dup_gram_positions
          |FROM g WHERE g IN (SELECT g FROM dup)
          |GROUP BY doc_id""".stripMargin,
        "t.doc_id || '|' || t.n_dup_gram_positions",
        "t.doc_id % 10 = 3"),
      foldSql("gpost", GpostRebuildSql,
        "t.doc_id || '|' || t.n_dup_partners",
        "t.doc_id % 10 = 3"),
      // surface 13: the streaming postings store serves the SAME state
      // the batch combine reaches, so its rebuilt oracle is surface 12's
      // verbatim — only the surface tag differs. A Spark-side divergence
      // between the segment fold and the batch combine would hash-split
      // the two rows.
      foldSql("segs", GpostRebuildSql,
        "t.doc_id || '|' || t.n_dup_partners",
        "t.doc_id % 10 = 3")
    ).mkString("\nUNION ALL\n"))

  /** Surface 12's rebuilt partner counts over (docs ∖ deleted) — shared
    * with surface 13, whose claim is exactly that the streaming segment
    * algebra reaches this same state. (`lazy`: referenced from the
    * `oracles` val defined ABOVE — eager order would capture null.)
    */
  private lazy val GpostRebuildSql =
    """WITH dk AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3
      |), g AS (
      |  SELECT doc_id,
      |         ('0x' || substr(md5(substr(text, CAST(i AS INT) + 1, 30)),
      |           1, 15))::BIGINT AS g
      |  FROM dk,
      |       LATERAL unnest(range(0, greatest(length(text) - 29, 0))) t(i)
      |), pd AS (
      |  SELECT DISTINCT doc_id, g FROM g
      |)
      |SELECT a.doc_id,
      |       CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_dup_partners
      |FROM pd a JOIN pd b ON a.g = b.g AND a.doc_id <> b.doc_id
      |GROUP BY a.doc_id""".stripMargin
}
