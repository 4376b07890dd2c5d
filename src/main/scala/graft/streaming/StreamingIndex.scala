package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Retrieval
import graft.operators.Retrieval.RetrievalIndex

/** Streaming retrieval-index ingestion: the q213/q214 delta-maintained
  * inverted index wired into Structured Streaming — [[StreamingIvf]]'s
  * probe-then-fold contract applied to lexical search. Each arriving
  * document batch is (1) PROBED against the index as of the previous
  * committed state — the serve path: "what does the corpus already hold
  * that reads like this?", the lexical arrival-novelty check — and then
  * (2) FOLDED into the index as a new posting segment.
  *
  * On-disk layout is LOG-STRUCTURED (all parquet): every index table is a
  * directory of per-delta segments, because every piece of BM25 state is
  * ADDITIVE —
  * {{{
  *   dir/postings/d=<name>/   posting rows (disjoint doc ids ⇒ pure append)
  *   dir/terms/d=<name>/      the delta's OWN per-term df contribution
  *   dir/docs/d=<name>/       new (doc_id, dl) rows
  *   dir/stats/d=<name>/      the delta's (s_total, n_docs) one-row frame
  *   dir/commits/<name>       marker: segment <name> is fully written
  * }}}
  * [[loadIndex]] merges on read: postings/docs union, df sums per term,
  * the scalars sum — exact BIGINT adds, so the merged view is bit-identical
  * to a from-scratch [[Retrieval.buildIndex]] over everything ingested
  * (the ScaleSpec capstone equality). A fold therefore writes O(|batch|)
  * rows and NEVER rewrites existing segments — the LSM economics; read
  * amplification from many small segments is reclaimed by [[compact]],
  * which rewrites the merged view as a single `base` segment (same
  * marker-last protocol, same bit-identical contract).
  *
  * Crash safety is commit-marker-last, exactly [[StreamingIvf]]'s
  * protocol: a fold killed mid-write leaves an uncommitted segment that
  * loadIndex ignores; Structured Streaming replays the batch (same
  * batchId) and the rewrite is deterministic (buildIndex of the same
  * rows), so kill-and-resume converges to the batch rebuild. The probe
  * loads the index EXCLUDING the current batch's own segment, so a
  * replay after a committed fold probes the same pre-batch state and a
  * document never matches itself.
  */
object StreamingIndex {

  /** Names of fully-written segments, sorted for deterministic plans.
    * Protocol: [[SegmentCommits]].
    */
  def committedDeltas(dir: String): Seq[String] =
    SegmentCommits.committed(dir)

  private val TombstoneNs = "tombstone_commits"

  /** Names of fully-written tombstone batches. */
  def committedTombstones(dir: String): Seq[String] =
    SegmentCommits.committed(dir, TombstoneNs)

  /** LSM DELETE markers: takedown ids land as an O(|batch|) tombstone
    * segment — no index body is touched at write time; [[loadIndex]]
    * applies the accumulated tombstones on read through the EXACT
    * [[Retrieval.retractDocs]] algebra (anti-join postings/docs, subtract
    * df, drop df=0 terms, subtract the scalars — all lazy), and
    * [[compact]] materializes the retraction and clears the markers.
    * Same commit-marker-last crash protocol as the folds; idempotent per
    * `name` and per id (retracting an absent or doubly-tombstoned id
    * subtracts nothing).
    *
    * CONTRACT (ordered LSM, round 10): ops apply in name order — "base"
    * pinned first, then NATURAL order ([[LsmOps.naturalOrder]]: digit
    * runs compare numerically, so the streaming path's unpadded
    * `b<batchId>` names sort in arrival order past 10 batches); at equal
    * names the tombstone applies BEFORE the same-named segment
    * ([[LsmOps]]). A tombstone therefore suppresses its ids in every
    * EARLIER segment and leaves later folds alone — the standard LSM
    * sequence rule, which is what makes the one-batch [[upsertBatch]]
    * (tombstone + re-fold under one name) well-defined without an
    * intervening [[compact]]. Callers in mixed delete/fold workloads
    * must still pick names whose natural order matches arrival order
    * (additive folds commute, so ordering only matters relative to
    * tombstones).
    */
  def tombstoneDocs(spark: SparkSession, dir: String, docIds: DataFrame,
      name: String): Unit = {
    docIds.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$dir/tombstones/d=$name")
    SegmentCommits.commit(dir, name, TombstoneNs)
  }

  private def writeSegment(dir: String, idx: RetrievalIndex,
      name: String): Unit = {
    idx.postings.write.mode("overwrite").parquet(s"$dir/postings/d=$name")
    idx.terms.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/terms/d=$name")
    idx.docs.write.mode("overwrite").parquet(s"$dir/docs/d=$name")
    idx.stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/stats/d=$name")
    SegmentCommits.commit(dir, name)
  }

  /** One-time bootstrap: index the historical corpus as segment `base`. */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, tokCol: String): Unit =
    writeSegment(dir, Retrieval.buildIndex(corpus, idCol, tokCol), "base")

  /** The index as of the committed segments (optionally excluding one —
    * the probe path excludes the in-flight batch's own name so replays
    * see the identical pre-batch state). df/stats merge by exact BIGINT
    * sums; postings/docs by union — additivity is what makes the
    * log-structured layout equal the monolithic rebuild.
    */
  def loadIndex(spark: SparkSession, dir: String,
      excluding: Option[String] = None): RetrievalIndex = {
    val deltas = committedDeltas(dir).filterNot(excluding.contains)
    require(deltas.nonEmpty, s"no committed segments under $dir — run init()")
    def read(table: String, names: Seq[String]) =
      spark.read.parquet(names.map(n => s"$dir/$table/d=$n"): _*)
    // segments of one run merge additively; each tombstone run then
    // retracts via the exact algebra — ops in LSM name order (LsmOps),
    // so the common all-tombstones-last history is one merge + one
    // retract, and an upsert's re-fold lands AFTER its own tombstone
    def mergeRun(names: Seq[String]): RetrievalIndex = RetrievalIndex(
      read("postings", names).select(col("term_bucket"), col("term"),
        col("doc_id"), col("tf"), col("positions")),
      read("terms", names).groupBy(col("term")).agg(sum(col("df")).as("df")),
      read("docs", names).select(col("doc_id"), col("dl")),
      read("stats", names).agg(sum(col("s_total")).as("s_total"),
        sum(col("n_docs")).as("n_docs")))
    def addRun(ix: RetrievalIndex, names: Seq[String]): RetrievalIndex =
      RetrievalIndex(
        ix.postings.unionByName(read("postings", names)
          .select(col("term_bucket"), col("term"), col("doc_id"),
            col("tf"), col("positions"))),
        ix.terms.unionByName(read("terms", names)
            .select(col("term"), col("df")))
          .groupBy(col("term")).agg(sum(col("df")).as("df")),
        ix.docs.unionByName(read("docs", names)
          .select(col("doc_id"), col("dl"))),
        ix.stats.unionByName(read("stats", names)
            .select(col("s_total"), col("n_docs")))
          .agg(sum(col("s_total")).as("s_total"),
            sum(col("n_docs")).as("n_docs")))
    LsmOps.runs(deltas, committedTombstones(dir))
      .foldLeft(Option.empty[RetrievalIndex]) { (acc, run) =>
        val names = run.map(_.name)
        if (!run.head.tomb)
          Some(acc.map(addRun(_, names)).getOrElse(mergeRun(names)))
        else acc.map(ix => // tombstones before any segment: nothing yet
          Retrieval.retractDocs(ix,
            spark.read.parquet(names.map(n => s"$dir/tombstones/d=$n"): _*),
            "doc_id"))
      }.get // deltas nonEmpty ⇒ defined
  }

  /** RE-INGEST (upsert) through the LSM path, ONE batch — the
    * [[StreamingIvf.upsertBatch]] contract on the lexical index: the
    * batch's doc ids tombstone out (suppressing every earlier posting,
    * df contribution, doc length, and stats share through the exact
    * retraction algebra) and the re-tokenized docs fold in under the
    * SAME name, which sorts after its own tombstone. View == rebuild
    * over (corpus ∖ batch-ids) ∪ batch. Marker-last twice: killed
    * between the commits the view serves the retraction only (valid
    * intermediate); a replay overwrites both deterministically.
    * Idempotent per `name` and per id.
    */
  def upsertBatch(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, tokCol: String, name: String): Unit = {
    tombstoneDocs(spark, dir, batch.select(col(idCol).as("doc_id")), name)
    foldBatch(spark, dir, batch, idCol, tokCol, name)
  }

  /** Fold one tokenized document batch as segment `name` — O(|batch|)
    * postings written, existing segments untouched, marker last.
    * Idempotent per `name`: a replay overwrites the same directories
    * with the same rows.
    */
  def foldBatch(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, tokCol: String, name: String): Unit =
    writeSegment(dir, Retrieval.buildIndex(batch, idCol, tokCol), name)

  /** Rewrite the maintained index as a single fresh `base` segment in
    * `intoDir` — the LSM compaction step reclaiming per-segment read
    * amplification. The compacted index is bit-identical to the
    * multi-segment view (exact-integer merges commute with the rewrite).
    */
  def compact(spark: SparkSession, dir: String, intoDir: String): Unit = {
    // intoDir == dir would have writeSegment overwrite postings/d=base
    // WHILE loadIndex's lazy DataFrames still read those same parquet
    // directories — the rewrite would consume partially-overwritten input
    // and corrupt the index. Compact into a distinct dir (or stage + move).
    require(new java.io.File(intoDir).getCanonicalPath !=
      new java.io.File(dir).getCanonicalPath,
      s"compact target must differ from the source index dir: $dir")
    writeSegment(intoDir, loadIndex(spark, dir), "base")
  }

  /** Start the maintenance stream over tokenized documents (`idCol`,
    * `tokCol`): each micro-batch is probed against the pre-batch index —
    * per arriving doc, its top-`k` BM25-closest indexed documents, the
    * lexical novelty/near-dup serve path; results land under
    * `outDir/d=b<batchId>` with the same marker-last commit — and then
    * folded in as segment `b<batchId>`.
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame,
      idCol: String, tokCol: String, outDir: String, checkpoint: String,
      k: Int, trigger: Trigger = Trigger.ProcessingTime("200 milliseconds"))
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val name = s"b$batchId"
          val idx = loadIndex(spark, dir, excluding = Some(name))
          val queryTerms = batch.select(col(idCol).as("query_doc"),
            explode(col(tokCol)).as("term"))
          Retrieval.bm25QueriesFromIndex(idx, queryTerms, "query_doc", k)
            .write.mode("overwrite").parquet(s"$outDir/d=$name")
          SegmentCommits.commit(outDir, name)
          foldBatch(spark, dir, batch, idCol, tokCol, name)
        }
      }
      .start()
}
