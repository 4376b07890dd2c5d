package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming twin of the INCREMENTAL ExactSubstr removal (q315; round-13
  * verdict #3) — [[StreamingDedupGate]] one table deeper. The gate
  * maintains gram COUNTS and can only say "this doc carries a seen
  * span"; the removal needs POSTINGS `(g, id, n)` to resolve WITNESSES
  * ("which documents hold this duplicated gram"), so this twin maintains
  * the postings table as additive log-structured segments and serves
  * [[Dedup.exactSubstrRemoveIncremental]] for every arriving batch in
  * `foreachBatch` — the day's cleaned batch emitted at ingest time, the
  * historical corpus never rescanned.
  *
  * The algebra is [[Dedup.combineGramPostings]] verbatim, one segment
  * per batch: postings are additive on `(g, id)` (integer sums commute,
  * so segments need no LSM ordering rule and no tombstones), and a
  * takedown is a segment with NEGATED `n` ([[retractBatch]]) — zeroed
  * rows drop in the merge-on-read sum. Because the removal's serve also
  * needs witness TEXTS, each segment carries the batch's raw docs next
  * to its postings; a retracted doc's net postings are zero, so it is
  * never selected as a witness and its stale text rows are unreachable
  * by the serve — [[loadDocs]] still anti-joins the retracted-id
  * segments so the doc surface itself reads clean.
  * {{{
  *   dir/postings/d=<name>/   the segment's (g, id, n) contribution
  *   dir/docs/d=<name>/       the segment's raw (id, text) rows
  *   dir/retracted/d=<name>/  retraction segments only: the taken-down ids
  *   dir/commits/<name>       marker: segment fully written (LAST)
  * }}}
  * Crash safety is commit-marker-last with skip-if-committed on both the
  * emitted output and the segment ([[StreamingDedupGate]]'s protocol):
  * a replayed batch reads the identical pre-batch state (its own name
  * excluded), recomputes deterministically, and skips anything already
  * committed — kill-and-resume converges to the batch q315 on all
  * observables (postings table, served removal rows, doc store), the
  * ScaleSpec equality.
  *
  * 100 TB shape: per batch the fold writes O(|batch| postings) rows and
  * never rewrites history; the serve's work is the batch's duplication
  * NEIGHBORHOOD (changed ∪ witnesses — measured at production rates in
  * `INC_LEG_CHAR.json`), resolved by keyed posting reads, never a corpus
  * rescan. Segment-count growth is bounded operationally by compacting:
  * the merged table IS a valid single segment, so a compaction is one
  * read-merge-write under a fresh name — the same observation
  * [[StreamingIndex]] acts on.
  */
object StreamingGramPostings {

  /** Names of fully-written segments, sorted for deterministic plans
    * (order is cosmetic — additive segments commute). Protocol:
    * [[SegmentCommits]].
    */
  def committedSegments(dir: String): Seq[String] =
    SegmentCommits.committed(dir)

  /** Marker-last ingest segment: postings AND the batch's docs, then the
    * marker. Skip-if-committed — a replay's contents are deterministic,
    * so skipping equals rewriting and closes the double-kill window.
    */
  private def writeSegment(dir: String, name: String, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int): Unit =
    if (!SegmentCommits.isCommitted(dir, name)) {
      Dedup.gramPostings(docs, idCol, textCol, minLen)
        .write.mode("overwrite").parquet(s"$dir/postings/d=$name")
      docs.select(col(idCol).as("id"),
          col(textCol).cast("string").as("text"))
        .write.mode("overwrite").parquet(s"$dir/docs/d=$name")
      SegmentCommits.commit(dir, name)
    }

  /** One-time bootstrap: the historical corpus as segment `base`. */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, textCol: String, minLen: Int): Unit =
    writeSegment(dir, "base", corpus, idCol, textCol, minLen)

  /** Batch-side fold: the day's docs enter as ONE additive segment
    * without a stream — exactly [[start]]'s per-micro-batch segment
    * write, callable from a batch maintenance job (the
    * [[StreamingIvf.foldBatch]] shape). Marker-last, skip-if-committed,
    * O(|docs| postings), history untouched.
    */
  def foldBatch(dir: String, docs: DataFrame, idCol: String,
      textCol: String, minLen: Int, name: String): Unit =
    writeSegment(dir, name, docs, idCol, textCol, minLen)

  /** The maintained postings table as of the committed segments
    * ([[Dedup.combineGramPostings]]'s fold over all of them at once —
    * one keyed sum, zeroed rows drop). `excluding` lets an in-flight
    * batch read the identical pre-batch state on replay.
    */
  def loadPostings(spark: SparkSession, dir: String,
      excluding: Option[String] = None): DataFrame = {
    val names = committedSegments(dir).filterNot(excluding.contains)
    require(names.nonEmpty, s"no committed segments under $dir — run init()")
    spark.read.parquet(names.map(n => s"$dir/postings/d=$n"): _*)
      .groupBy(col("g"), col("id")).agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0)
  }

  /** The doc store as of the committed segments: union of ingest
    * segments' docs minus every retracted id (the anti-join side is
    * takedown-sized — broadcastable).
    */
  def loadDocs(spark: SparkSession, dir: String,
      excluding: Option[String] = None): DataFrame = {
    val names = committedSegments(dir).filterNot(excluding.contains)
    require(names.nonEmpty, s"no committed segments under $dir — run init()")
    val docSegs = names.filter(n =>
      Files.exists(Paths.get(s"$dir/docs/d=$n")))
    val docs = spark.read.parquet(docSegs.map(n => s"$dir/docs/d=$n"): _*)
    val retracted = names.filter(n =>
      Files.exists(Paths.get(s"$dir/retracted/d=$n")))
    if (retracted.isEmpty) docs
    else docs.join(
      broadcast(spark.read
        .parquet(retracted.map(n => s"$dir/retracted/d=$n"): _*)
        .select(col("id")).distinct()),
      Seq("id"), "left_anti")
  }

  /** Takedown through the additive algebra: one segment holding the
    * batch's postings NEGATED plus its id list for the doc store's
    * anti-join. O(|takedown|), idempotent per `name`, nothing else
    * touched.
    */
  def retractBatch(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int, name: String): Unit =
    if (!SegmentCommits.isCommitted(dir, name)) {
      Dedup.gramPostings(docs, idCol, textCol, minLen)
        .withColumn("n", -col("n"))
        .write.mode("overwrite").parquet(s"$dir/postings/d=$name")
      docs.select(col(idCol).cast("long").as("id")).distinct()
        .write.mode("overwrite").parquet(s"$dir/retracted/d=$name")
      SegmentCommits.commit(dir, name)
    }

  /** LSM COMPACTION — [[StreamingIvf.compact]]'s contract for the
    * postings store: the committed view is rewritten as a single fresh
    * `base` segment in `intoDir`, reclaiming the per-segment read
    * amplification the fold path accumulates (one `d=b<id>` directory
    * per micro-batch forever). The merged postings table IS a valid
    * segment — folding an already-merged table is the identity on the
    * keyed sums — and retractions MATERIALIZE: zeroed `(g, id)` rows
    * have already dropped in the merge-on-read sum and retracted docs
    * leave the doc store through the anti-join, so the compacted store
    * carries no `retracted/` segments at all. Crash protocol is the
    * folds' commit-marker-LAST: a compaction killed mid-write leaves
    * `intoDir` without a committed segment, which [[loadPostings]] /
    * [[loadDocs]] REFUSE to read (their `require` fails); re-running
    * compact overwrites it with identical content — the source store is
    * untouched throughout, which is why the target must differ from it
    * (an in-place rewrite would consume the parquet directories it is
    * overwriting).
    */
  def compact(spark: SparkSession, dir: String, intoDir: String): Unit = {
    require(new java.io.File(intoDir).getCanonicalPath !=
      new java.io.File(dir).getCanonicalPath,
      s"compact target must differ from the source store dir: $dir")
    loadPostings(spark, dir).write.mode("overwrite")
      .parquet(s"$intoDir/postings/d=base")
    loadDocs(spark, dir).write.mode("overwrite")
      .parquet(s"$intoDir/docs/d=base")
    SegmentCommits.commit(intoDir, "base")
  }

  /** Start the ingest stream: each micro-batch folds its postings/docs
    * in as segment `b<batchId>` AFTER serving the incremental removal
    * for exactly that batch — `(id, clean_text, removed_chars)` for the
    * batch's changed neighborhood, written under `outDir/d=b<batchId>`
    * marker-last. The serve composes the pre-batch state (own name
    * excluded, so replays are deterministic) with the batch's own rows
    * in memory, matching q315's "batch already folded in" contract
    * without requiring the segment write to land first.
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame,
      idCol: String, textCol: String, minLen: Int, outDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("200 milliseconds"))
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val name = s"b$batchId"
          if (!SegmentCommits.isCommitted(outDir, name)) {
            val pre = loadPostings(spark, dir, excluding = Some(name))
            val folded = Dedup.combineGramPostings(pre,
              Dedup.gramPostings(batch, idCol, textCol, minLen))
            val corpus = loadDocs(spark, dir, excluding = Some(name))
              .select(col("id").as(idCol), col("text").as(textCol))
              .unionByName(batch.select(col(idCol), col(textCol)))
            Dedup.exactSubstrRemoveIncremental(corpus, idCol, textCol,
                minLen, folded, batch.select(col(idCol)))
              .write.mode("overwrite").parquet(s"$outDir/d=$name")
            SegmentCommits.commit(outDir, name)
          }
          writeSegment(dir, name, batch, idCol, textCol, minLen)
        }
      }
      .start()
}
