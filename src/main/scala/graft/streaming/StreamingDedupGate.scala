package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming twin of the maintained ExactSubstr gram prefilter (q314;
  * round-12 verdict #6): arriving documents are FLAGGED at ingest time
  * against the duplicated-gram table as of the previous committed state
  * — "does this doc carry a ≥ minLen-char span the corpus has already
  * seen?", the gate that decides whether the heavyweight suffix
  * machinery (q307/q315) ever needs to look at a doc — and then their
  * own gram counts FOLD in as a log-structured segment, so later
  * arrivals are gated against them too.
  *
  * The layout mirrors [[StreamingIndex]] one table down. Counts are the
  * ONLY state and they are purely ADDITIVE, so this index needs no
  * tombstone machinery and no ordering rule at all: integer addition
  * commutes, hence any interleaving of folds and retractions merges to
  * the same table — a takedown is just a segment with NEGATED counts
  * ([[retractBatch]]), the q314 algebra verbatim.
  * {{{
  *   dir/counts/d=<name>/   the segment's own (g, cnt) contribution
  *   dir/commits/<name>     marker: segment fully written
  * }}}
  * [[loadCounts]] merges on read by exact BIGINT sums (zeroed rows
  * drop), bit-identical to [[Dedup.dupGramCounts]] over everything
  * ingested minus everything retracted. Crash safety is
  * commit-marker-last, exactly the [[StreamingIvf]]/[[StreamingIndex]]
  * protocol: gate output and fold are each idempotent per segment name,
  * and a replayed batch reads the identical pre-batch state (its own
  * name excluded), so kill-and-resume converges to the batch rebuild —
  * the ScaleSpec capstone equality.
  *
  * 100 TB shape: the maintained table is the corpus's gram-count
  * surface (g-bucketed in the batch artifact; segment files here), the
  * per-batch fold writes O(|batch|) rows and never rewrites history,
  * and the gate itself is one semi-join of the batch's gram stream
  * against the `cnt ≥ 2` slice — at production duplication rates a
  * small fraction of the table, broadcastable per micro-batch.
  */
object StreamingDedupGate {

  /** Names of fully-written segments, sorted for deterministic plans
    * (order is cosmetic — additive segments commute). Protocol:
    * [[SegmentCommits]].
    */
  def committedSegments(dir: String): Seq[String] =
    SegmentCommits.committed(dir)

  /** Marker-last, and SKIP-IF-COMMITTED: a replayed batch whose segment
    * already carries a commit marker writes nothing — its contents are
    * deterministic, so skipping equals rewriting, and the skip closes
    * the double-kill window where an overwrite-in-progress briefly
    * leaves a valid marker pointing at a half-deleted parquet dir.
    */
  private def writeSegment(counts: DataFrame, dir: String,
      name: String): Unit =
    if (!SegmentCommits.isCommitted(dir, name)) {
      // gram-key format stamp (round-15 advisor): marks a fresh store,
      // fails fast on a fold into one written at a different key width
      Dedup.stampGramKeyFormat(dir)
      counts.write.mode("overwrite").parquet(s"$dir/counts/d=$name")
      SegmentCommits.commit(dir, name)
    }

  /** One-time bootstrap: the historical corpus's counts as `base`. */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, textCol: String, minLen: Int): Unit =
    writeSegment(Dedup.dupGramCounts(corpus, idCol, textCol, minLen),
      dir, "base")

  /** The maintained count table as of the committed segments (optionally
    * excluding one — the gate path excludes the in-flight batch's own
    * name so replays see the identical pre-batch state).
    */
  def loadCounts(spark: SparkSession, dir: String,
      excluding: Option[String] = None): DataFrame = {
    val names = committedSegments(dir).filterNot(excluding.contains)
    require(names.nonEmpty, s"no committed segments under $dir — run init()")
    Dedup.checkGramKeyFormat(dir, "streaming gram-count store")
    spark.read.parquet(names.map(n => s"$dir/counts/d=$n"): _*)
      .groupBy(col("g")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)
  }

  /** Takedown through the additive algebra: the batch's own counts,
    * negated, as one O(|batch|) segment — nothing else is touched, and
    * [[loadCounts]]'s sum drops the zeroed grams. Idempotent per `name`.
    */
  def retractBatch(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int, name: String): Unit =
    writeSegment(Dedup.dupGramCounts(docs, idCol, textCol, minLen)
      .withColumn("cnt", -col("cnt")), dir, name)

  /** Start the gate stream over raw documents: each micro-batch is
    * flagged against the pre-batch table — per arriving doc, the number
    * of gram positions whose gram the corpus already holds ≥ 2 times
    * ([[Dedup.dupGramStats]]'s serve, `(id, n_dup_gram_positions)`,
    * flagged docs only), landing under `outDir/d=b<batchId>` marker-last
    * — and then folded in as segment `b<batchId>`.
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
          // same skip-if-committed discipline for the gate output
          if (!SegmentCommits.isCommitted(outDir, name)) {
            val pre = loadCounts(spark, dir, excluding = Some(name))
            Dedup.dupGramStats(batch, idCol, textCol, minLen, pre)
              .write.mode("overwrite").parquet(s"$outDir/d=$name")
            SegmentCommits.commit(outDir, name)
          }
          writeSegment(
            Dedup.dupGramCounts(batch, idCol, textCol, minLen), dir, name)
        }
      }
      .start()
}
