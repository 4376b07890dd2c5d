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
  * [[StreamingIndex]] acts on — and [[start]] now ENFORCES the measured
  * cadence itself (round-15 verdict #4): `STREAM_AMP.json` derived
  * `policy_max_segments = 65` (the largest segment count whose serve
  * stays within 25 % of the single-segment wall), but nothing acted on
  * it — a long-running pipeline had to remember to call [[compact]].
  * `start(maxSegments = …)` auto-compacts in `foreachBatch` once the
  * committed segment count reaches the policy.
  *
  * IN-PLACE compaction needs one more mechanism, because [[compact]]'s
  * contract (target ≠ source: the overwrite would consume the parquet
  * dirs it reads) collides with a stream whose store path is fixed.
  * [[compactInPlace]] adds EPOCH INDIRECTION, the LevelDB CURRENT-file
  * pattern: the live payload lives in `dir` itself (epoch 0) or in
  * `dir/epoch_<n>`, named by the one-line `dir/CURRENT` file; every
  * reader/writer resolves through it. A compaction writes the merged
  * store into the NEXT epoch dir (an ordinary [[compact]] — marker-last,
  * source untouched) and publishes with one ATOMIC rename of CURRENT:
  * a crash anywhere before the flip leaves debris the next attempt
  * ignores (fresh epoch number), a crash after it leaves a fully
  * compacted store. The flip keeps its immediate predecessor epoch on
  * disk for in-flight readers (the [[graft.sources.Generations]]
  * retention rule) and reaps everything older.
  *
  * REPLAY across a compaction is the subtle case: skip-if-committed
  * used to gate on the segment's commit marker, but a compaction MERGES
  * segment b's rows into the new epoch's base and the new epoch has no
  * `b` marker — a crash between the flip and the stream's own
  * checkpoint commit would replay batch b and double-fold it. So every
  * fold additionally records its segment name in a `folded` namespace
  * that compaction CARRIES into the new epoch before the flip: the
  * skip gate is "name present in `folded` (or `commits`)", which
  * survives any number of compactions. Marker order per fold is
  * payload → commits → folded; a crash between the last two replays
  * into a deterministic overwrite plus idempotent re-commit, so the
  * gate converges without ever hiding a torn payload.
  */
object StreamingGramPostings {

  /** The measured compaction cadence (`STREAM_AMP.json`, round 15): the
    * largest segment count whose merge-on-read serve stayed within 25 %
    * of the single-segment wall on the sf0.1 corpus. [[start]]'s
    * default; override per deployment where the serve floor differs.
    */
  val PolicyMaxSegments = 65

  private val FoldedNs = "folded"

  /** Resolve the live payload root: `dir/CURRENT` names the active
    * epoch subdir when present (a store that has been compacted in
    * place at least once); a fresh store IS its own root — full layout
    * back-compat until the first [[compactInPlace]].
    */
  private def root(dir: String): String = {
    val cur = Paths.get(dir, "CURRENT")
    if (Files.isRegularFile(cur))
      s"$dir/${new String(Files.readAllBytes(cur), "UTF-8").trim}"
    else dir
  }

  /** Has `name` ever been folded into this store? Survives compaction
    * (the `folded` namespace is carried into each new epoch); the
    * plain-commits fallback keeps stores written before the namespace
    * existed readable.
    */
  private def isFolded(r: String, name: String): Boolean =
    SegmentCommits.isCommitted(r, name, FoldedNs) ||
      SegmentCommits.isCommitted(r, name)

  /** Names of fully-written segments, sorted for deterministic plans
    * (order is cosmetic — additive segments commute). Protocol:
    * [[SegmentCommits]].
    */
  def committedSegments(dir: String): Seq[String] =
    SegmentCommits.committed(root(dir))

  /** Marker-last ingest segment: postings AND the batch's docs, then the
    * marker. Skip-if-committed — a replay's contents are deterministic,
    * so skipping equals rewriting and closes the double-kill window.
    * The store carries a gram-key format stamp ([[Dedup.GramKeyFormatId]],
    * round-15 advisor): stamping here — BEFORE the payload — both marks a
    * fresh store and fails fast on a fold into a store written at a
    * different key width, whose segments would otherwise merge into
    * disjoint key spaces silently.
    */
  private def writeSegment(dir: String, name: String, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int): Unit = {
    val r = root(dir)
    if (!isFolded(r, name)) {
      Dedup.stampGramKeyFormat(r)
      Dedup.gramPostings(docs, idCol, textCol, minLen)
        .write.mode("overwrite").parquet(s"$r/postings/d=$name")
      docs.select(col(idCol).as("id"),
          col(textCol).cast("string").as("text"))
        .write.mode("overwrite").parquet(s"$r/docs/d=$name")
      SegmentCommits.commit(r, name)
      SegmentCommits.commit(r, name, FoldedNs) // LAST: the replay gate
    }
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
    val r = root(dir)
    val names = SegmentCommits.committed(r).filterNot(excluding.contains)
    require(names.nonEmpty, s"no committed segments under $dir — run init()")
    Dedup.checkGramKeyFormat(r, "streaming gram-postings store")
    spark.read.parquet(names.map(n => s"$r/postings/d=$n"): _*)
      .groupBy(col("g"), col("id")).agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0)
  }

  /** The doc store as of the committed segments: union of ingest
    * segments' docs minus every retracted id (the anti-join side is
    * takedown-sized — broadcastable).
    */
  def loadDocs(spark: SparkSession, dir: String,
      excluding: Option[String] = None): DataFrame = {
    val r = root(dir)
    val names = SegmentCommits.committed(r).filterNot(excluding.contains)
    require(names.nonEmpty, s"no committed segments under $dir — run init()")
    Dedup.checkGramKeyFormat(r, "streaming gram-postings store")
    val docSegs = names.filter(n =>
      Files.exists(Paths.get(s"$r/docs/d=$n")))
    val docs = spark.read.parquet(docSegs.map(n => s"$r/docs/d=$n"): _*)
    val retracted = names.filter(n =>
      Files.exists(Paths.get(s"$r/retracted/d=$n")))
    if (retracted.isEmpty) docs
    else docs.join(
      broadcast(spark.read
        .parquet(retracted.map(n => s"$r/retracted/d=$n"): _*)
        .select(col("id")).distinct()),
      Seq("id"), "left_anti")
  }

  /** Takedown through the additive algebra: one segment holding the
    * batch's postings NEGATED plus its id list for the doc store's
    * anti-join. O(|takedown|), idempotent per `name`, nothing else
    * touched.
    */
  def retractBatch(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, minLen: Int, name: String): Unit = {
    val r = root(dir)
    if (!isFolded(r, name)) {
      Dedup.stampGramKeyFormat(r)
      Dedup.gramPostings(docs, idCol, textCol, minLen)
        .withColumn("n", -col("n"))
        .write.mode("overwrite").parquet(s"$r/postings/d=$name")
      docs.select(col(idCol).cast("long").as("id")).distinct()
        .write.mode("overwrite").parquet(s"$r/retracted/d=$name")
      SegmentCommits.commit(r, name)
      SegmentCommits.commit(r, name, FoldedNs) // LAST: the replay gate
    }
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
    val srcRoot = root(dir)
    require(new java.io.File(intoDir).getCanonicalPath !=
      new java.io.File(dir).getCanonicalPath &&
      new java.io.File(intoDir).getCanonicalPath !=
      new java.io.File(srcRoot).getCanonicalPath,
      s"compact target must differ from the source store dir: $dir")
    Dedup.stampGramKeyFormat(intoDir) // source checked by loadPostings
    loadPostings(spark, dir).write.mode("overwrite")
      .parquet(s"$intoDir/postings/d=base")
    loadDocs(spark, dir).write.mode("overwrite")
      .parquet(s"$intoDir/docs/d=base")
    SegmentCommits.commit(intoDir, "base")
    // carry the fold-name memory: a batch merged into this base must
    // still be recognized as folded by a post-compaction replay (see
    // object scaladoc) — markers are cheap empty files, one per name
    // ever folded
    (SegmentCommits.committed(srcRoot) ++
        SegmentCommits.committed(srcRoot, FoldedNs) :+ "base")
      .distinct.foreach(n => SegmentCommits.commit(intoDir, n, FoldedNs))
  }

  /** Compact the store IN PLACE via epoch indirection (object scaladoc):
    * merge the live payload into the next `epoch_<n>` subdir with an
    * ordinary [[compact]], publish with one atomic rename of
    * `dir/CURRENT`, keep the immediate predecessor epoch for in-flight
    * readers, and reap everything older. Crash-safe at every point: the
    * source epoch is never mutated, an unpublished target epoch is
    * invisible debris, and the flip is a single rename.
    */
  def compactInPlace(spark: SparkSession, dir: String): Unit = {
    val cur = root(dir)
    val d = new java.io.File(dir)
    val epochNums = Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("epoch_"))
      .flatMap(_.stripPrefix("epoch_").toLongOption)
    val next = (0L +: epochNums).max + 1
    compact(spark, dir, s"$dir/epoch_$next")
    // the atomic publish: CURRENT flips to the new epoch or not at all
    val tmp = Paths.get(dir,
      s".CURRENT_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    Files.write(tmp, s"epoch_$next".getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, "CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // reap: keep the predecessor (`cur`) for in-flight readers, delete
    // older epoch dirs (published-and-superseded or crash debris alike);
    // once the ROOT layout (epoch 0) is no longer the predecessor, its
    // payload dirs go too
    val curName = new java.io.File(cur).getCanonicalPath
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith("epoch_") &&
          f.getName.stripPrefix("epoch_").toLongOption.exists(_ < next) &&
          f.getCanonicalPath != curName)
        graft.operators.Dedup.deleteRecursively(f)
    }
    if (curName != d.getCanonicalPath)
      Seq("postings", "docs", "retracted", "commits", FoldedNs,
          "_GRAM_KEY_FORMAT")
        .foreach(n => graft.operators.Dedup.deleteRecursively(
          new java.io.File(d, n)))
  }

  /** Start the ingest stream: each micro-batch folds its postings/docs
    * in as segment `b<batchId>` AFTER serving the incremental removal
    * for exactly that batch — `(id, clean_text, removed_chars)` for the
    * batch's changed neighborhood, written under `outDir/d=b<batchId>`
    * marker-last. The serve composes the pre-batch state (own name
    * excluded, so replays are deterministic) with the batch's own rows
    * in memory, matching q315's "batch already folded in" contract
    * without requiring the segment write to land first.
    *
    * `maxSegments` (round-15 verdict #4) enforces the MEASURED
    * compaction cadence: once the committed segment count reaches it,
    * the batch's fold is followed by [[compactInPlace]] — bounding the
    * per-serve merge-on-read amplification at the `STREAM_AMP.json`
    * policy point (serve ≤ 1.25× the single-segment wall) instead of
    * leaving the compaction to operator memory. 0 disables.
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame,
      idCol: String, textCol: String, minLen: Int, outDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("200 milliseconds"),
      maxSegments: Int = PolicyMaxSegments): StreamingQuery =
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
          // the measured cadence, enforced: one read-merge-write + one
          // atomic CURRENT flip per `maxSegments` folds; a crash
          // anywhere inside it leaves the pre-compaction store serving
          // and the next trigger retries with a fresh epoch number
          if (maxSegments > 0 &&
              SegmentCommits.committed(root(dir)).size >= maxSegments)
            compactInPlace(spark, dir)
        }
      }
      .start()
}
