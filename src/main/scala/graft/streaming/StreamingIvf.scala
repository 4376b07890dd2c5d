package graft.streaming


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity
import graft.operators.Similarity.IvfIndex

/** Streaming ANN ingestion: the q142 delta-maintained IVF index wired into
  * Structured Streaming. Arriving vectors are (1) PROBED against the index
  * as of the previous committed state — the serve path: "what does the
  * corpus already hold that looks like this?" — and then (2) FOLDED into
  * the inverted lists via the same frozen-centroid assignment
  * [[Similarity.applyIndexDelta]] proves equal to a full rebuild.
  *
  * On-disk layout (all parquet):
  * {{{
  *   dir/centroids/          frozen centroid table, written once at init
  *   dir/assign/d=base/      the initial corpus assignment
  *   dir/assign/d=b<id>/     one inverted-list delta per folded micro-batch
  *   dir/commits/<name>      marker: delta <name> is fully written
  * }}}
  *
  * Crash safety is commit-marker-last: a fold killed mid-write leaves an
  * uncommitted directory that [[loadIndex]] ignores; Structured Streaming
  * replays the batch (same batchId) and the fold overwrites the partial
  * directory with identical content (assignment against frozen centroids
  * is deterministic), so kill-and-resume converges to exactly the batch
  * rebuild — the capstone assertion in `ScaleSpec`. The probe step loads
  * the index EXCLUDING the current batch's own delta, so a replay after a
  * committed fold still probes the same pre-batch state (idempotent
  * output, and a vector never matches itself).
  *
  * Scale shape: per micro-batch, probe is O(|batch| × k) broadcast-
  * centroid ranking plus a bucket join that shuffles on centroid_id only;
  * fold is O(|batch| × k) map-side assignment and an O(|batch|) parquet
  * append — the full index is never rewritten, mirroring the
  * O(delta)-maintenance economics of the batch path (q142).
  */
object StreamingIvf {

  /** Names of fully-written deltas, sorted for deterministic plans.
    * Protocol: [[SegmentCommits]].
    */
  def committedDeltas(dir: String): Seq[String] =
    SegmentCommits.committed(dir)

  /** One-time index bootstrap: freeze the centroids, assign the historical
    * corpus, commit it as the `base` delta.
    */
  def init(spark: SparkSession, dir: String, corpus: DataFrame,
      centroids: DataFrame): Unit = {
    val idx = Similarity.buildIvfIndex(corpus, centroids)
    idx.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids")
    idx.assignments.write.mode("overwrite").parquet(s"$dir/assign/d=base")
    SegmentCommits.commit(dir, "base")
  }

  private val TombstoneNs = "tombstone_commits"

  /** Names of fully-written tombstone batches. */
  def committedTombstones(dir: String): Seq[String] =
    SegmentCommits.committed(dir, TombstoneNs)

  /** LSM DELETE markers — [[StreamingIndex.tombstoneDocs]]'s contract on
    * the ANN index: takedown vec_ids land as an O(|batch|) tombstone
    * segment, [[loadIndex]] applies them on read through
    * [[Similarity.retractFromIvfIndex]] (a broadcast anti-join — plain
    * rows, nothing else to repair), [[compact]] materializes the deletion
    * and clears the markers. Marker-last, idempotent.
    *
    * ORDERED-LSM semantics (round 10): ops apply in name order ("base"
    * pinned first; at equal names the tombstone applies BEFORE the
    * same-named segment), so a tombstone suppresses its ids in every
    * EARLIER segment and leaves later folds alone — the standard LSM
    * sequence-number rule, and what makes the one-batch
    * [[upsertBatch]] (tombstone + re-fold under one name) well-defined.
    * Name order is NATURAL ([[LsmOps.naturalOrder]]): digit runs compare
    * numerically, so the streaming path's unpadded `b<batchId>` names
    * sort in arrival order past 10 batches with no padding discipline.
    * Callers in mixed delete/fold workloads must still pick names whose
    * natural order matches arrival order (additive folds commute, so
    * ordering only matters relative to tombstones).
    */
  def tombstoneVectors(spark: SparkSession, dir: String, vecIds: DataFrame,
      name: String): Unit = {
    vecIds.select(col("vec_id")).distinct()
      .write.mode("overwrite").parquet(s"$dir/tombstones/d=$name")
    SegmentCommits.commit(dir, name, TombstoneNs)
  }

  /** The index as of the committed deltas (optionally excluding one —
    * the probe path excludes the in-flight batch's own name so replays
    * see the identical pre-batch state), with committed tombstones
    * applied on read in LSM name order (see [[tombstoneVectors]]):
    * fold runs union in, tombstone runs anti-join out, each through the
    * exact [[Similarity.retractFromIvfIndex]] algebra.
    */
  def loadIndex(spark: SparkSession, dir: String,
      excluding: Option[String] = None): IvfIndex = {
    val deltas = committedDeltas(dir).filterNot(excluding.contains)
    require(deltas.nonEmpty, s"no committed deltas under $dir — run init()")
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("vec_id"), col("vec"), col("nrm"))
    val assigns = LsmOps.runs(deltas, committedTombstones(dir))
      .foldLeft(Option.empty[DataFrame]) { (acc, run) =>
        if (!run.head.tomb) {
          val segRows = spark.read
            .parquet(run.map(o => s"$dir/assign/d=${o.name}"): _*)
            .select(col("vec_id"), col("vec"), col("nrm"), col("centroid_id"))
          Some(acc.map(_.unionByName(segRows)).getOrElse(segRows))
        } else acc.map { a =>
          // tombstones before any segment retract from nothing (acc None)
          Similarity.retractFromIvfIndex(IvfIndex(cents, a),
            spark.read.parquet(
              run.map(o => s"$dir/tombstones/d=${o.name}"): _*))
            .assignments
        }
      }
    IvfIndex(cents, assigns.get) // deltas nonEmpty ⇒ defined
  }

  /** Fold one batch of prepared vectors (vec_id, vec, nrm) into the
    * inverted lists: frozen-centroid assignment, delta-only write, marker
    * last. Idempotent per `name` — a replay overwrites the same directory
    * with the same rows.
    */
  def foldBatch(spark: SparkSession, dir: String, batch: DataFrame,
      name: String): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("vec_id"), col("vec"), col("nrm"))
    Similarity.assignToCentroids(batch, cents)
      .select(col("vec_id"), col("vec"), col("nrm"), col("centroid_id"))
      .write.mode("overwrite").parquet(s"$dir/assign/d=$name")
    SegmentCommits.commit(dir, name)
  }

  /** RE-INGEST (upsert) through the LSM path, ONE batch: the batch's ids
    * tombstone out (suppressing every earlier copy) and the new vectors
    * fold in under the SAME name — the tombstone sorts before its
    * same-named segment (see [[tombstoneVectors]]), so the maintained
    * view equals the rebuild over (corpus ∖ batch-ids) ∪ batch, the
    * q257 upsert algebra made streaming. Crash-safe in the established
    * marker-last discipline: killed between the two commits, the view
    * serves the retraction only (a valid intermediate); replaying the
    * batch overwrites both segments deterministically and converges.
    * Idempotent per `name` and per id.
    */
  def upsertBatch(spark: SparkSession, dir: String, batch: DataFrame,
      name: String): Unit = {
    tombstoneVectors(spark, dir, batch.select(col("vec_id")), name)
    foldBatch(spark, dir, batch, name)
  }

  /** LSM COMPACTION for the inverted lists — [[StreamingIndex.compact]]'s
    * contract ported to the ANN index: the fold path accumulates one
    * `d=b<id>` directory per micro-batch forever, so read amplification
    * (files opened per probe) grows without bound; compaction rewrites the
    * committed view as a single fresh `base` delta in `intoDir`.
    * Bit-identity is free here: assignments are plain rows (no aggregate
    * to re-merge), so the compacted index is the same row set read back
    * from one directory — asserted against the batch rebuild in
    * `ScaleSpec`.
    *
    * Same crash protocol as the folds, commit-marker-LAST: a compaction
    * killed mid-write leaves `intoDir` without a committed `base`, which
    * [[loadIndex]] REFUSES to read (require fails) — the half-written
    * target can never serve; re-running compact overwrites it with
    * identical content (the source index is untouched throughout).
    * The source/target must differ for exactly the reason documented at
    * [[StreamingIndex.compact]]: an in-place rewrite would consume the
    * parquet directories it is overwriting.
    */
  def compact(spark: SparkSession, dir: String, intoDir: String): Unit = {
    require(new java.io.File(intoDir).getCanonicalPath !=
      new java.io.File(dir).getCanonicalPath,
      s"compact target must differ from the source index dir: $dir")
    val idx = loadIndex(spark, dir)
    idx.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$intoDir/centroids")
    idx.assignments.write.mode("overwrite")
      .parquet(s"$intoDir/assign/d=base")
    SegmentCommits.commit(intoDir, "base")
  }

  /** Start the maintenance stream: each micro-batch of prepared vectors is
    * probed against the pre-batch index (top-`k`, `nprobe` cells; results
    * land under `outDir/d=b<batchId>` with the same marker-last commit) and
    * then folded in. `stream` must carry (vec_id, vec, nrm) — row-local
    * prep like [[Similarity.prepared]] composes upstream of this call.
    */
  def start(spark: SparkSession, dir: String, stream: DataFrame,
      outDir: String, checkpoint: String, k: Int, nprobe: Int,
      trigger: Trigger = Trigger.ProcessingTime("200 milliseconds"))
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val name = s"b$batchId"
        val idx = loadIndex(spark, dir, excluding = Some(name))
        Similarity.ivfTopKFromIndex(idx, batch, k, nprobe)
          .write.mode("overwrite").parquet(s"$outDir/d=$name")
        SegmentCommits.commit(outDir, name)
        foldBatch(spark, dir, batch, name)
      }
      .start()
}
