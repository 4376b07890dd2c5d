package graft.streaming

import java.nio.file.{Files, Paths}

/** The ONE copy of the commit-marker-last segment protocol shared by
  * every streaming store ([[StreamingDedupGate]], [[StreamingIvf]],
  * [[StreamingIndex]], [[StreamingGramPostings]]).
  *
  * Contract (what the kill-and-resume proofs in ScaleSpec rely on):
  * a segment's payload is FULLY durable before its marker exists, so a
  * crash mid-write leaves no marker and readers never see the torn
  * payload; a marker is an empty file named after the segment inside a
  * per-store namespace directory (`<dir>/commits` by default,
  * `<dir>/tombstone_commits` for LSM delete batches); reads list the
  * namespace, sorted for deterministic plans (order is cosmetic — the
  * stores' segments are additive and commute). `commit` is idempotent,
  * which is what makes skip-if-committed replays safe.
  *
  * Holding the invariant in one object means a protocol hardening
  * (e.g. fsync-before-marker on a filesystem without ordered metadata,
  * or an object-store put-if-absent marker) lands in every store at
  * once instead of drifting across four private copies.
  */
private[streaming] object SegmentCommits {

  val DefaultNs = "commits"

  private def nsDir(dir: String, ns: String) = s"$dir/$ns"

  /** Drop the marker for `name` (idempotent; payload must already be
    * durable — this is the LAST step of a segment write).
    */
  def commit(dir: String, name: String, ns: String = DefaultNs): Unit = {
    Files.createDirectories(Paths.get(nsDir(dir, ns)))
    val marker = Paths.get(nsDir(dir, ns), name)
    if (!Files.exists(marker)) Files.createFile(marker)
  }

  /** True iff `name`'s payload is fully written (its marker exists). */
  def isCommitted(dir: String, name: String, ns: String = DefaultNs): Boolean =
    Files.exists(Paths.get(nsDir(dir, ns), name))

  /** Names of fully-written segments, sorted for deterministic plans. */
  def committed(dir: String, ns: String = DefaultNs): Seq[String] =
    Option(new java.io.File(nsDir(dir, ns)).list())
      .map(_.toSeq.sorted).getOrElse(Seq.empty)
}
