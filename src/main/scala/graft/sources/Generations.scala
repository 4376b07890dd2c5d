package graft.sources

/** GENERATION-FLIP crash safety for BATCH persisted artifacts (round-13
  * verdict #2) — the streaming segments' commit-marker-last protocol,
  * one level up.
  *
  * Before this, every batch saver (`Curation.writeShards` and the
  * coalesce-to-one-file writers in Similarity/Retrieval/Eval/Dedup)
  * overwrote the artifact IN PLACE: `mode("overwrite")` deletes the old
  * parquet tree before the new one is durable, so a crash mid-save
  * destroys BOTH generations — the previous artifact (already deleted)
  * and the new one (half-written) — and loaders read the directory
  * unconditionally, serving whatever half-state the crash left. For
  * artifacts whose entire purpose is surviving daily maintenance
  * (gram counts/postings, IVF/PQ/MRL indexes, the inverted index, the
  * NB/LM count tables), that is the one failure mode they exist to
  * prevent.
  *
  * Discipline: each save writes a FRESH numbered generation directory
  * (`<dir>/gen_<N>`, N above every existing generation), writes the
  * whole payload inside it — ALL of a multi-table artifact's tables, so
  * the flip is atomic across tables too — and only then drops the
  * `_COMMITTED` marker. Loaders resolve the HIGHEST committed
  * generation and refuse uncommitted ones. A crash anywhere before the
  * marker leaves an uncommitted `gen_<N>` that no loader will ever
  * read, with the previous generation still serving; the debris is
  * reaped by the next successful save.
  *
  * Retention: after committing generation N, every other generation
  * EXCEPT the newest previous committed one is deleted. Keeping one
  * committed predecessor costs one artifact of disk and keeps a frame
  * lazily loaded from gen N−1 (Spark reads are deferred) readable while
  * a same-process save of gen N is in flight — the same staleness
  * window `Tables.artifactDir`'s pid-keying closes across processes.
  *
  * 100 TB shape: the flip itself is O(1) metadata (one directory listing
  * + one marker write) regardless of artifact size; payload writes are
  * whatever the saver already did. On an object store the marker-last
  * ordering is exactly the visibility contract the streaming segments
  * already rely on.
  */
object Generations {

  private val Marker = "_COMMITTED"

  private def genNumber(name: String): Option[Long] =
    if (name.startsWith("gen_")) name.substring(4).toLongOption else None

  private def committed(f: java.io.File): Boolean =
    new java.io.File(f, Marker).isFile

  private def gens(dir: String): Seq[(Long, java.io.File)] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => genNumber(f.getName).filter(_ => f.isDirectory)
        .map(n => (n, f)))

  /** Highest committed generation's path, if any. */
  def latestCommitted(dir: String): Option[String] =
    gens(dir).filter(p => committed(p._2)).sortBy(-_._1)
      .headOption.map(_._2.getPath)

  /** Resolve the directory a loader must read. Refuses a directory with
    * generations but none committed (a crash left only debris) and — for
    * a precise error — a missing/empty artifact.
    */
  def loadPath(dir: String): String =
    latestCommitted(dir).getOrElse(throw new IllegalStateException(
      s"no committed generation under $dir " +
        s"(uncommitted: ${gens(dir).map(_._2.getName).sorted.mkString(",")})"))

  /** Write the next generation via `writePayload(stagePath)`, stamp the
    * commit marker INSIDE the staging dir, then publish with one atomic
    * rename; finally reap everything except the new generation and its
    * newest committed predecessor. Returns the committed path.
    *
    * CONCURRENT-SAVER safe: the payload lands in a pid+nanos-unique
    * `_tmp_*` staging dir (invisible to [[genNumber]], so loaders and
    * the reap loop never see it), then an ATOMIC rename claims the next
    * `gen_<N>` slot — two racing savers cannot interleave writes into
    * one generation, because each writes only its own staging dir and
    * exactly one rename per slot succeeds; the loser re-reads the max
    * and claims N+1. In-repo callers are already single-writer per dir
    * (`Tables.artifactDir` pid-keys the paths), but the module is the
    * general crash-safety layer and must not assume that. Staging debris
    * from crashed savers is reaped here once its owning pid is dead.
    *
    * The marker is written BEFORE the rename (round-14 advisor, medium):
    * an earlier draft renamed first and marked second, which opened a
    * claimed-but-unmarked window — a faster concurrent saver committing
    * gen_N+1 would see the racer's freshly claimed gen_N as "uncommitted
    * older debris" and reap it out from under the racer's marker write,
    * either failing the racer's save spuriously or (File.delete silently
    * skips non-empty dirs) leaving a MARKED generation with a partially
    * deleted payload that [[latestCommitted]] would serve. With the
    * marker inside the stage, publish == the one atomic rename: a live
    * generation is committed from the instant it exists, so every
    * unmarked `gen_<N>` on disk is provably dead kill-debris and the
    * post-commit reap can never hit an in-flight saver.
    */
  def save(dir: String)(writePayload: String => Unit): String = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val stage = new java.io.File(d,
      s"_tmp_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    stage.mkdirs()
    var gdir: java.io.File = null
    try {
      writePayload(stage.getPath)
      // marker into the STAGE, pre-rename: the rename below is then the
      // single atomic publish — no claimed-but-unmarked window for a
      // concurrent saver's reap to race (scaladoc above)
      java.nio.file.Files.write(new java.io.File(stage, Marker).toPath,
        Array.emptyByteArray)
      var attempts = 0
      var lastErr: Throwable = null
      while (gdir == null) {
        attempts += 1
        if (attempts > 1000) throw new IllegalStateException(
          s"could not claim a generation slot under $dir after 1000 tries",
          lastErr)
        val next = (0L +: gens(dir).map(_._1)).max + 1
        val cand = new java.io.File(d, s"gen_$next")
        try {
          java.nio.file.Files.move(stage.toPath, cand.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          gdir = cand
        } catch {
          // a lost claim race leaves the STAGE intact (rename is
          // all-or-nothing) — re-list and take the next number; checking
          // the target instead would race the winners' reaps. Anything
          // that consumed the stage (cross-device move half-applied,
          // permissions) cannot converge: rethrow.
          case e: java.nio.file.FileSystemException =>
            lastErr = e
            if (!stage.isDirectory) throw e
        }
      }
    } catch {
      // a failed save must not leave its own staging debris (a killed
      // PROCESS can't run this — its debris is reaped by pid-death
      // below, in a later save); if the rename already succeeded the
      // stage path no longer exists and this is a no-op, leaving the
      // claimed-but-unmarked generation as ordinary uncommitted debris
      case e: Throwable =>
        graft.operators.Dedup.deleteRecursively(stage)
        throw e
    }
    // the rename WAS the publish (marker travelled inside the stage);
    // a crash anywhere before it leaves only an invisible _tmp_ dir and
    // the previous committed generation still serving.
    // Reap only OLDER generations (a concurrent saver may already have
    // claimed a newer slot — its generation is never ours to delete),
    // keeping the newest committed predecessor for in-flight readers;
    // any unmarked older gen_<N> is dead kill-debris by construction
    // (live savers publish committed), so deleting it races nobody.
    val mine = genNumber(gdir.getName).get
    val older = gens(dir).filter(_._1 < mine)
    val keepPrev = older.filter(p => committed(p._2))
      .sortBy(-_._1).headOption.map(_._1)
    older.foreach { case (n, f) =>
      if (!keepPrev.contains(n)) graft.operators.Dedup.deleteRecursively(f)
    }
    // killed savers' staging debris: reap once the owning pid is gone
    // (a LIVE pid — including ours — may be a concurrent saver whose
    // stage is in flight; exception-path cleanup above bounds same-
    // process debris, pid-death bounds cross-process debris)
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith("_tmp_")) {
        val pid = f.getName.stripPrefix("_tmp_").takeWhile(_.isDigit)
        val alive = pid.toLongOption.exists(p =>
          try ProcessHandle.of(p).isPresent
          catch { case _: Throwable => false })
        if (!alive) graft.operators.Dedup.deleteRecursively(f)
      }
    }
    gdir.getPath
  }
}
