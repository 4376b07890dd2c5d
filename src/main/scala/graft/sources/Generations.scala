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

  /** Write the next generation via `writePayload(genPath)`, commit it
    * marker-LAST, then reap everything except the new generation and its
    * newest committed predecessor. Returns the committed path.
    */
  def save(dir: String)(writePayload: String => Unit): String = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val before = gens(dir)
    val next = (0L +: before.map(_._1)).max + 1
    val gdir = new java.io.File(d, s"gen_$next")
    writePayload(gdir.getPath)
    // marker LAST: a crash anywhere above leaves this generation
    // uncommitted and the previous committed one still serving
    java.nio.file.Files.write(new java.io.File(gdir, Marker).toPath,
      Array.emptyByteArray)
    val keepPrev = before.filter(p => committed(p._2)).sortBy(-_._1)
      .headOption.map(_._1)
    before.foreach { case (n, f) =>
      if (!keepPrev.contains(n)) deleteRecursively(f)
    }
    gdir.getPath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
