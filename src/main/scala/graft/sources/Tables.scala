package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (`TESTDATA.md`).
  *
  * All reads go through `spark.read.parquet` so Catalyst applies predicate
  * pushdown and column pruning at the scan; callers select/filter on the
  * returned DataFrame and the optimizer narrows the physical scan
  * (`ReadSchema` / `PushedFilters` in `.explain("formatted")`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long (legacy conf) and convert to a microsecond
    * TimestampType column. The synthetic data has no sub-microsecond
    * component, so the conversion is lossless.
    */
  def events(spark: SparkSession, dir: String): DataFrame = Tables.synchronized {
    // The driver has shipped `events.ts` in two parquet encodings across
    // rounds: nanosecond INT64 (read as LongType under the legacy
    // nanosAsLong conf) and, since round 7, plain timestamp[us] NTZ.
    // Dispatch on the READ schema so both load to the same contract: a
    // session-timezone TimestampType column with microsecond epoch values
    // (sessions here run UTC, so the NTZ→LTZ cast is the identity on the
    // epoch). The set→analyze→restore window is serialized — two
    // concurrent calls otherwise race (A restores the conf while B is
    // still analyzing under it; seen as parallel-suite flakes).
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = table(spark, dir, "events")
      val df = raw.schema("ts").dataType match {
        case LongType =>
          // integral `div`, NOT `/`: double division of an epoch-ns long
          // loses precision (2^53 < 1.7e18) and can round the
          // microsecond up by one
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
      }
      df.schema // force eager schema resolution under the scoped conf
      df
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** SQL-first entry point: register every fixture table as a temp view
    * (events through its nanos-safe loader) plus graft's native SQL
    * functions, so the full engine is reachable from `spark.sql(...)`
    * alone — the catalog mirror of the DataFrame loaders above. Views are
    * lazy: registration reads schemas only, scans still prune/push down.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }
    events(spark, dir).createOrReplaceTempView("events")
  }

  /** Scratch directory for a query's persisted artifact (the save → load
    * → delta proof shape). The dataset path keys the name so sf0.01 and
    * sf0.1 runs never collide; the PID keys it so two drivers on the
    * SAME dataset — bench and verify concurrently, a documented
    * contention mode on this box — don't race mode-overwrite writes
    * against loads of one parquet dir (round-12 advisor). Each proof
    * query builds, saves, loads, and serves within one process, so a
    * per-process name costs nothing and removes the only cross-process
    * sharing these paths ever had.
    */
  def artifactDir(tag: String, datasetDir: String): String = {
    val prefix = s"graft_${tag}_" +
      java.lang.Integer.toHexString(datasetDir.hashCode) + "_p"
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    // Per-process names would otherwise grow /tmp without bound (every
    // bench/verify/test process leaves its generation behind): reap
    // SAME-prefix dirs from other pids once they are old enough that no
    // live proof query can still be reading them. The 6 h bar keeps the
    // reaper from racing a concurrent driver — the exact hazard the pid
    // suffix exists to prevent.
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    val mine = prefix + ProcessHandle.current().pid()
    // a directory's mtime does not update on READS, so age alone can
    // reap a >6h-old dir a still-live process is re-scanning (cache
    // eviction, repeated bench runs without re-save) — the name already
    // embeds the owning pid, so skip any dir whose owner is still alive
    // and keep the age bar only as the dead-owner fallback. "Alive" must
    // also survive PID RECYCLING: a live process that STARTED AFTER the
    // dir's last write cannot be its owner (the owner wrote the dir, so
    // owner.start <= dir.mtime; recycling implies the owner died first),
    // so a long-lived squatter on a recycled pid doesn't pin the dir
    // forever. Unknown start time keeps the dir (conservative).
    def ownerAlive(f: java.io.File): Boolean =
      try ProcessHandle.of(f.getName.substring(prefix.length).toLong)
        .filter(h => h.info().startInstant()
          .map[java.lang.Boolean](s => s.toEpochMilli <= f.lastModified())
          .orElse(true))
        .isPresent
      catch { case _: Throwable => false }
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.getName.startsWith(prefix) && f.getName != mine &&
          f.lastModified() < cutoff && !ownerAlive(f)) {
        try graft.operators.Dedup.deleteRecursively(f)
        catch { case _: Throwable => () }
      }
    }
    s"${tmp.getPath}/$mine"
  }
}
