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
  def events(spark: SparkSession, dir: String): DataFrame = {
    // scope the legacy conf to this read (schema conversion is eager at
    // load): other parquet reads in the session must not silently see
    // nanos columns as LongType
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      // integral `div`, NOT `/`: double division of an epoch-ns long loses
      // precision (2^53 < 1.7e18) and can round the microsecond up by one
      val df = table(spark, dir, "events")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
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
}
