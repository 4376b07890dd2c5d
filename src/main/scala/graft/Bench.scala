package graft

import org.apache.spark.sql.SparkSession

/** Benchmark driver: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization of every output column
  * through the noop sink (a bare count() would let Catalyst prune the
  * expensive expressions), and prints one JSON line.
  *
  * A warmup pass (same plans, same data) runs first so the timed pass
  * measures steady-state execution, not JIT/codegen/first-scan costs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names =
      if (args.nonEmpty) SparkEntry.queries.keys.toSeq.sorted.filter(args.contains)
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach(runOnce) // warmup
    val results = names.map(n => n -> runOnce(n))
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
