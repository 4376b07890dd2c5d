package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan for one or more queries —
  * the feedback loop behind PLANS.md's plan audits.
  * Usage: runMain graft.PlanDump <sfDir> <queryName> [<queryName> ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <queryName>...")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, args(0)).explain("formatted")
    } finally spark.stop()
  }
}
