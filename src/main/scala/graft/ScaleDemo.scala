package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Shows the scale mechanisms working: skew salting (hot key spread across
  * partitions, result parity) and bucketed co-located joins (exchange-free
  * plan). Run: runMain graft.ScaleDemo
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false") // keep partition layout observable
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- skew salting: 90% of rows share key 1. Broadcast disabled: skew
    // only exists on the shuffle-join path (a broadcast join never
    // repartitions the probe side).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val left = ((1 to 9000).map(i => (1L, s"row$i")) ++
      (1 to 1000).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "payload")
    val right = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "dim")

    def hotKeyPartitionSpread(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.filter(col("k") === 1)
        .groupBy(spark_partition_id().as("p")).count()
        .orderBy(col("p")).select("count").as[Long].collect().toSeq

    val plain = left.join(right, Seq("k"))
    val salted = Relational.saltedJoin(left, right, Seq("k"), 8)
    println(s"[scale] plain join rows=${plain.count()} salted rows=${salted.count()}")
    println(s"[scale] hot-key rows per partition, plain : ${hotKeyPartitionSpread(plain)}")
    println(s"[scale] hot-key rows per partition, salted: ${hotKeyPartitionSpread(salted)}")

    // --- bucketed co-located join: no exchange in the plan
    spark.sql("DROP TABLE IF EXISTS demo_b_orders")
    spark.sql("DROP TABLE IF EXISTS demo_b_lineitem")
    graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("demo_b_orders")
    graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("demo_b_lineitem")
    val joined = spark.table("demo_b_lineitem").join(spark.table("demo_b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    println(s"[scale] bucketed join rows=${joined.count()}")
    println(s"[scale] bucketed join plan contains Exchange: ${plan.contains("Exchange")}")
    spark.stop()
  }
}
