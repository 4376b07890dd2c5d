package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.model.IngestRequest
import graft.streaming.IngestPipeline

/** Live demo of the streaming ingest pipeline: submits requests (including
  * an invalid one and a late HIGH that must preempt a queued LOW), then
  * polls and prints the status rollup each second — the observable behavior
  * of the reference's POST /ingest + GET /status loop.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def now() = new java.sql.Timestamp(System.currentTimeMillis())

    val input = MemoryStream[IngestRequest]
    val pipeline = new IngestPipeline(spark,
      Files.createTempDirectory("graft-demo").toString)
    val query = pipeline.start(input.toDF(),
      Trigger.ProcessingTime("2 seconds"), heartbeatRowsPerSecond = 2)

    input.addData(
      IngestRequest("low-req", Seq(1, 2, 3, 4, 5, 6), "LOW", now()),
      IngestRequest("bad-req", Seq(), "HIGH", now()))
    println("[demo] submitted low-req (6 ids => 2 batches) + bad-req (empty ids)")
    Thread.sleep(3000)
    input.addData(IngestRequest("high-req", Seq(7, 8, 9), "HIGH", now()))
    println("[demo] submitted high-req AFTER low-req was queued (must preempt)")

    val deadline = System.currentTimeMillis() + 120000
    var done = false
    while (!done && System.currentTimeMillis() < deadline) {
      Thread.sleep(1000)
      val overall = pipeline.overallStatus.collect()
        .map(r => s"${r.getString(0)}=${r.getString(1)}").sorted.mkString(" ")
      val batches = pipeline.batchState.collect()
        .map(r => s"${r.getString(0)}#${r.getInt(2)}:${r.getString(6)}")
        .sorted.mkString(" ")
      println(s"[demo] overall[$overall] batches[$batches]")
      done = overall.nonEmpty && !overall.contains("yet_to_start") &&
        !overall.contains("triggered")
    }
    val rejected = pipeline.rejectedState.collect()
      .map(r => s"${r.getString(0)}(${r.getString(1)})").mkString(" ")
    println(s"[demo] rejected: $rejected")
    println(s"[demo] processed records: ${pipeline.processedState.count()}")
    println(s"[demo] drained=$done")
    query.stop()
    spark.stop()
  }
}
