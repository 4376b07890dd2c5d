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

    serveDemo(spark)
    spark.stop()
  }

  /** Persist-and-serve retrieval: build the lexical (q213/q214) and ANN
    * (q142) indexes ONCE — base build, save, load, daily-delta fold — then
    * serve 100 hybrid queries (BM25 from the maintained postings + IVF
    * probe of the maintained inverted lists, RRF-fused, q153's shape) from
    * the maintained tables alone, reporting per-query latency. The corpus
    * is never rescanned after the build: this is the economics the
    * incremental-maintenance operators exist for.
    */
  def serveDemo(spark: SparkSession): Unit = {
    import graft.operators.{Dedup, Retrieval, Similarity}
    import graft.sources.Tables
    graft.functions.GraftFunctions.register(spark)
    // the salting section above disables AQE to keep the partition layout
    // observable; serving wants it ON (tiny per-query shuffles coalesce)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val sf = "/root/testdata/sf0.1"
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- lexical index: base build+save, load, fold the "daily" batch
    val docs = Tables.documents(spark, sf)
      .withColumn("tok", Dedup.tokens(col("text")))
    val lexDir = java.nio.file.Files.createTempDirectory("graft-serve-lex").toString
    var t0 = System.nanoTime()
    Retrieval.saveIndex(
      Retrieval.buildIndex(docs.filter(col("doc_id") % 10 =!= 7),
        "doc_id", "tok"), lexDir)
    val lexBuildS = secs(t0)
    t0 = System.nanoTime()
    val lexIdx = {
      val folded = Retrieval.applyIndexDelta(
        Retrieval.loadIndex(spark, lexDir),
        docs.filter(col("doc_id") % 10 === 7), "doc_id", "tok")
      // serve mode: pin the maintained tables in memory
      Retrieval.RetrievalIndex(folded.postings.cache(), folded.terms.cache(),
        folded.docs.cache(), folded.stats.cache())
    }
    val nPostings = lexIdx.postings.count()
    lexIdx.terms.count(); lexIdx.docs.count(); lexIdx.stats.count()
    val lexFoldS = secs(t0)

    // ---- ANN index: same lifecycle over the embeddings
    val emb = Similarity.prepared(Tables.embeddings(spark, sf), "embedding")
      .select(col("vec_id"), col("vec"), col("nrm"))
    val ivfDir = java.nio.file.Files.createTempDirectory("graft-serve-ivf").toString
    t0 = System.nanoTime()
    val oldVecs = emb.filter(col("vec_id") % 10 =!= 7)
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(oldVecs,
      oldVecs.filter(col("vec_id") % 40 === 0)), ivfDir)
    val ivfBuildS = secs(t0)
    t0 = System.nanoTime()
    val ivfIdx = {
      val folded = Similarity.applyIndexDelta(
        Similarity.loadIvfIndex(spark, ivfDir),
        emb.filter(col("vec_id") % 10 === 7))
      Similarity.IvfIndex(folded.centroids.cache(),
        folded.assignments.cache())
    }
    val nVecs = ivfIdx.assignments.count(); ivfIdx.centroids.count()
    val ivfFoldS = secs(t0)
    println(f"[serve] lexical index: $nPostings postings " +
      f"(build+save ${lexBuildS}%.1fs, load+fold+pin ${lexFoldS}%.1fs); " +
      f"ANN index: $nVecs vectors " +
      f"(build+save ${ivfBuildS}%.1fs, load+fold+pin ${ivfFoldS}%.1fs)")

    // ---- query prep, FROM THE INDEX (one job): each query doc's top-3
    // tf·idf terms; query vectors collect once (they arrive from outside
    // in a real frontend)
    val qt = Relational.topKPerGroup(
      lexIdx.postings.filter(col("doc_id") < 100)
        .join(lexIdx.terms, Seq("term"))
        .crossJoin(broadcast(lexIdx.stats))
        .withColumn("w",
          col("tf") * log(col("n_docs").cast("double") / col("df"))),
      Seq(col("doc_id")), Seq(col("w").desc, col("term").asc), 3, "_r")
      .select(col("doc_id"), col("term"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSeq.sorted).toMap
    val qv = emb.filter(col("vec_id") < 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Double](1), r.getDouble(2)))).toMap
    val qids = qv.keys.toSeq.sorted.take(100)

    // ---- serve: one collect per query, lexical + semantic + RRF fusion
    import spark.implicits._
    def serveOne(qid: Long): Double = {
      val q0 = System.nanoTime()
      val lex = Retrieval.bm25QueryFromIndex(
          lexIdx, qt(qid).toDF("term"), 20)
        .filter(col("doc_id") =!= qid)
        .select(lit(qid).as("query_id"), col("doc_id"),
          col("rank").as("rank_lex"))
      val sem = Similarity.ivfTopKFromIndex(ivfIdx,
          Seq((qid, qv(qid)._1, qv(qid)._2)).toDF("vec_id", "vec", "nrm"),
          20, 2)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("rank_sem"))
      val hits = Relational.rrfFuse(lex, sem, "query_id", "doc_id",
        "rank_lex", "rank_sem", 60, 10).collect()
      require(hits.length == 10, s"query $qid served ${hits.length} hits")
      secs(q0) * 1000.0
    }
    // warmup: first executions pay codegen + broadcast-machinery spin-up
    qids.take(3).foreach(serveOne)
    val latencies = qids.map(serveOne).sorted
    def pct(p: Double) = latencies((p * (latencies.size - 1)).round.toInt)
    println(f"[serve] latency path (one job per query): ${qids.size} " +
      f"hybrid queries, total ${latencies.sum / 1000.0}%.1fs, " +
      f"p50 ${pct(0.5)}%.0fms, p95 ${pct(0.95)}%.0fms, " +
      f"max ${pct(1.0)}%.0fms")

    // ---- throughput path: the SAME 100 queries fused in ONE job —
    // scheduling amortizes across the fleet, which is how a Spark
    // retrieval layer serves load (the loop above is the latency floor)
    val t1 = System.nanoTime()
    val qtAll = qids.flatMap(q => qt(q).map(t => (q, t)))
      .toDF("query_id", "term")
    val lexAll = Retrieval.bm25QueriesFromIndex(lexIdx, qtAll, "query_id", 20)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_lex"))
    val semAll = Similarity.ivfTopKFromIndex(ivfIdx,
        emb.filter(col("vec_id") < 100), 20, 2)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("rank_sem"))
    val fusedAll = Relational.rrfFuse(lexAll, semAll, "query_id", "doc_id",
      "rank_lex", "rank_sem", 60, 10).collect()
    val batchS = secs(t1)
    require(fusedAll.length == qids.size * 10,
      s"batched serve returned ${fusedAll.length} rows")
    println(f"[serve] throughput path (all ${qids.size} queries, one " +
      f"job): ${batchS}%.1fs total = ${batchS * 1000 / qids.size}%.0fms " +
      f"per query amortized")
  }
}
