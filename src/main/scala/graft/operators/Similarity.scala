package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over embedding columns (`Array[Float]`).
  *
  * Vector math uses `zip_with`/`aggregate` higher-order functions — a strict
  * left-fold in element order, which makes the doubles bit-identical to any
  * other sequential evaluation (the DuckDB oracle included). All math is done
  * in double precision after an explicit upcast of the float column.
  *
  * Two search paths:
  * - brute force: exact, O(|Q|·|C|); the correctness baseline. Scales by
  *   broadcasting the (small) query set against a partitioned corpus — each
  *   executor scans its corpus slice once.
  * - IVF: corpus pre-assigned to nearest centroid (broadcast centroid set,
  *   map-side assignment, no shuffle), queries probe only their centroid's
  *   bucket. At 100 TB the bucket join shuffles on centroid id — a k-way
  *   partition of the corpus instead of a full scan per query.
  */
object Similarity {

  /** Upcast a float vector column to double for stable arithmetic. */
  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product (deterministic element order), backed by
    * the native `DotProduct` Catalyst expression (graft.functions): codegen
    * emits a primitive loop inside whole-stage codegen — no boxing, no UDF
    * fence — with bit-identical left-to-right accumulation. Requires
    * `GraftFunctions.register(spark)` (the query layer and SparkSpec do it).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with explicit precomputed norms (avoids recomputing
    * the corpus norm per pair).
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, 0.0)
      .otherwise(dot(a, b) / (normA * normB))

  /** Cosine similarity of two raw vectors. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm(a), norm(b))

  /** Attach `vec` (double) and `nrm` columns to an embedding table —
    * row-local, computed once per corpus instead of once per pair.
    */
  def prepared(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("vec", toDoubleVec(col(vecCol)))
      .withColumn("nrm", norm(col("vec")))

  /** Exact brute-force cosine top-k: every query row against every corpus
    * row. `queries` must be small (it is broadcast); ranking rounds to 6
    * decimals then tie-breaks on neighbor id so results are stable across
    * engines and partitionings.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("vec").as("qvec"), col("nrm").as("qnrm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("vec").as("cvec"), col("nrm").as("cnrm"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(
        cosineWithNorms(col("qvec"), col("cvec"), col("qnrm"), col("cnrm")), 6))
    Relational.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("sim").desc, col("neighbor_id").asc), k, "rank")
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }

  /** All-pairs cosine above a lower bound: broadcast block-nested-loop.
    * The corpus block (id, vec, norm) is broadcast once; each partition
    * scans its rows against the block with primitive double loops — no
    * per-pair array shuffling, no boxing, ~memory-bandwidth speed. The
    * left-to-right accumulation matches the `dot` fold bit-for-bit, and
    * rounding/thresholding stay in Catalyst so engine-parity semantics are
    * identical to the expression form. Emits each unordered pair once
    * (id_a < id_b) with the RAW sim; callers round + filter.
    *
    * `lowerBound` prunes emission only — set it slightly below the real
    * threshold so the exact (rounded) filter upstairs decides membership.
    * At 100 TB the single broadcast block becomes a grid of blocks
    * (block-ids crossed, same inner loop) — the shape is unchanged.
    */
  /** Hard cap on the broadcast block: above this, use the block-grid plan
    * (split the corpus into blocks, cross block pairs as tasks) — the
    * driver-side collect here is the single-block special case. */
  val MaxBlockRows = 2000000

  def bruteForcePairs(corpus: DataFrame, lowerBound: Double): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val spark = corpus.sparkSession
    val n = corpus.count()
    require(n <= MaxBlockRows,
      s"bruteForcePairs collects the corpus as one broadcast block ($n rows > " +
        s"$MaxBlockRows); shard into a block grid for larger corpora")
    val block = corpus.select(col("vec_id"), col("vec"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(block)
    val outSchema = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType), StructField("sim_raw", DoubleType)))
    val rdd = corpus.select(col("vec_id"), col("vec"), col("nrm")).rdd
      .mapPartitions { rows =>
        val entries = bc.value
        rows.flatMap { r =>
          val ida = r.getLong(0)
          val va = r.getSeq[Double](1).toArray
          val na = r.getDouble(2)
          entries.iterator.filter(_._1 > ida).flatMap { case (idb, vb, nb) =>
            var s = 0.0
            var i = 0
            val n = math.min(va.length, vb.length)
            while (i < n) { s += va(i) * vb(i); i += 1 }
            val sim = if (na == 0.0 || nb == 0.0) 0.0 else s / (na * nb)
            if (sim >= lowerBound) Some(Row(ida, idb, sim)) else None
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** For each vector, its `nprobe` nearest centroids (broadcast centroids,
    * map-side ranking — zero shuffle). nprobe=1 assigns the corpus; higher
    * nprobe widens the query-side search to neighboring cells, the standard
    * IVF recall/latency dial. Ties break on centroid id.
    */
  def probeCentroids(corpus: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"),
      col("vec").as("centvec"), col("nrm").as("centnrm"))
    val scored = corpus.crossJoin(broadcast(c))
      .withColumn("csim", round(
        cosineWithNorms(col("vec"), col("centvec"), col("nrm"), col("centnrm")), 6))
    Relational.topKPerGroup(scored, Seq(col("vec_id")),
        Seq(col("csim").desc, col("centroid_id").asc), nprobe, "crank")
      .select(corpus.columns.toSeq.map(col) :+ col("centroid_id"): _*)
  }

  /** Corpus cell assignment: each vector in exactly one centroid cell. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame =
    probeCentroids(corpus, centroids, 1)

  /** Lloyd k-means over the corpus, deterministic: seeds = the k smallest
    * vec_ids, fixed iteration count, ties on centroid id. Per iteration:
    * broadcast-assign (map-side), then element-wise mean via posexplode —
    * the flat (cluster, dim, value) layout partial-aggregates map-side, so
    * the shuffle carries k×dims cells no matter the corpus size. This is
    * the production centroid source for IVF (vs. the arbitrary every-Nth
    * seeds), trading `iters` extra passes for bucket quality.
    * Standard Lloyd caveat: a centroid whose cluster empties out drops from
    * the result, so fewer than k centroids may return (k-means|| style
    * re-seeding is the production mitigation).
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    // centroid tables share the corpus contract (vec_id, vec, nrm) so they
    // plug straight into probeCentroids/assignToCentroids
    var cents = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("vec"), col("nrm"))
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(corpus, cents)
      cents = assigned
        .select(col("centroid_id"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("_p"))
        .select(col("centroid_id").as("vec_id"),
          transform(col("_p"), p => p.getField("m")).as("vec"))
        .withColumn("nrm", norm(col("vec")))
    }
    cents
  }

  /** IVF search: assign corpus to cells once, probe the query's nprobe
    * nearest cells, exact-rank within the probed buckets.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val assigned = assignToCentroids(corpus, centroids)
    val q = probeCentroids(queries, centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"), col("centroid_id"))
    val bucket = assigned.select(col("vec_id").as("neighbor_id"),
      col("vec").as("cvec"), col("nrm").as("cnrm"), col("centroid_id"))
    val scored = q.join(bucket, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosineWithNorms(
        col("qvec"), col("cvec"), col("qnrm"), col("cnrm")), 6))
    Relational.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("sim").desc, col("neighbor_id").asc), k, "rank")
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("sim"))
  }
}
