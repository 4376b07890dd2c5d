package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** IVF quality: k-means centroids must not be worse than the arbitrary
  * every-Nth seeds they replace (recall vs the exact brute-force top-5).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def corpus = Similarity.prepared(Tables.embeddings(spark, dir), "embedding")
    .select(col("vec_id"), col("vec"), col("nrm")).cache()

  private def recallAt5(result: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) => (t & result.getOrElse(q, Set.empty)).size / 5.0 }
      .sum / truth.size

  test("kmeans-centroid IVF recall >= modulo-centroid IVF recall") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 5)
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

    val truth = topkMap(Similarity.bruteForceTopK(queries, c, 5))
    val moduloCents = c.filter(col("vec_id") % 50 === 0)
    val moduloRecall = recallAt5(
      topkMap(Similarity.ivfTopK(c, moduloCents, queries, 5, 2)), truth)
    val kmeansCents = Similarity.kmeansCentroids(c, 10, 3).cache()
    val kmeansRecall = recallAt5(
      topkMap(Similarity.ivfTopK(c, kmeansCents, queries, 5, 2)), truth)
    assert(kmeansCents.count() == 10)
    assert(kmeansRecall >= moduloRecall - 1e-9,
      s"kmeans recall $kmeansRecall < modulo recall $moduloRecall")
  }
}
