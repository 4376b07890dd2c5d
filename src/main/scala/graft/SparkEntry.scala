package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IngestOps
import graft.queries.{AnalyticsQueries, CapstoneQueries, CoreQueries, CurationQueries, DedupQueries, EvalQueries, GovernanceQueries, SimilarityQueries, MultimodalQueries, TextQueries, WarehouseQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator's named query; `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's correctness gate. Column names are
  * aliased identically on both sides (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship end-to-end slice on sf0.001 (SURVEY.md §7 step 3): requests →
    * validate (O2) → explode to batches of 3 (O5) → derive per-batch status →
    * overall rollup (O17). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    IngestOps.rollupStatus(
      CoreQueries.batchStatuses(spark, dir), "ingestion_key", "status")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ AnalyticsQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++ SimilarityQueries.extraQueries ++ TextQueries.queries ++ TextQueries.extraQueries ++ WindowQueries.queries ++ MultimodalQueries.queries ++ CurationQueries.queries ++ WarehouseQueries.queries ++ EvalQueries.queries ++ GovernanceQueries.queries ++ CapstoneQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ AnalyticsQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++ TextQueries.oracles ++ WindowQueries.oracles ++ MultimodalQueries.oracles ++ CurationQueries.oracles ++ WarehouseQueries.oracles ++ EvalQueries.oracles ++ GovernanceQueries.oracles ++ CapstoneQueries.oracles
}
