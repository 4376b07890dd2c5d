package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computations over edge DataFrames. Companion to
  * [[Dedup.connectedComponents]] (label propagation); this file holds the
  * value-propagation family (PageRank-style scores).
  */
object Graph {

  /** PageRank over an UNDIRECTED edge list, in exact integer arithmetic.
    *
    * Scores are BIGINTs scaled by `scale` (initial score = `scale` ≡ 1.0);
    * each iteration computes, per node,
    * `score' = 0.15*scale + 0.85 * Σ_in (score(src) div deg(src))`
    * with integer division (`div`) and an integer 85/100 damping multiply.
    * Everything is +, *, and integral div over BIGINTs — no floats — so the
    * result is bit-identical across partition counts, shuffle orders, and
    * engines (a float PageRank's Σ is addition-order-dependent and can
    * differ between a 32-partition and a 1000-partition run; an integer Σ
    * cannot). Ranking quality is unaffected: the quantization error is at
    * most `iterations` in `scale` units (1e-6 at the default).
    *
    * Scale shape: one shuffle per iteration (groupBy dst), with map-side
    * partial sums; degrees and the symmetric edge list are computed once
    * and `localCheckpoint`ed so iteration N's plan doesn't replay N
    * lineages (same discipline as connectedComponents). The undirected
    * closure means every node has out-degree ≥ 1 — no dangling-mass term.
    *
    * Overflow headroom: Σ contrib ≤ total mass = n_nodes * scale, so with
    * the default scale the sum stays exact below ~9e12 nodes.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().localCheckpoint()
    val deg = sym.groupBy(col("src"))
      .agg(count(lit(1)).as("deg")).localCheckpoint()
    val base = (scale * 15L) / 100L
    // degree rides inside the rank frame so each iteration is ONE join
    // (edges × rank) + one aggregate, not two joins
    var rank = deg.select(col("src").as("node"), col("deg"),
      lit(scale).as("score"))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(rank.select(col("node").as("src"),
          expr("score div deg").as("c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_mass"))
      rank = deg.select(col("src").as("node"), col("deg"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) +
            expr("(coalesce(in_mass, CAST(0 AS BIGINT)) * 85) div 100")).as("score"))
        .localCheckpoint()
    }
    rank.select(col("node"), col("score"))
  }
}
