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

  /** Exact per-node triangle counts over an undirected edge list.
    *
    * Degree-ordered orientation (the Cohen / Suri-Vassilvitskii MapReduce
    * construction): every edge points from its lower-(degree, id) endpoint
    * to the higher, so each node's out-degree is O(√|E|) regardless of how
    * skewed the raw degree distribution is — the wedge fan-out
    * Σ out-deg² is bounded by |E|^1.5 instead of the Σ deg² blow-up a
    * naive id-ordering suffers on hub nodes (a 10⁷-degree hub contributes
    * 10¹⁴ wedges un-oriented; oriented it contributes ~|E|). Each triangle
    * {a,b,c} with π(a)<π(b)<π(c) is generated exactly once as the wedge
    * (a→b, a→c) closed by the oriented edge b→c.
    *
    * Shape: degree aggregate (one shuffle), two node-keyed equi-joins for
    * wedges + closure, one final count — no iteration, no driver data.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient u–v toward the (deg, id)-larger endpoint; carry the head's
    // degree so the wedge join can compare π without a third lookup
    val oriented = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"), col("du").as("db")))
          .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"), col("o.db").as("db"))
      .localCheckpoint()
    val wedges = oriented.select(col("a"), col("b").as("w1"), col("db").as("d1"))
      .join(oriented.select(col("a"), col("b").as("w2"), col("db").as("d2")), Seq("a"))
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("w1") < col("w2")))
    val triangles = wedges
      .join(oriented.select(col("a").as("w1"), col("b").as("w2")), Seq("w1", "w2"))
      .select(col("a"), col("w1"), col("w2"))
    triangles
      .select(explode(array(col("a"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition for a fixed k: the maximal subgraph in which
    * every node has degree ≥ k, found by iterative peeling (drop nodes
    * under degree k, recompute, repeat to fixpoint). Returns the surviving
    * nodes with their in-core degree.
    *
    * Each round is one degree aggregate + two key-local semi-joins over
    * the shrinking edge set, `localCheckpoint`ed so round N never replays
    * round N−1's lineage; convergence is detected by edge count (peeling
    * is monotone, so an unchanged count IS the fixpoint). Throws if
    * `maxIter` rounds don't converge — a silently partial core would
    * be a plausible-but-wrong answer, and the unrolled-CTE oracle is only
    * valid at the fixpoint.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var cur = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().localCheckpoint()
    var curCount = cur.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val keep = cur.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("_keep"))
      val next = cur
        .join(keep, cur("src") === col("_keep"), "left_semi")
        .join(keep, cur("dst") === col("_keep"), "left_semi")
        .localCheckpoint()
      val nextCount = next.count()
      converged = nextCount == curCount
      cur = next
      curCount = nextCount
      i += 1
    }
    if (!converged && curCount > 0)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxIter rounds " +
          s"($curCount edges remain) — raise maxIter")
    cur.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Single-source shortest paths over an UNDIRECTED weighted edge list,
    * in exact BIGINT arithmetic (frontier-based Bellman-Ford).
    *
    * Each round relaxes ONLY the frontier — the nodes whose distance
    * improved last round — not every reached node: `cand = min over
    * frontier edges of dist(src) + w`, then `improved = cand < dist`.
    * That is the delta Bellman-Ford recurrence (the [[bfsHops]] frontier
    * discipline with weights): per-round join work is proportional to the
    * frontier's edge neighborhood, which peaks mid-propagation and decays
    * to zero, instead of |reached| × degree every round. The fixpoint is
    * identical to full relaxation — a node re-enters the frontier iff its
    * distance improves, and with non-negative weights every improvement
    * propagates from some frontier node — so the unrolled full-relax CTE
    * oracle still matches bit-for-bit.
    *
    * Distances are BIGINT sums of BIGINT weights: no float ever forms, so
    * results are bit-identical at any parallelism (the q99 integer-
    * PageRank discipline). `localCheckpoint` per round truncates lineage.
    * Convergence IS the empty frontier (no separate change-detection
    * join); the loop throws loudly if `maxIter` rounds don't drain it — a
    * silently partial distance table would be a plausible-but-wrong
    * answer.
    *
    * Only reached nodes appear in the output (the frontier grows from
    * `source`); weights must be non-negative for the fixpoint to be the
    * true shortest-path table within `maxIter` rounds.
    */
  def ssspInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, source: Long, maxIter: Int = 16): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst"), col(wCol).cast("long").as("w")))
      .distinct().localCheckpoint()
    var dist = sym.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist")).localCheckpoint()
    var frontier = dist
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val cand = frontier.join(sym, frontier("node") === sym("src"))
        .select(sym("dst").as("node"),
          (frontier("dist") + sym("w")).as("cand"))
        .groupBy(col("node")).agg(min(col("cand")).as("cand"))
      val improved = cand.join(dist, Seq("node"), "left")
        .filter(col("dist").isNull || col("cand") < col("dist"))
        .select(col("node"), col("cand").as("dist"))
        .localCheckpoint()
      converged = improved.isEmpty
      if (!converged) {
        dist = dist.join(improved, Seq("node"), "left_anti")
          .unionByName(improved).localCheckpoint()
        frontier = improved
      }
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ssspInt did not reach a fixpoint in $maxIter rounds — raise maxIter")
    dist
  }

  /** Multi-source BFS: minimum hop distance (≤ `maxHops`) from any seed
    * node over an undirected edge list. `seeds` is a single-column
    * DataFrame named `node`.
    *
    * Level-synchronous frontier expansion: each round is one node-keyed
    * join (frontier × symmetric edges) + a distinct + a left-anti against
    * the visited set — work proportional to the frontier's edge
    * neighborhood, never the whole graph. `localCheckpoint` after each
    * round truncates lineage (the [[graft.operators.Dedup.connectedComponents]]
    * discipline), and an empty frontier short-circuits the remaining
    * rounds, so sparse seed sets don't pay for unreachable depth.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().localCheckpoint()
    var visited = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = visited.select(col("node"))
    var hop = 0L
    var exhausted = frontier.isEmpty
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = frontier.join(sym, frontier("node") === sym("src"))
        .select(sym("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint()
      exhausted = next.isEmpty
      if (!exhausted) {
        visited = visited.unionByName(next).localCheckpoint()
        frontier = next.select(col("node"))
      }
    }
    visited
  }
}
