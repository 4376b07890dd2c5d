package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Iterate._

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
      .distinct().ckpt()
    val deg = sym.groupBy(col("src"))
      .agg(count(lit(1)).as("deg")).ckpt()
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
        .ckpt()
    }
    rank.select(col("node"), col("score"))
  }

  /** Personalized PageRank from a seed set, in exact integer arithmetic.
    *
    * Same recurrence as [[pageRankInt]] except the teleport mass lands
    * ONLY on seeds: `score' = [node∈seeds]·(0.15·scale) + 0.85·Σ_in
    * (score(src) div deg(src))`, seeds start at `scale`, everyone else at
    * 0. The result concentrates mass in the seeds' neighborhoods — the
    * "expand a trusted core" primitive for graph-based curation (seed a
    * few vetted domains/documents, rank the rest by proximity; the
    * TrustRank construction, Gyöngyi et al. VLDB 2004). All arithmetic is
    * BIGINT +, *, and integral div, so results are bit-identical at any
    * parallelism, like every Graph fixpoint here.
    *
    * Scale shape is pageRankInt's: one shuffle per iteration with
    * map-side partial sums. `seeds` is a 1-column (`node`) frame joined
    * once into the rank state — never collected; a 10⁶-row seed set costs
    * one broadcast-or-shuffle join at init.
    */
  def personalizedPageRankInt(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, iterations: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().ckpt()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val base = (scale * 15L) / 100L
    // seed flag rides inside the rank frame (the pageRankInt degree
    // trick) so each iteration stays ONE join + one aggregate
    // distinct(): a duplicated seed id would fan the left join out to two
    // rank rows and double that node's teleport mass and contributions.
    // Seeds absent from the edge list carry no graph mass and are
    // dropped (the scores are graph-restricted by construction).
    var rank = deg
      .join(seeds.select(col("node").cast("long").as("src"),
        lit(1L).as("is_seed")).distinct(), Seq("src"), "left")
      .select(col("src").as("node"), col("deg"),
        coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .withColumn("score", col("is_seed") * scale)
      .ckpt()
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(rank.select(col("node").as("src"),
          expr("score div deg").as("c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_mass"))
      rank = rank.select(col("node"), col("deg"), col("is_seed"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("is_seed"),
          (col("is_seed") * base +
            expr("(coalesce(in_mass, CAST(0 AS BIGINT)) * 85) div 100")).as("score"))
        .ckpt()
    }
    rank.select(col("node"), col("score"))
  }

  /** Edge-WEIGHTED PageRank in exact integer arithmetic: mass leaves a
    * node proportionally to edge weight — `score' = 0.15·scale + 0.85 ·
    * Σ_in (score(src)·w div wdeg(src))`, where wdeg is the node's total
    * outgoing weight. [[pageRankInt]] is the w≡1 special case; the same
    * one-shuffle-per-round shape and the same bit-identical-at-any-
    * parallelism argument (BIGINT +, *, div only). "Special case" holds
    * for a DEDUPED, self-loop-free edge list: this canon SUMS parallel /
    * reversed-duplicate weights (so (a,b,1)+(b,a,1) becomes weight 2
    * where pageRankInt's distinct() keeps weight-1 semantics) and drops
    * self-loops (pageRankInt keeps them carrying mass) — on raw directed
    * exports the two deliberately differ.
    *
    * Overflow: the per-edge product score·w must clear 2⁶³ — with total
    * mass n·scale and weights ≤ wMax that is n·scale·wMax ≲ 9·10¹⁸;
    * rescale weights (they only matter relatively) before widening.
    */
  def pageRankWeightedInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    // canonicalize FIRST (u < v, parallel-edge weights summed), THEN
    // symmetrize: a distinct() over (src, dst, w) would keep parallel
    // edges whose weights differ — (a,b,3) and (b,a,4) in a "directed"
    // input would both survive and double-count mass, silently diverging
    // from pageRankInt's one-edge-per-pair semantics
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"),
        col(wCol).cast("long").as("w"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    val sym = canon
      .select(col("u").as("src"), col("v").as("dst"), col("w"))
      .union(canon.select(col("v").as("src"), col("u").as("dst"), col("w")))
      .ckpt()
    val wdeg = sym.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val base = (scale * 15L) / 100L
    var rank = wdeg.select(col("src").as("node"), col("wdeg"),
      lit(scale).as("score"))
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(rank.select(col("node").as("src"), col("score"), col("wdeg")),
          Seq("src"))
        .select(col("dst"), expr("(score * w) div wdeg").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("in_mass"))
      rank = wdeg.select(col("src").as("node"), col("wdeg"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("wdeg"),
          (lit(base) +
            expr("(coalesce(in_mass, CAST(0 AS BIGINT)) * 85) div 100")).as("score"))
        .ckpt()
    }
    rank.select(col("node"), col("score"))
  }

  /** GNN-style neighbor-mean feature propagation in exact integers: round
    * r's feature is the integral mean of the neighbors' round-(r−1)
    * features, `h_r(v) = Σ_{u∈N(v)} h_{r−1}(u) div deg(v)` — the GCN /
    * GraphSAGE-mean aggregation step as a relational operator, giving
    * every node a deterministic summary of its r-hop neighborhood
    * WITHOUT materializing the r-hop neighbor sets (each round is one
    * edge join + one aggregate; the k-hop blowup never forms). Returns
    * (node, h0, h1, …, h_rounds).
    *
    * Nodes absent from `features` default to 0; integral division per
    * round keeps everything BIGINT (bit-identical at any parallelism),
    * quantization loss < 1 unit per round — scale features (cents, ppm)
    * accordingly.
    */
  def neighborMeanInt(edges: DataFrame, srcCol: String, dstCol: String,
      features: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().ckpt()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    var acc = deg
      .join(features.select(col("node").cast("long").as("node"),
        col("f").cast("long").as("h0")), Seq("node"), "left")
      .select(col("node"), col("deg"), coalesce(col("h0"), lit(0L)).as("h0"))
      .ckpt()
    for (r <- 1 to rounds) {
      val prev = s"h${r - 1}"
      val mean = sym
        .join(acc.select(col("node").as("src"), col(prev).as("_f")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("_f")).as("_s"))
      acc = acc.join(mean, Seq("node"), "left")
        .withColumn(s"h$r", expr("coalesce(_s, CAST(0 AS BIGINT)) div deg"))
        .drop("_s")
        .ckpt()
    }
    acc.drop("deg")
  }

  /** Link prediction by the resource-allocation index (Zhou, Lü &
    * Zhang, Eur. Phys. J. B 2009): for each NON-adjacent pair (a,b),
    * `score = Σ_{w ∈ N(a)∩N(b)} floor(scale / deg(w))` — shared rare
    * neighbors count for more than shared hubs. Returns candidate pairs
    * (a < b) with `ra_score` and the raw common-neighbor count, already
    * anti-joined against existing edges.
    *
    * Scale shape: wedges form by joining the symmetric edge list to
    * itself on the CENTER node w, so the fan-out per center is deg(w)².
    * `maxDeg` caps that — centers with deg > maxDeg are skipped BEFORE
    * the join. The cap is principled, not lossy hand-waving: a center's
    * per-pair contribution is floor(scale/deg) which is 0 once
    * deg > scale, and for maxDeg ≪ scale the dropped mass per pair is
    * bounded by scale/maxDeg — at the defaults (1e6 / 1e4) that's ≤ 100
    * of 1e6, under the resolution anyone ranks by. This is the standard
    * skew story for common-neighbor methods at 100 TB: hub centers
    * produce quadratic wedges that carry near-zero signal; drop them at
    * the source, not after the shuffle. No iteration, no driver data —
    * one degree aggregate, one self-join, one sum, one anti-join.
    */
  def linkPredictRA(edges: DataFrame, srcCol: String, dstCol: String,
      scale: Long = 1000000L, maxDeg: Long = 10000L): DataFrame = {
    require(scale >= 100, s"scale must be >= 100, got $scale")
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().ckpt()
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    // (center w, spoke) with the center's contribution precomputed;
    // hub centers are dropped BEFORE the quadratic wedge join
    val spokes = sym
      .join(deg.filter(col("deg") <= maxDeg)
        .select(col("node").as("u"), expr(s"$scale div deg").as("contrib")),
        Seq("u"))
      .select(col("u").as("w"), col("v").as("spoke"), col("contrib"))
    val wedges = spokes.select(col("w"), col("spoke").as("a"), col("contrib"))
      .join(spokes.select(col("w"), col("spoke").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
    wedges
      .groupBy(col("a"), col("b"))
      .agg(sum(col("contrib")).as("ra_score"),
        count(lit(1)).as("common_n"))
      .join(e.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"),
        "left_anti")
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
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    orientedTriangles(canonicalUndirected(edges, srcCol, dstCol))
      .select(explode(array(col("a"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))

  /** Canonical undirected edge set: (min, max) pairs, self-loops and
    * duplicate/reversed edges dropped.
    */
  private def canonicalUndirected(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Every triangle of the canonical edge set `e`, exactly once, as
    * (a, w1, w2) with π(a) < π(w1) < π(w2) under the degree-ordered
    * orientation (see [[triangleCounts]] — this is its enumeration core,
    * shared with [[kTruss]]'s per-edge support).
    */
  private def orientedTriangles(e: DataFrame): DataFrame = {
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
      .ckpt()
    val wedges = oriented.select(col("a"), col("b").as("w1"), col("db").as("d1"))
      .join(oriented.select(col("a"), col("b").as("w2"), col("db").as("d2")), Seq("a"))
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("w1") < col("w2")))
    wedges
      .join(oriented.select(col("a").as("w1"), col("b").as("w2")), Seq("w1", "w2"))
      .select(col("a"), col("w1"), col("w2"))
  }

  /** k-TRUSS: the maximal subgraph whose every edge closes ≥ k−2
    * triangles WITHIN the subgraph (Cohen 2008) — the edge-level
    * cohesion primitive a notch stronger than [[kCore]]'s node degree
    * (every k-truss sits inside the (k−1)-core, but a hub-and-spoke
    * star that survives coring dissolves instantly here). Iterative
    * peeling: recompute per-edge triangle support on the surviving
    * edges, drop edges under k−2, repeat to fixpoint.
    *
    * Support rides [[orientedTriangles]] (degree-ordered, O(|E|^1.5)
    * wedge fan-out), each triangle crediting its three canonical edges —
    * so a peel round is the triangle plan plus one edge-keyed join, on a
    * monotonically shrinking set, `ckpt`ed per round like [[kCore]].
    * Convergence is detected by edge count (peeling is monotone) and
    * NOT converging in `maxIter` throws — a partial truss is a
    * plausible-but-wrong answer, and the unrolled-CTE oracle is only
    * valid at the fixpoint. Returns the surviving canonical edges with
    * their in-truss support.
    */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 20): DataFrame = {
    require(k >= 3, s"k must be >= 3 (the 2-truss is every edge), got $k")
    def support(e: DataFrame): DataFrame =
      orientedTriangles(e)
        .select(explode(array(
          struct(least(col("a"), col("w1")).as("u"),
            greatest(col("a"), col("w1")).as("v")),
          struct(least(col("a"), col("w2")).as("u"),
            greatest(col("a"), col("w2")).as("v")),
          struct(least(col("w1"), col("w2")).as("u"),
            greatest(col("w1"), col("w2")).as("v")))).as("t"))
        .select(col("t.u").as("u"), col("t.v").as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
    var cur = canonicalUndirected(edges, srcCol, dstCol).ckpt()
    var curCount = cur.count()
    var converged = curCount == 0
    // carries the converged round's (u, v, support) out of the loop: in
    // the round that detects the fixpoint nothing was dropped, so the
    // supports it computed ARE the in-truss supports — recomputing them
    // after the loop would re-run the triangle enumeration (the most
    // expensive stage) once more for nothing
    var supported = cur.withColumn("support", lit(0L))
    var i = 0
    while (!converged && i < maxIter) {
      supported = cur.join(support(cur), Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          coalesce(col("support"), lit(0L)).as("support"))
        .filter(col("support") >= k - 2).ckpt()
      val nextCount = supported.count()
      converged = nextCount == curCount
      cur = supported.select(col("u"), col("v"))
      curCount = nextCount
      i += 1
    }
    if (!converged && curCount > 0)
      throw new IllegalStateException(
        s"kTruss(k=$k) did not converge in $maxIter rounds " +
          s"($curCount edges remain) — raise maxIter")
    supported
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
      .distinct().ckpt()
    var curCount = cur.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val keep = cur.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("_keep"))
      val next = cur
        .join(keep, cur("src") === col("_keep"), "left_semi")
        .join(keep, cur("dst") === col("_keep"), "left_semi")
        .ckpt()
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
      .distinct().ckpt()
    var dist = sym.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist")).ckpt()
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
        .ckpt()
      converged = improved.isEmpty
      if (!converged) {
        dist = dist.join(improved, Seq("node"), "left_anti")
          .unionByName(improved).ckpt()
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
      .distinct().ckpt()
    var visited = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("hops", lit(0L)).ckpt()
    var frontier = visited.select(col("node"))
    var hop = 0L
    var exhausted = frontier.isEmpty
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = frontier.join(sym, frontier("node") === sym("src"))
        .select(sym("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .ckpt()
      exhausted = next.isEmpty
      if (!exhausted) {
        visited = visited.unionByName(next).ckpt()
        frontier = next.select(col("node"))
      }
    }
    visited
  }

  /** STRONGLY connected components of a DIRECTED edge list.
    *
    * Two-level decomposition (the block-centric pattern — Blogel, Yan et
    * al. VLDB 2014; Giraph++ "think like a graph"): directed SCCs can
    * never span two WEAKLY connected components, so one
    * [[Dedup.connectedComponentsStar]] pass (O(log n) rounds) partitions
    * the edge set by WCC id, and each component whose edge count fits an
    * executor runs a LOCAL iterative Tarjan (1972) inside
    * `flatMapGroups` — one shuffle keyed by component, all components in
    * parallel, exact answers. Components larger than
    * `maxLocalComponent` edges (the web-scale giant-component case) fall
    * back automatically to the distributed pair-label peeling of
    * [[stronglyConnectedComponentsIterative]] — nothing ever silently
    * truncates.
    *
    * Scale rationale: real corpora (per-order item chains, per-domain
    * link graphs) decompose into many memory-sized WCCs, so the hybrid
    * turns an inherently multi-round global fixpoint into ONE grouped
    * map over components — ~4 jobs total instead of rounds×jobs. The
    * giant-component fallback keeps the operator total: correctness
    * never depends on the memory guard. `flatMapGroups` (not an
    * expression) is justified here: within-component SCC is genuine
    * per-group imperative logic, the documented last-resort case.
    *
    * Returns (node, scc_id), scc_id = minimum member id (the
    * [[Dedup.connectedComponents]] canonical convention, deterministic
    * under any traversal order). Nodes on no cycle are singletons.
    */
  def stronglyConnectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 30,
      maxLocalComponent: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct().ckpt()
    // WCC id per node; component edge counts gate the local path
    val wcc = Dedup.connectedComponentsStar(e, "src", "dst")
    val eComp = e
      .join(wcc.select(col("node").as("src"), col("cluster_id").as("comp")),
        Seq("src"))
      .ckpt()
    val sizes = eComp.groupBy(col("comp")).agg(count(lit(1)).as("_n"))
    val sized = eComp.join(sizes, Seq("comp")).ckpt()
    val local = sized.filter(col("_n") <= maxLocalComponent)
      .select(col("comp"), col("src"), col("dst"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups((_: Long, it: Iterator[(Long, Long, Long)]) =>
        tarjanScc(it.map(t => (t._2, t._3))))
      .toDF("node", "scc_id")
    val big = sized.filter(col("_n") > maxLocalComponent)
      .select(col("src"), col("dst"))
    if (big.isEmpty) local
    else local.unionByName(
      stronglyConnectedComponentsIterative(big, "src", "dst", maxIter))
  }

  /** Exact single-component Tarjan over an edge iterator — the local leaf
    * of [[stronglyConnectedComponents]]. Iterative (explicit DFS frame
    * stack — component diameter would overflow the JVM call stack), one
    * pass, O(V+E). Emits (node, min member id per SCC).
    */
  private def tarjanScc(edges: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    val nodes = mutable.LinkedHashSet.empty[Long]
    edges.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      nodes += s
      nodes += d
    }
    val index = mutable.HashMap.empty[Long, Int]
    val low = mutable.HashMap.empty[Long, Int]
    val onStack = mutable.HashSet.empty[Long]
    val stack = mutable.ArrayBuffer.empty[Long]
    var counter = 0
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    val empty = mutable.ArrayBuffer.empty[Long]
    for (root <- nodes if !index.contains(root)) {
      val frames = mutable.ArrayBuffer.empty[(Long, Int)]
      frames += ((root, 0))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      while (frames.nonEmpty) {
        val (v, ci) = frames.last
        val succ = adj.getOrElse(v, empty)
        if (ci < succ.length) {
          frames(frames.length - 1) = (v, ci + 1)
          val w = succ(ci)
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            frames += ((w, 0))
          } else if (onStack(w)) {
            low(v) = math.min(low(v), index(w))
          }
        } else {
          frames.remove(frames.length - 1)
          if (frames.nonEmpty) {
            val p = frames.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            var members = List.empty[Long]
            var w = -1L
            while (w != v) {
              w = stack.remove(stack.length - 1)
              onStack -= w
              members ::= w
            }
            val id = members.min
            members.foreach(m => out += ((m, id)))
          }
        }
      }
    }
    out.iterator
  }

  /** Distributed SCC by iterative peeling — the giant-component fallback
    * of [[stronglyConnectedComponents]], usable standalone when no
    * component fits an executor.
    *
    * (F,B) pair-label scheme (the multi-pivot FW-BW family — Fleischer
    * et al. 2000, Hong et al. 2013): cycles of mutual reachability, the
    * structure [[Dedup.connectedComponents]] cannot see because it
    * symmetrizes.
    *
    * Each outer round runs two UNCONFINED max-label fixpoints with
    * POINTER JUMPING (label(v) ← max(label(v), label(label(v))) — sound
    * because label(v) is always a node known to reach / be reachable
    * from v, so its own label composes transitively), which cuts rounds
    * from O(diameter) to O(log diameter):
    * (1) FORWARD:  F(v) = the largest id that reaches v (incl. v);
    * (2) BACKWARD: B(v) = the largest id v reaches (incl. v) — same
    *     fixpoint over reversed edges; independent of (1).
    * Peel: F(v) = B(v) = r  ⟺  v ↔ r  ⟺  v ∈ SCC(r) — and every member
    * of SCC(r) shares the pair (r, r), so only COMPLETE SCCs leave.
    * Shrink: mutual reachability forces EQUAL PAIRS, so no SCC crosses a
    * pair-class boundary — every surviving edge whose endpoints disagree
    * on (F, B) can never be inside an SCC and is dropped. This is what
    * makes DAG-heavy graphs fast: a pure DAG loses all its edges after
    * one round (every path passes a label change) and the second round
    * peels everything as singletons — where root-peeling colorings
    * (Orzan 2004) need O(chain length) rounds against descending ids.
    * Progress guarantee: each pair class contains its own maximum m with
    * F(m) = B(m) = m, so every class peels ≥ 1 SCC per round; the loud
    * `maxIter` guard turns pathology into a failure, not a wrong answer.
    *
    * Scale shape: everything is node-keyed equi-joins and map-side-
    * partial max-aggregations over the (shrinking) edge and label
    * tables; per-round [[Iterate.ckpt]] truncates lineage AND resets
    * cost stats (plain localCheckpoint compounds sizeInBytes ~5× per
    * round here — see [[Iterate]]). The driver sees only one-row
    * convergence checks.
    *
    * Returns (node, scc_id) with scc_id = the minimum member id
    * (the [[Dedup.connectedComponents]] canonical convention). Nodes on
    * no cycle are singleton SCCs of themselves.
    */
  def stronglyConnectedComponentsIterative(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 30): DataFrame = {
    var rem = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct().ckpt()
    var nodes = rem.select(col("src").as("node"))
      .union(rem.select(col("dst").as("node"))).distinct().ckpt()
    val spark = edges.sparkSession
    var result = spark.range(0)
      .select(col("id").as("node"), col("id").as("scc_id"))

    // one double-jump per node per round: lab ← max(lab, lab(lab(lab(v))))
    // (edge step, then two pointer-jump compositions — identical exchange
    // subtrees dedupe via ReuseExchange, so jumps cost broadcast joins,
    // not recomputation)
    def jump(df: DataFrame): DataFrame = {
      val fj = df.select(col("node").as("f"), col("f").as("_ff"))
      val bj = df.select(col("node").as("b"), col("b").as("_bb"))
      df.join(fj, Seq("f"), "left").join(bj, Seq("b"), "left")
        .select(col("node"),
          greatest(col("f"), coalesce(col("_ff"), col("f"))).as("f"),
          greatest(col("b"), coalesce(col("_bb"), col("b"))).as("b"))
    }

    var outer = 0
    var done = nodes.isEmpty
    while (!done && outer < maxIter) {
      // both fixpoints in ONE loop over a (node, f, b) table — half the
      // materializations of running them separately
      var lab = nodes.select(col("node"), col("node").as("f"),
        col("node").as("b")).ckpt()
      var stable = false
      var inner = 0
      while (!stable && inner < maxIter) {
        val fEdge = rem
          .join(lab.select(col("node").as("src"), col("f").as("_fc")), "src")
          .groupBy(col("dst").as("node")).agg(max(col("_fc")).as("_fe"))
        val bEdge = rem
          .join(lab.select(col("node").as("dst"), col("b").as("_bc")), "dst")
          .groupBy(col("src").as("node")).agg(max(col("_bc")).as("_be"))
        val stepped = lab
          .join(fEdge, Seq("node"), "left")
          .join(bEdge, Seq("node"), "left")
          .select(col("node"),
            greatest(col("f"), coalesce(col("_fe"), col("f"))).as("f"),
            greatest(col("b"), coalesce(col("_be"), col("b"))).as("b"))
        val next = jump(jump(stepped))
          .join(lab.select(col("node"), col("f").as("_of"),
            col("b").as("_ob")), Seq("node"))
          .ckpt()
        stable = next
          .filter(col("f") =!= col("_of") || col("b") =!= col("_ob")).isEmpty
        lab = next.select(col("node"), col("f"), col("b"))
        inner += 1
      }
      require(stable, s"SCC label propagation did not stabilize in " +
        s"$maxIter rounds — raise maxIter")
      if (sys.env.contains("GRAFT_SCC_DEBUG")) println(s"[scc] inner=$inner")
      // F(v) = B(v) = r ⟺ v ↔ r: peel SCC(r), canonical = min member
      val members = lab.filter(col("f") === col("b"))
        .select(col("node"), col("f"))
      val labeled = members
        .join(members.groupBy(col("f")).agg(min(col("node")).as("scc_id")),
          Seq("f"))
        .select(col("node"), col("scc_id"))
      // keep only edges whose endpoints agree on BOTH labels (no SCC
      // crosses a pair boundary); same-pair member↔member edges are the
      // peeled SCCs' internal edges — one anti-join on src removes them
      val remNext = rem
        .join(lab.select(col("node").as("src"), col("f").as("_fs"),
          col("b").as("_bs")), Seq("src"))
        .join(lab.select(col("node").as("dst"), col("f").as("_fd"),
          col("b").as("_bd")), Seq("dst"))
        .filter(col("_fs") === col("_fd") && col("_bs") === col("_bd"))
        .join(members.select(col("node").as("src")), Seq("src"), "left_anti")
        .select(col("src"), col("dst")).ckpt()
      // a non-member that lost ALL its edges can never rejoin a cycle —
      // peel it as a singleton now instead of spending a later round
      val orphaned = nodes
        .join(members.select("node"), Seq("node"), "left_anti")
        .join(remNext.select(col("src").as("node"))
          .union(remNext.select(col("dst").as("node"))).distinct(),
          Seq("node"), "left_anti")
        .select(col("node"), col("node").as("scc_id"))
      // lazy accumulation: every input is ckpt-rooted (lab, remNext), so
      // the union's lineage stays flat without materializing per round
      result = result.unionByName(labeled).unionByName(orphaned)
      rem = remNext
      nodes = remNext.select(col("src").as("node"))
        .union(remNext.select(col("dst").as("node"))).distinct().ckpt()
      done = nodes.isEmpty
      outer += 1
      if (sys.env.contains("GRAFT_SCC_DEBUG")) println(s"[scc] outer=$outer done=$done")
    }
    require(done, s"SCC peeling did not finish in $maxIter rounds — " +
      "raise maxIter")
    result
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert & Kumara 2007), made deterministic: every node starts with
    * its own id as label, and each round adopts the most frequent label
    * among its neighbors, ties broken toward the SMALLEST label. The
    * update is synchronous (round t+1 reads only round-t labels) and the
    * tie-break is total, so the result after a fixed number of rounds is
    * a pure function of the edge set — bit-identical across partition
    * counts, shuffle orders, and engines, unlike the randomized
    * asynchronous LPA of the paper. Fixed `rounds` rather than
    * convergence detection: synchronous LPA can 2-cycle on bipartite
    * structures, so a convergence loop may never exit; a fixed horizon is
    * both deterministic and oracle-able (unrolled SQL rounds).
    *
    * Complements [[Dedup.connectedComponents]] (which finds CONNECTED
    * components): LPA splits a connected graph into densely-linked
    * communities — the corpus-clustering / topic-bucketing primitive.
    *
    * Scale shape: per round, ONE join (symmetric edges × labels, both
    * sides keyed on the node) + one count aggregate + one per-node argmax
    * via window row_number on (node) — rank pushdown keeps only the top
    * row per node before the exchange. `localCheckpoint` per round keeps
    * round N's plan one iteration deep. No driver data, no collect.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().ckpt()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label")).ckpt()
    for (r <- 1 to rounds) {
      val votes = sym
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val next = Relational.topKPerGroup(votes, Seq(col("node")),
          Seq(col("n_votes").desc, col("label").asc), 1, "_rnk")
        .select(col("node"), col("label"))
      // intermediate rounds checkpoint (flat lineage); the LAST round
      // stays lazy so callers compose/inspect the round's actual plan
      // and Verify/Bench don't pay a redundant materialization
      labels = if (r < rounds) next.ckpt() else next
    }
    labels
  }

  /** Per-community modularity contributions in EXACT integer arithmetic.
    *
    * Newman's modularity Q = Σ_c [ e_c/m − (d_c/2m)² ] over communities c
    * (e_c = internal edges, d_c = degree sum, m = total edges) is a sum
    * of rationals with common denominator 4m² — so 4m²·Q is the INTEGER
    * Σ_c [ 4m·e_c − d_c² ]. This emits that integer per community
    * (`contrib_4m2`) alongside the raw counts: no float division ever
    * forms, the result is bit-identical at any parallelism, and the
    * caller divides by 4m² at whatever precision it reports in.
    *
    * Scale shape: one canonical-edge distinct, one degree aggregate, two
    * label joins keyed on the edge endpoints, one per-label aggregate;
    * the 1-row m scalar broadcasts. Communities with no internal edges
    * still appear (left join from the membership side).
    *
    * Overflow headroom: |contrib| ≤ max(4m·e_c, d_c²) with d_c ≤ 2m, so
    * BIGINT is exact below ~1.5e9 edges; past that, evaluate the same
    * two terms in DECIMAL(38,0) — the counts themselves stay BIGINT far
    * beyond any real graph.
    */
  def modularityInt(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().ckpt()
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val internal = e
      .join(lab.select(col("node").as("u"), col("label").as("_lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("_lv")), Seq("v"))
      .filter(col("_lu") === col("_lv"))
      .groupBy(col("_lu").as("label"))
      .agg(count(lit(1)).as("internal_edges"))
    val perComm = deg.join(lab, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    perComm
      .join(internal, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum"),
        (lit(4L) * col("m") * coalesce(col("internal_edges"), lit(0L)) -
          col("degree_sum") * col("degree_sum")).as("contrib_4m2"))
  }

  /** DeepWalk-style random-walk corpus (Perozzi et al., KDD 2014) with a
    * DETERMINISTIC coin: one walk starts at every node, and at step t the
    * walk at `walk_id` moves to neighbor rank
    * `md5("walk_id:t") mod deg(cur)` — neighbors ranked by ascending id.
    * The hash plays the RNG's role (uniform-ish, independent across walks
    * and steps) while keeping the corpus a pure function of the edge set:
    * reproducible across runs, partition counts, and engines, and exactly
    * mirrorable in SQL (the q62 md5-bucket recipe applied per step).
    * Emits (walk_id, step, node) — the sentence corpus a skip-gram
    * embedding trains on.
    *
    * Scale shape: the neighbor ranking is one per-node window (keyed
    * exchange, rank local); each step is two equi-joins — frontier×degree
    * on the current node, then (cur, pick)×(src, rnk) — so a full corpus
    * of n walks × L steps costs L bounded join rounds, never a fan-out.
    * Walk state never visits the driver; `ckpt` per step keeps plans
    * flat. Walk count scales by seeding from a node subset upstream.
    */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct().ckpt()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    val nbr = sym.select(col("src"), col("dst"),
      (row_number().over(w) - lit(1)).cast("long").as("rnk")).ckpt()
    val deg = nbr.groupBy(col("src").as("cur")).agg(count(lit(1)).as("deg"))
      .ckpt()
    var frontier = deg.select(col("cur").as("walk_id"), col("cur"))
    var out = frontier.select(col("walk_id"), lit(0L).as("step"),
      col("cur").as("node"))
    for (t <- 1 to steps) {
      val pick = conv(substring(md5(concat(col("walk_id").cast("string"),
        lit(s":$t"))), 1, 8), 16, 10).cast("long") % col("deg")
      frontier = frontier
        .join(deg, Seq("cur"))
        .withColumn("_pick", pick)
        .join(nbr.select(col("src").as("cur"), col("dst").as("_nxt"),
          col("rnk").as("_pick")), Seq("cur", "_pick"))
        .select(col("walk_id"), col("_nxt").as("cur"))
        .ckpt()
      out = out.unionByName(frontier.select(col("walk_id"),
        lit(t.toLong).as("step"), col("cur").as("node")))
    }
    out
  }

  /** One Louvain-style refinement pass (Blondel et al. 2008, phase 1) over
    * an existing labeling, in EXACT integer arithmetic and with a
    * CONFLICT-FREE synchronous move rule that PROVABLY never decreases
    * modularity.
    *
    * For node i in community a with degree k_i, moving to neighbor
    * community b changes 4m²·Q by the integer
    *
    *   gain = 4m·(k_i→b − k_i→a) + 2·k_i·(d_a − d_b) − 2·k_i²
    *
    * where k_i→c counts i's edges into community c, d_a is a's degree sum
    * INCLUDING i, and d_b is b's EXCLUDING i (i ∉ b) — the standard ΔQ
    * scaled by 4m² so no float ever forms (same convention as
    * [[modularityInt]]'s `contrib_4m2`).
    *
    * Synchronous simultaneous moves can conflict (two gains computed
    * against the same old labeling stop being additive when the moves
    * touch a shared community), so a naive "every node takes its best
    * move" pass can DECREASE Q. This pass instead accepts a move
    * (i, a→b) only when it is the best candidate move — by (gain desc,
    * node asc) — within BOTH community a and community b. Any two
    * accepted moves therefore touch disjoint {source, target} community
    * pairs; gains over disjoint community sets are additive, so
    *
    *   Q(after)·4m² = Q(before)·4m² + Σ accepted gains  >  Q(before)·4m²
    *
    * exactly (every accepted gain is > 0). The rule is a per-community
    * argmax — two keyed aggregates, NO global sort — and the tie-break is
    * total (node ids are unique per move), so the accepted set is a pure
    * function of the edge set: bit-identical at any parallelism, and
    * exactly mirrorable in SQL (two role-partitioned row_numbers).
    *
    * Returns the accepted moves `(node, from_label, to_label, gain_4m2)`;
    * [[refineLabels]] applies them. Run to fixpoint by re-calling —
    * per pass at least one move (the globally best one always wins both
    * its communities) is accepted while any positive-gain move exists,
    * so iteration terminates at a local optimum like sequential Louvain.
    *
    * Scale shape: one symmetric-edge distinct, one degree aggregate, one
    * (node, neighbor-label) count (the only quadratic-looking step — it is
    * Σ_i deg(i) = 2m rows before the group), two membership joins, two
    * per-community argmax aggregates. The 1-row m scalar broadcasts.
    * Everything keys on node or label — no global window anywhere.
    */
  def refineMoves(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().ckpt()
    val sym = e.select(col("u").as("src"), col("v").as("dst"))
      .union(e.select(col("v").as("src"), col("u").as("dst")))
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label")).ckpt()
    val m = e.agg(count(lit(1)).as("m"))
    val ki = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("k_i"))
    val dComm = ki.join(lab, Seq("node"))
      .groupBy(col("label")).agg(sum(col("k_i")).as("d_c")).ckpt()
    // k_i→c: i's edge count into each adjacent community (old labels)
    val kTo = sym
      .join(lab.select(col("node").as("dst"), col("label").as("c")), Seq("dst"))
      .groupBy(col("src").as("node"), col("c"))
      .agg(count(lit(1)).as("k_to"))
    // per node: own community a, k_i, d_a, and k_i→a (0 when i has no
    // neighbor inside its own community)
    val self = lab.select(col("node"), col("label").as("a"))
      .join(ki, Seq("node"))
      .join(dComm.select(col("label").as("a"), col("d_c").as("d_a")), Seq("a"))
      .join(kTo.select(col("node"), col("c").as("a"), col("k_to").as("k_ia")),
        Seq("node", "a"), "left")
      .na.fill(0L, Seq("k_ia"))
    val cand = kTo
      .join(self, Seq("node"))
      .filter(col("c") =!= col("a"))
      .join(dComm.select(col("label").as("c"), col("d_c").as("d_b")),
        Seq("c"))
      .crossJoin(broadcast(m))
      .select(col("node"), col("a"), col("c").as("b"),
        (lit(4L) * col("m") * (col("k_to") - col("k_ia")) +
          lit(2L) * col("k_i") * (col("d_a") - col("d_b")) -
          lit(2L) * col("k_i") * col("k_i")).as("gain_4m2"))
      .filter(col("gain_4m2") > 0)
    // best candidate per node (rank pushdown: one row per node survives)
    val best = Relational.topKPerGroup(cand, Seq(col("node")),
        Seq(col("gain_4m2").desc, col("b").asc), 1, "_rnk")
      .select(col("node"), col("a"), col("b"), col("gain_4m2")).ckpt()
    // conflict-free accept: the move must be the (gain desc, node asc)
    // argmax within BOTH its source and its target community
    val roles = best.select(col("a").as("comm"), col("gain_4m2"), col("node"))
      .unionByName(best.select(col("b").as("comm"), col("gain_4m2"),
        col("node")))
    val bestPerComm = roles.groupBy(col("comm"))
      .agg(min(struct((-col("gain_4m2")).as("ng"), col("node").as("node")))
        .as("best"))
    val moveKey = struct((-col("gain_4m2")).as("ng"), col("node").as("node"))
    best
      .join(bestPerComm.select(col("comm").as("a"), col("best").as("_ba")),
        Seq("a"))
      .join(bestPerComm.select(col("comm").as("b"), col("best").as("_bb")),
        Seq("b"))
      .filter(moveKey === col("_ba") && moveKey === col("_bb"))
      .select(col("node"), col("a").as("from_label"), col("b").as("to_label"),
        col("gain_4m2"))
  }

  /** Applies [[refineMoves]] to a labeling: moved nodes adopt their target
    * community, everyone else keeps their label. One left join on node.
    */
  def refineLabels(labels: DataFrame, moves: DataFrame): DataFrame =
    labels.select(col("node").cast("long").as("node"),
        col("label").cast("long").as("label"))
      .join(moves.select(col("node"), col("to_label")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("to_label"), col("label")).as("label"))

  /** HITS hubs-and-authorities over a DIRECTED edge list (Kleinberg,
    * JACM 1999), in exact integer arithmetic. Per iteration: authority
    * mass `a'(v) = Σ_{u→v} h(u)` then hub mass `h'(u) = Σ_{u→v} a(v)`,
    * each half-step renormalized by the GLOBAL max — `x·scale div
    * max(x')` — instead of the textbook L2 norm, because an integer max
    * is exactly computable and engine-portable where a float √Σx² is
    * neither. The fixpoint direction is identical (normalization choice
    * never changes the ranking within an iteration), and every score is
    * a BIGINT in [0, scale] with the top hub/authority pinned at
    * exactly `scale`.
    *
    * On the natural bipartite buyer→item graph this yields the
    * "discerning buyers vs consensus items" decomposition that degree
    * counts miss: an authority is an item bought by HIGH-SCORE buyers,
    * recursively.
    *
    * Output: one row per node and side — (`side` ∈ hub|auth, `node`,
    * `score`) — after `iterations` full rounds.
    *
    * Scale shape: two keyed join+aggregate shuffles per iteration (the
    * same economics as [[pageRankInt]] — never an all-pairs form); the
    * max is a 1-row aggregate broadcast back. Overflow headroom:
    * `Σ h ≤ n·scale` and the renormalizing multiply peaks at
    * `n·scale²` ⇒ safe below ~9·10⁶ hub nodes at the default scale;
    * pass a smaller `scale` for larger graphs (documented trade:
    * quantization 1/scale).
    */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale >= 100, s"scale must be >= 100, got $scale")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().ckpt()
    var hub = e.select(col("src")).distinct()
      .withColumn("h", lit(scale))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = e.join(hub, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
      val maxA = aRaw.agg(max(col("ar")).as("mxa"))
      auth = aRaw.crossJoin(broadcast(maxA))
        .select(col("dst"), expr(s"ar * $scale div mxa").as("a")).ckpt()
      val hRaw = e.join(auth, Seq("dst"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
      val maxH = hRaw.agg(max(col("hr")).as("mxh"))
      hub = hRaw.crossJoin(broadcast(maxH))
        .select(col("src"), expr(s"hr * $scale div mxh").as("h")).ckpt()
    }
    hub.select(lit("hub").as("side"), col("src").as("node"),
        col("h").as("score"))
      .unionByName(auth.select(lit("auth").as("side"),
        col("dst").as("node"), col("a").as("score")))
  }

  /** Per-node local CLUSTERING COEFFICIENT, exact ppm: `2·T(v)·10⁶ div
    * (deg(v)·(deg(v)−1))` where `T(v)` is the node's triangle count from
    * [[triangleCounts]] (degree-ordered orientation — O(|E|^1.5) wedges,
    * never the u×v×w triple join) and `deg` counts DISTINCT canonical
    * neighbors. The "how clique-like is this node's neighborhood"
    * primitive: near 10⁶ flags tight co-purchase/co-citation pockets,
    * near 0 flags hub-and-spoke stars. Degree-1 nodes yield NULL (the
    * ratio is 0/0 — no wedge exists), not a fake 0; triangle-free nodes
    * yield exact 0 via the left join's coalesce.
    *
    * Scale shape: [[triangleCounts]]'s plan plus one degree aggregate
    * and a node-keyed left join. Overflow: `2·T·10⁶` holds to ~4.6·10¹²
    * triangles per node — beyond any real degree distribution.
    */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // canonicalize ONCE and checkpoint: the edge set feeds both the
    // degree aggregate and the triangle enumeration, and calling
    // triangleCounts(edges, ...) here would re-run canonicalUndirected's
    // corpus-scale distinct shuffle a second time on identical input
    val e = canonicalUndirected(edges, srcCol, dstCol).ckpt()
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = orientedTriangles(e)
      .select(explode(array(col("a"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(tri, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .select(col("node"), col("degree"), col("n_triangles"),
        when(col("degree") >= 2,
          expr("2 * n_triangles * 1000000 div (degree * (degree - 1))"))
          .as("ccoef_ppm"))
  }
}
