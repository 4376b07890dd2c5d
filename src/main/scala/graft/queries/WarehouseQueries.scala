package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{RankedEntry, TopKAggregator}
import graft.operators.{Curation, Graph, Quality, Relational}
import graft.sources.Tables

/** Warehouse-lifecycle queries: dimension history (SCD2), partial-aggregate
  * reuse, time-range windows, multi-dimensional layout (Z-order), bounded
  * top-k aggregation, graph centrality, and stratified sampling.
  *
  * Determinism recipe (see graft-project-state memory): money as
  * floor-scaled BIGINT cents, window orders made total with id tie-breaks,
  * integer-only iteration arithmetic, md5-derived buckets — so every query
  * hash-matches its DuckDB oracle bit-for-bit.
  */
object WarehouseQueries {

  /** The shared co-purchase graph: part pairs sharing >= 2 distinct
    * orders (the q99/q116/q159/q175-q176/q192/q197-q198 edge list) —
    * ONE definition so the edge contract cannot drift between queries.
    */
  private def coEdges(s: SparkSession, d: String): DataFrame =
    Relational.coOccurrence(
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey")),
      "ok", "l_partkey")
      .filter(col("n_groups") >= 2)

  /** DuckDB mirror of Relational.zorderValue: the same shift/mask sum. */
  private def zorderSql(cols: Seq[String], bits: Int): String =
    cols.zipWithIndex.flatMap { case (c, j) =>
      (0 until bits).map(i =>
        s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * cols.size + j})")
    }.mkString("(", " + ", ")")

  /** One integer-PageRank iteration as a DuckDB CTE (mirrors
    * Graph.pageRankInt): `//` is DuckDB's integral division = Spark's
    * `div` for the non-negative values used here.
    */
  private def prIterSql(cur: String, prev: String): String =
    s"""$cur AS (
       |  SELECT d.src AS node,
       |         CAST(150000 + (coalesce(m.in_mass, 0) * 85) // 100 AS BIGINT) AS score
       |  FROM deg d LEFT JOIN (
       |    SELECT s.dst AS node, CAST(sum(r.score // g.deg) AS BIGINT) AS in_mass
       |    FROM sym s JOIN $prev r ON s.src = r.node JOIN deg g ON s.src = g.src
       |    GROUP BY s.dst) m ON d.src = m.node
       |)""".stripMargin

  /** One synchronous label-propagation round as a DuckDB CTE (mirrors
    * Graph.labelPropagation): per node, the most frequent neighbor label,
    * ties broken toward the smallest label.
    */
  private def lpaIterSql(cur: String, prev: String): String =
    s"""$cur AS (
       |  SELECT node, label FROM (
       |    SELECT node, label,
       |           row_number() OVER (PARTITION BY node
       |             ORDER BY n DESC, label ASC) AS rn
       |    FROM (SELECT s.dst AS node, r.label, count(*) AS n
       |          FROM sym s JOIN $prev r ON s.src = r.node
       |          GROUP BY 1, 2))
       |  WHERE rn = 1
       |)""".stripMargin

  /** One personalized-PageRank iteration as a DuckDB CTE (mirrors
    * Graph.personalizedPageRankInt): identical to [[prIterSql]] except the
    * teleport term is gated on the seed flag carried by the `sd` CTE.
    */
  private def pprIterSql(cur: String, prev: String): String =
    s"""$cur AS (
       |  SELECT sd.node,
       |         CAST(sd.is_seed * 150000 +
       |              (coalesce(m.in_mass, 0) * 85) // 100 AS BIGINT) AS score
       |  FROM sd LEFT JOIN (
       |    SELECT s.dst AS node, CAST(sum(r.score // g.deg) AS BIGINT) AS in_mass
       |    FROM sym s JOIN $prev r ON s.src = r.node JOIN deg g ON s.src = g.src
       |    GROUP BY s.dst) m ON sd.node = m.node
       |)""".stripMargin

  /** One FULL Bellman-Ford relaxation round as SQL: dist' = min over
    * (keep, relax-across-every-edge). `Graph.ssspInt` relaxes only the
    * frontier, but the two recurrences share the same fixpoint, which is
    * where the comparison happens (ssspInt throws before convergence).
    */
  private def ssspIterSql(cur: String, prev: String): String =
    s"""$cur AS MATERIALIZED (
       |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
       |    SELECT node, dist FROM $prev
       |    UNION ALL
       |    SELECT e.dst AS node, p.dist + e.w AS dist
       |    FROM $prev p JOIN wsym e ON e.src = p.node
       |  ) GROUP BY node
       |)""".stripMargin

  /** The deterministic old/new order snapshots q111/q112 diff: old drops
    * keys ≡ 3 (mod 10), new drops keys ≡ 7 (mod 10) and bumps every 5th
    * key's price by 500 cents — yielding inserts, deletes, and updates
    * from the same base table in both engines.
    */
  private[queries] def cdcSnapshots(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val base = Tables.orders(s, d).select(col("o_orderkey"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderstatus"))
    val old = base.filter(col("o_orderkey") % 10 =!= 3)
    val neu = base.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("cents", when(col("o_orderkey") % 5 === 0,
        col("cents") + 500).otherwise(col("cents")))
    (old, neu)
  }

  /** DuckDB mirror of [[cdcSnapshots]] as CTE text, shared by q111/q112. */
  private val CdcCte =
    """WITH base AS (
      |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      |         o_orderstatus
      |  FROM orders
      |), old AS (
      |  SELECT * FROM base WHERE o_orderkey % 10 <> 3
      |), new AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 5 = 0 THEN cents + 500 ELSE cents END
      |           AS cents,
      |         o_orderstatus
      |  FROM base WHERE o_orderkey % 10 <> 7
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD type 2: each customer's order history as validity intervals —
    // version, valid_from/valid_to, is_current. One window, one shuffle.
    "q94_scd2" -> ((s, d) =>
      Relational.scd2(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate")),
        Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          col("version").cast("long").as("version"),
          col("valid_from"), col("valid_to"), col("is_current"))),

    // Partial-aggregate reuse: DAILY partials (sum/count/max) merged into
    // MONTHLY totals — sum-of-sums, sum-of-counts, max-of-maxes. The
    // oracle aggregates the base table directly, so a hash match PROVES
    // the two-level merge is lossless. This is the ingest-time-rollup /
    // query-time-merge pattern that turns a 100 TB scan into a reread of
    // tiny partial tables.
    "q95_rollup_merge" -> ((s, d) => {
      val daily = Tables.lineitem(s, d)
        .select(date_trunc("day", col("l_shipdate")).as("day"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy(col("day"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_rows"),
          max(col("qty")).as("max_qty"))
      daily
        .groupBy(date_trunc("month", col("day")).as("month"))
        .agg(sum(col("sum_qty")).as("sum_qty"), sum(col("n_rows")).as("n_rows"),
          max(col("max_qty")).as("max_qty"))
    }),

    // Z-order (Morton) layout key over (partkey, suppkey): the clustering
    // value a table-layout OPTIMIZE would sort by so per-file min/max
    // stats skip on either dimension. Pure codegen'd bit arithmetic.
    "q96_zorder" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          Relational.zorderValue(Seq(col("l_partkey"), col("l_suppkey")), 8)
            .as("zval"))),

    // 30-day trailing spend per customer: RANGE window over epoch seconds
    // (identical numeric-range semantics in both engines), money as
    // floor-scaled BIGINT cents so the moving sum cannot drift.
    "q97_time_range_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          // NTZ → LTZ (session tz is UTC) → epoch seconds, matching the
          // oracle's epoch(o_orderdate) on the same naive timestamps
          col("o_orderdate").cast("timestamp_ltz").cast("long").as("sec"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("sec"))
        .rangeBetween(-30L * 86400L, 0L)
      o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        sum(col("cents")).over(w).as("sum_30d"),
        count(lit(1)).over(w).as("n_30d"))
    }),

    // Top-3 lineitems per supplier via the typed bounded-state
    // TopKAggregator — a true partial aggregate (map side keeps ≤ k rows
    // per group), where the window-function form shuffles every row. The
    // oracle is that window form, so the hash match proves the bounded
    // aggregator equals the full sort.
    "q98_topk_bounded" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("_1"),
          struct(col("l_quantity").as("rank"), col("l_orderkey").as("id"),
            col("l_linenumber").cast("long").as("sub")).as("_2"))
        .as[(Long, RankedEntry)]
      ds.groupByKey(_._1).mapValues(_._2)
        .agg(new TopKAggregator(3).toColumn.name("top"))
        .toDF("l_suppkey", "top")
        .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("l_suppkey"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.rank").as("l_quantity"), col("e.id").as("l_orderkey"),
          col("e.sub").as("l_linenumber"))
    }),

    // Frequent item TRIPLES by Apriori: frequent-pair self-join proposes
    // (a,b,c), anti-monotone prune requires (b,c) frequent too, exact
    // support from three equi-joins on the instance table. The oracle is
    // the naive 3-way basket self-join the pruning replaces.
    "q237_frequent_triples" -> ((s, d) =>
      Relational.frequentTriples(Tables.lineitem(s, d), "l_orderkey",
        "l_partkey", minSupport = 2L)),

    // HITS hubs/authorities on the DIRECTED buyer->item graph (2 exact
    // integer iterations, global-max renormalization): authorities are
    // items bought by high-score buyers RECURSIVELY — the mutual-
    // reinforcement ranking plain degree can't express. Oracle unrolls
    // the same half-steps as CTEs (the q99 pattern).
    "q224_hits" -> ((s, d) => {
      val e = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
      Graph.hitsInt(e, "o_custkey", "l_partkey", iterations = 2)
    }),

    // PageRank centrality over the part co-occurrence graph (q87's edges,
    // support >= 2), 3 iterations of exact integer arithmetic — the
    // "which items anchor the catalog" score, bit-identical at any
    // parallelism because no float sum ever forms.
    "q99_pagerank" -> ((s, d) => {
      val edges = coEdges(s, d)
      Graph.pageRankInt(edges, "item_a", "item_b", iterations = 3)
        .select(col("node").as("partkey"), col("score"))
    }),

    // Personalized PageRank from the partkeys divisible by 97 (a
    // deterministic stand-in for a vetted seed set): teleport mass lands
    // only on seeds, so the score ranks the catalog by proximity to the
    // trusted core — the TrustRank curation primitive, in the same exact
    // integer arithmetic as q99 (bit-identical at any parallelism).
    "q175_ppr" -> ((s, d) => {
      // ckpt: seeds AND the rank iteration both consume the quadratic
      // co-occurrence join — materialize it once instead of re-running
      // the query's dominant stage for the seed derivation
      val edges = { import graft.operators.Iterate._; coEdges(s, d).ckpt() }
      val seeds = edges.select(col("item_a").as("node"))
        .union(edges.select(col("item_b").as("node")))
        .distinct().filter(col("node") % 97 === 0)
      Graph.personalizedPageRankInt(edges, "item_a", "item_b", seeds,
        iterations = 3)
        .select(col("node").as("partkey"), col("score"))
    }),

    // Link prediction on the co-occurrence graph: resource-allocation
    // index (shared RARE neighbors beat shared hubs) over non-adjacent
    // pairs, hub centers dropped before the quadratic wedge join — the
    // "which items SHOULD co-occur" recommender signal in exact integer
    // arithmetic.
    "q176_link_predict" -> ((s, d) => {
      val edges = coEdges(s, d)
      Graph.linkPredictRA(edges, "item_a", "item_b")
        .filter(col("common_n") >= 2)
        .select(col("a").as("part_a"), col("b").as("part_b"),
          col("ra_score"), col("common_n"))
    }),

    // Edge-weighted PageRank: mass flows proportionally to co-purchase
    // support, same exact-integer recurrence as q99 (its w≡1 special
    // case) — hubs by VOLUME of shared orders, not just edge count.
    "q197_pagerank_weighted" -> ((s, d) => {
      val edges = coEdges(s, d)
        .select(col("item_a"), col("item_b"), col("n_groups").as("w"))
      Graph.pageRankWeightedInt(edges, "item_a", "item_b", "w",
        iterations = 3)
        .select(col("node").as("partkey"), col("score"))
    }),

    // GNN-style neighbor-mean propagation: each part's price summarized
    // with its 1-hop and 2-hop neighborhood means in exact integer
    // arithmetic — graph feature engineering without materializing k-hop
    // neighbor sets (one edge join + one aggregate per round).
    "q198_neighbor_agg" -> ((s, d) => {
      val edges = coEdges(s, d)
      val feats = Tables.part(s, d).select(col("p_partkey").as("node"),
        floor(col("p_retailprice") * 100).cast("long").as("f"))
      Graph.neighborMeanInt(edges, "item_a", "item_b", feats, rounds = 2)
    }),

    // Community detection by deterministic synchronous label propagation
    // (3 rounds, most-frequent-neighbor-label with smallest-label
    // tie-break) over the co-purchase graph — the corpus-clustering
    // primitive CC can't provide (CC finds connectivity, LPA finds the
    // densely-linked groups INSIDE one connected blob). The oracle
    // unrolls the same three synchronous rounds as CTEs.
    "q201_label_prop" -> ((s, d) =>
      Graph.labelPropagation(coEdges(s, d), "item_a", "item_b", rounds = 3)
        .select(col("node").as("partkey"), col("label").as("community"))),

    // Modularity of the q201 communities in EXACT integer arithmetic:
    // per community, 4m²·(e_c/m − (d_c/2m)²) = 4m·e_c − d_c² is a pure
    // BIGINT — the community-quality score with no float division, so
    // the partition quality is bit-identical at any parallelism.
    "q202_modularity" -> ((s, d) => {
      // ckpt: the quadratic co-occurrence join feeds BOTH the 3 LPA
      // rounds and the modularity joins — materialize it once (q175's
      // discipline)
      val edges = { import graft.operators.Iterate._; coEdges(s, d).ckpt() }
      val labels = Graph.labelPropagation(edges, "item_a", "item_b",
        rounds = 3)
      Graph.modularityInt(edges, "item_a", "item_b", labels)
        .select(col("label").as("community"), col("n_nodes"),
          col("internal_edges"), col("degree_sum"), col("contrib_4m2"))
    }),

    // Item-based collaborative filtering (the Amazon item-to-item shape):
    // each customer's top-5 unpurchased parts, scored by the integer sum
    // of co-purchase support over the parts they already bought — the
    // recommendation operator composed from the q87 co-occurrence
    // relation, an anti-join against the interaction set, and the
    // rank-pushdown top-k.
    "q203_item_recs" -> ((s, d) => {
      val owned = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
          Seq("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey"))
      Relational.itemCfRecommend(owned, "o_custkey", "l_partkey",
          coEdges(s, d), k = 5)
        .select(col("user").as("custkey"), col("item").as("partkey"),
          col("score"), col("n_sources"), col("rnk"))
    }),

    // DeepWalk-style walk corpus: one 4-step walk per node over the
    // co-purchase graph, the per-step neighbor chosen by
    // md5("walk:step") mod degree over id-ranked neighbors — a
    // deterministic stand-in for the RNG that keeps the corpus a pure
    // function of the edge set, exactly mirrored step-by-step in SQL.
    "q204_random_walks" -> ((s, d) =>
      Graph.randomWalks(coEdges(s, d), "item_a", "item_b", steps = 4)
        .select(col("walk_id"), col("step"), col("node").as("partkey"))),

    // Louvain-style refinement on top of LPA (q201 finds labels, q202
    // scores them — this IMPROVES them): one conflict-free synchronous
    // pass of best-positive-gain moves in exact 4m²-scaled integers
    // (Graph.refineMoves), where a move is accepted only if it is the
    // argmax within BOTH its source and target community, so accepted
    // gains are additive and Q can only go up. Output = the exact-integer
    // audit trail: total modularity before, total accepted gain, total
    // after — the oracle exhibits q_after = q_before + gain ≥ q_before.
    "q218_louvain_refine" -> ((s, d) => {
      import graft.operators.Iterate._
      val edges = coEdges(s, d).ckpt()
      val labels0 = Graph.labelPropagation(edges, "item_a", "item_b",
        rounds = 3).ckpt()
      val moves = Graph.refineMoves(edges, "item_a", "item_b", labels0)
        .ckpt()
      val refined = Graph.refineLabels(labels0, moves).ckpt()
      def total(lab: DataFrame, stage: String): DataFrame =
        Graph.modularityInt(edges, "item_a", "item_b", lab)
          .agg(count(lit(1)).as("n"), sum(col("contrib_4m2")).as("q_4m2"))
          .select(lit(stage).as("stage"), col("n"), col("q_4m2"))
      total(labels0, "before")
        .unionByName(moves
          .agg(count(lit(1)).as("n"), sum(col("gain_4m2")).as("q_4m2"))
          .select(lit("moves").as("stage"), col("n"),
            coalesce(col("q_4m2"), lit(0L)).as("q_4m2")))
        .unionByName(total(refined, "after"))
    }),

    // Degree assortativity sufficient statistics: covariance of endpoint
    // degrees over the symmetric edge list (Newman 2002) in exact BIGINT
    // sums — positive numerator = hubs link hubs. Composes the degree
    // aggregate with the q180 one-pass covariance statistics.
    "q192_assortativity" -> ((s, d) => {
      val edges = coEdges(s, d)
        .select(col("item_a"), col("item_b"))
      val sym = edges.unionByName(edges.select(col("item_b").as("item_a"),
        col("item_a").as("item_b")))
      val deg = sym.groupBy(col("item_a").as("node"))
        .agg(count(lit(1)).as("deg"))
      val endpointDegs = sym
        .join(deg.select(col("node").as("item_a"), col("deg").as("deg_src")),
          Seq("item_a"))
        .join(deg.select(col("node").as("item_b"), col("deg").as("deg_dst")),
          Seq("item_b"))
      Relational.covarianceStats(endpointDegs, Seq(
        "deg_src" -> col("deg_src"), "deg_dst" -> col("deg_dst")))
    }),

    // Single-source shortest paths over the weighted co-occurrence graph
    // (edge weight = 1000000 DIV support, so strongly co-purchased parts
    // are "close"), from the smallest part in the graph — Bellman-Ford in
    // exact BIGINT arithmetic, iterated to the FIXPOINT with a loud
    // non-convergence guard. The oracle unrolls the same relaxation as a
    // 16-round MATERIALIZED-CTE chain (the q129 proof shape): at the
    // fixpoint extra rounds are no-ops, so iterative == declarative
    // unroll, and the integer distances are bit-identical by
    // construction.
    "q159_sssp" -> ((s, d) => {
      val edges = coEdges(s, d)
        .select(col("item_a"), col("item_b"),
          expr("1000000 DIV n_groups").as("w"))
      // O(1) control row (the BPE-argmax discipline): the deterministic
      // source = smallest node in the edge set.
      val source = edges.agg(min(col("item_a"))).first().getLong(0)
      Graph.ssspInt(edges, "item_a", "item_b", "w", source, maxIter = 16)
        .select(col("node").as("partkey"), col("dist"))
    }),

    // MERGE-style upsert: a deterministic changeset (priority overrides
    // for every 7th order, synthetic new orders for every 997th) applied
    // to the base by full-outer join, each row tagged
    // insert/update/keep — the Delta/Iceberg MERGE INTO shape as a pure
    // DataFrame operator, provable against a SQL FULL OUTER JOIN oracle.
    "q101_merge_upsert" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val changes = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("X-URGENT").as("o_orderpriority"))
        .unionByName(base.filter(col("o_orderkey") % 997 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("NEW").as("o_orderpriority")))
      Relational.mergeUpsert(base, changes, "o_orderkey")
    }),

    // Stratified deterministic sample: per-language keep rates from a
    // broadcast config (en 50%, de 25%, default 10%) — the tunable
    // data-mixture knob, reproducible across runs and cluster sizes.
    "q100_stratified_sample" -> ((s, d) =>
      Curation.stratifiedSample(Tables.documents(s, d), "lang", "doc_id",
        Seq(("en", 50), ("de", 25)), defaultRate = 10)
        .select(col("doc_id"), col("lang"), col("source"))),

    // Blocked fuzzy matching (entity resolution): exact-duplicate names
    // collapse FIRST (min partkey = canonical — fuzzy work then scales
    // with DISTINCT entities, not corpus rows), then canonical names pair
    // within 3 edits, candidates blocked on the last name token —
    // LSH-style bucketing for edit distance, the codegen'd levenshtein
    // filter inside the block join.
    "q102_fuzzy_match" -> ((s, d) => {
      val canon = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("p_partkey"))
      Relational.fuzzyMatch(canon, "p_partkey", "p_name",
        element_at(split(col("p_name"), " "), -1), maxDist = 3)
        .select(col("id_a").as("part_a"), col("id_b").as("part_b"),
          col("dist"))
    }),

    // RELATIONAL DIVISION: parts ordered under EVERY order priority —
    // Codd's ÷ in its counting formulation (two hash aggregates + one
    // equi-join; the divisor cardinality broadcasts as a one-row frame).
    "q167_relational_division" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_orderkey"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Relational.divide(
        li.join(ord, col("l_orderkey") === col("o_orderkey")),
        Seq("l_partkey"), Seq("o_orderpriority"), ord)
    }),

    // SORTED-NEIGHBORHOOD blocking (merge/purge): global rank over
    // p_name (range-sort + zipWithIndex, never a single-partition
    // window), rank-bucket equi-join of width 5, Levenshtein <= 2
    // verify. The third blocking strategy next to q102 (equality
    // blocks) and q125 (same blocks, Jaro-Winkler): O(n*w)
    // comparisons, and a typo in the block key itself only shifts a
    // record a few sort positions instead of exiling it to another
    // block.
    "q166_sorted_neighborhood" -> ((s, d) =>
      Relational.sortedNeighborhoodPairs(Tables.part(s, d), "p_partkey",
          "p_name", col("p_name"), w = 5, maxDist = 2)
        .select(col("id_a").as("part_a"), col("id_b").as("part_b"),
          col("dist"))),

    // Jaro-Winkler fuzzy pairs over canonical part names (q102's blocking,
    // different similarity): the native codegen'd graft_jaro_winkler
    // expression scores candidates inside the block join — no UDF fence.
    // Oracled against DuckDB's jaro_winkler_similarity at 6dp.
    "q125_jaro_match" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val canon = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("id"))
        .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      val a = canon.select(col("blk"), col("id").as("part_a"),
        col("p_name").as("name_a"))
      val b = canon.select(col("blk"), col("id").as("part_b"),
        col("p_name").as("name_b"))
      a.join(b, Seq("blk")).filter(col("part_a") < col("part_b"))
        .withColumn("sim", round(
          call_function("graft_jaro_winkler", col("name_a"), col("name_b")), 6))
        .filter(col("sim") >= 0.85)
        .select(col("part_a"), col("part_b"), col("sim"))
    }),

    // Entity-resolution capstone: exact-dup canonicalization -> blocked
    // fuzzy pairs (q102) -> connected components over the match graph ->
    // one GOLDEN RECORD per entity cluster (min-id representative name,
    // member/row counts, exact price range). Singleton entities — no fuzzy
    // match — keep their own id as cluster id via the left join, so the
    // output partitions the whole catalog, not just the matched part.
    "q115_entity_resolution" -> ((s, d) => {
      val canon = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("id"),
          count(lit(1)).as("n_rows_name"),
          min(floor(col("p_retailprice") * 100).cast("long")).as("min_c"),
          max(floor(col("p_retailprice") * 100).cast("long")).as("max_c"))
      val pairs = Relational.fuzzyMatch(canon, "id", "p_name",
        element_at(split(col("p_name"), " "), -1), maxDist = 3)
      val cc = graft.operators.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")), "id_a", "id_b", maxIter = 20)
      val labeled = canon.join(cc, canon("id") === cc("node"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      val golden = labeled.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_entities"),
          sum(col("n_rows_name")).as("n_rows"),
          min(col("min_c")).as("min_cents"),
          max(col("max_c")).as("max_cents"))
      golden.join(canon.select(col("id"), col("p_name").as("rep_name")),
          golden("cluster_id") === col("id"))
        .select(col("cluster_id"), col("rep_name"), col("n_entities"),
          col("n_rows"), col("min_cents"), col("max_cents"))
    }),

    // Per-node triangle counts over the part co-occurrence graph (q99's
    // edges): the local-clustering primitive. Degree-ordered orientation
    // bounds wedge fan-out at O(|E|^1.5) even on hub-skewed graphs; the
    // oracle is the direct u<v<w triple self-join, so the hash match
    // proves orientation counts every triangle exactly once.
    "q116_triangles" -> ((s, d) => {
      val edges = coEdges(s, d)
      Graph.triangleCounts(edges, "item_a", "item_b")
        .select(col("node").as("partkey"), col("n_triangles"))
    }),

    // 3-truss of the co-occurrence graph: the maximal subgraph whose
    // every edge closes a triangle INSIDE it — edge-level cohesion one
    // notch above q129's k-core (a star survives coring, dissolves
    // here). Iterative support-peel to fixpoint over the shared
    // oriented-triangle core; the oracle unrolls 8 peel rounds of the
    // u<v<w triple join, so the hash match proves the orientation, the
    // peel, AND the fixpoint at once.
    "q284_ktruss" -> ((s, d) =>
      Graph.kTruss(coEdges(s, d), "item_a", "item_b", k = 3)
        .select(col("u").as("part_a"), col("v").as("part_b"),
          col("support"))),

    // Per-node local clustering coefficient over the same co-occurrence
    // graph: 2T(v)/(deg(v)(deg(v)-1)) in exact ppm — clique-like pockets
    // vs hub-and-spoke stars. Triangles ride q116's degree-ordered
    // orientation; the oracle recounts them from the u<v<w triple join,
    // so the hash match re-proves the orientation AND the ratio.
    "q278_clustering_coeff" -> ((s, d) =>
      Graph.clusteringCoefficients(coEdges(s, d), "item_a", "item_b")
        .select(col("node").as("partkey"), col("degree"),
          col("n_triangles"), col("ccoef_ppm"))),

    // Multi-source BFS: minimum hop distance (<= 3) from the seed set
    // (partkeys ending in 00) over the co-occurrence graph — reachability /
    // blast-radius analysis. Level-synchronous frontier joins; the oracle
    // is a bounded recursive CTE, so the hash match proves the iterative
    // frontier algorithm equals the declarative fixpoint.
    "q117_bfs_hops" -> ((s, d) => {
      val edges = coEdges(s, d)
        .localCheckpoint()
      val seeds = edges
        .select(explode(array(col("item_a"), col("item_b"))).as("node"))
        .distinct()
        .filter(col("node") % 100 === 0)
      Graph.bfsHops(edges, "item_a", "item_b", seeds, maxHops = 3)
        .select(col("node").as("partkey"), col("hops"))
    }),

    // STRONGLY connected components of the DIRECTED line-order part
    // graph (edge: consecutive lines of one order, earlier part ->
    // later part): mutual-reachability cycles, invisible to the
    // symmetrizing CC family. Coloring algorithm (forward max-label
    // fixpoint + backward same-color confinement, complete-SCC peeling);
    // the oracle is the recursive-closure definition itself — scc(v) =
    // min u with reach(v,u) AND reach(u,v).
    "q174_scc" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val e = li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").as("s"))
        .join(li.select(col("l_orderkey"),
          (col("l_linenumber") - 1).as("l_linenumber"),
          col("l_partkey").as("d")), Seq("l_orderkey", "l_linenumber"))
        .filter(col("s") =!= col("d"))
        .select(col("s"), col("d")).distinct()
      Graph.stronglyConnectedComponents(e, "s", "d")
    }),

    // k-core decomposition (k=3) of the co-occurrence graph: iterative
    // peeling to the fixpoint (loud failure if unconverged), surviving
    // nodes with in-core degree. The oracle unrolls 30 peeling rounds as
    // CTEs — at the fixpoint extra rounds are no-ops, so the hash match
    // proves the iterative peel equals the declarative unrolling.
    "q129_kcore" -> ((s, d) => {
      val edges = coEdges(s, d)
      Graph.kCore(edges, "item_a", "item_b", k = 3, maxIter = 30)
        .select(col("node").as("partkey"), col("core_deg"))
    }),

    // Interval concurrency (sweep line): treating each order as open for
    // 30 days, the peak number of simultaneously open orders per
    // priority and when it was first reached — the resource-utilization
    // analytic (concurrent sessions, active jobs, overlapping stays).
    "q106_peak_concurrency" -> ((s, d) =>
      graft.operators.EventTime.peakConcurrency(
        Tables.orders(s, d).select(col("o_orderpriority"),
          col("o_orderdate").as("start_at"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("end_at")),
        "o_orderpriority", "start_at", "end_at")),

    // CDC snapshot diff: two deterministic snapshots derived from orders
    // (old drops keys ending in 3; new drops keys ending in 7 and bumps
    // every 5th price by 500 cents) — the diff classifies every key as
    // insert / delete / update in ONE full-outer sort-merge join.
    "q111_snapshot_diff" -> ((s, d) => {
      val (o, n) = WarehouseQueries.cdcSnapshots(s, d)
      Relational.snapshotDiff(o, n, Seq("o_orderkey"),
        Seq("cents", "o_orderstatus"))
    }),

    // Incremental aggregate maintenance: the per-status (count, sum) table
    // computed on the OLD snapshot, advanced to the NEW snapshot by folding
    // in only the q111 changeset — O(changes), the base never rescanned.
    // The oracle aggregates the new snapshot directly, so the hash match
    // PROVES delta maintenance equals recomputation.
    "q112_agg_delta" -> ((s, d) => {
      val (o, n) = WarehouseQueries.cdcSnapshots(s, d)
      val baseAgg = o.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_val"))
      val diff = Relational.snapshotDiff(o, n, Seq("o_orderkey"),
        Seq("cents", "o_orderstatus"))
      Relational.applyAggDelta(baseAgg, diff, "o_orderstatus", "cents")
    }),

    // Incremental JOIN maintenance: yesterday's orders⋈customer result is
    // held fixed; today's order batch (o_orderkey%10==3) and customer
    // batch (custkey%7==2) fold in via the three delta terms of
    // (A∪ΔA)⋈(B∪ΔB) — each O(|Δ|) on at least one side. The oracle is
    // the PLAIN join of the full tables, so the hash match proves the
    // four-term decomposition reconstructs recomputation exactly —
    // deltas on BOTH sides, including the ΔA⋈ΔB corner.
    "q155_join_delta" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val c = Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").cast("long").as("c_nationkey"), col("c_mktsegment"))
      val oldO = o.filter(col("o_orderkey") % 10 =!= 3)
      val dO = o.filter(col("o_orderkey") % 10 === 3)
      val oldC = c.filter(col("o_custkey") % 7 =!= 2)
      val dC = c.filter(col("o_custkey") % 7 === 2)
      Relational.deltaJoin(oldO.join(oldC, Seq("o_custkey")),
          oldO, dO, oldC, dC, Seq("o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          col("c_nationkey"), col("c_mktsegment"))
    }),

    // Decile lift table over per-customer spend WITHOUT a global-window
    // ntile: rank = the distributed prefix-sum of per-row counts over a
    // composite total order, decile = ((rank-1)·10) div n — Bresenham
    // bucketing, identical formula mirrored in the oracle. Share in exact
    // ppm. The single-partition Window.orderBy anti-pattern never appears.
    "q134_decile_lift" -> ((s, d) => {
      // cached: `per` feeds the scan, the join-back, AND the totals — three
      // consumers that would each replay the orders aggregate uncached
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        // composite total order as one BIGINT: custkey < 10^7 disambiguates
        // — enforced as a plan-level guard (TPC-H custkey crosses 10^7 at
        // sf >= 67; silent wrap would corrupt ranks, so fail loudly)
        .select(col("o_custkey"), col("cents"),
          (col("cents") * 10000000L + col("o_custkey")).as("ord"),
          lit(1L).as("one"))
        .filter(coalesce(assert_true(col("o_custkey") < 10000000L,
          lit("q134: o_custkey >= 10^7 breaks the composite order key — " +
            "widen the multiplier")), lit(true)))
        .cache()
      val ranked = graft.operators.EventTime.globalRunningSum(per, "ord", "one")
        .withColumnRenamed("running_sum", "rank")
      val tot = per.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot_cents"))
      ranked
        .join(per.select(col("ord"), col("cents")), Seq("ord"))
        .crossJoin(broadcast(tot))
        .select(expr("((rank - 1) * 10) div n").as("decile"),
          col("cents"), col("n"), col("tot_cents"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("sum_cents"),
          expr("CAST(sum(cents) * 1000000 div max(tot_cents) AS BIGINT)")
            .as("share_ppm"))
    }),

    // CDC time travel: replay the q111 change log onto the OLD snapshot;
    // the oracle is the NEW snapshot directly, so the hash match proves
    // log replay reconstructs the target state row-for-row.
    "q130_time_travel" -> ((s, d) => {
      val (o, n) = WarehouseQueries.cdcSnapshots(s, d)
      val diff = Relational.snapshotDiff(o, n, Seq("o_orderkey"),
        Seq("cents", "o_orderstatus"))
      Relational.applyChangeLog(o, diff, Seq("o_orderkey"),
        Seq("cents", "o_orderstatus"))
    }),

    // Exact two-sample Kolmogorov-Smirnov drift statistic between the
    // train and test hash splits of order value: the two empirical CDFs
    // as ONE multi-column distributed prefix-sum (the q108 segmented
    // scan), the sup-distance as the cross-multiplied BIGINT
    // |cum_a·n_b − cum_b·n_a| — no float, no single-partition window.
    "q131_ks_drift" -> ((s, d) => {
      val split = Curation.hashSplit(
        Tables.orders(s, d).select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents")),
        "o_orderkey", Seq(("train", 90), ("val", 5), ("test", 5)))
      val counts = split.filter(col("split").isin("train", "test"))
        .groupBy(col("cents"))
        .agg(count(when(col("split") === "train", 1)).as("c_a"),
          count(when(col("split") === "test", 1)).as("c_b"))
      val runs = graft.operators.EventTime.globalRunningSums(
        counts, "cents", Seq("c_a", "c_b"))
      val tot = counts.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
      runs.crossJoin(broadcast(tot))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          max(abs(col("running_c_a") * col("n_b") -
            col("running_c_b") * col("n_a"))).as("d_num"))
    }),

    // Cramer-von Mises two-sample drift over the SAME train/test setup
    // as q131's KS: where KS takes the sup of the ECDF gap (one bad
    // quantile decides), CvM integrates the SQUARED gap over the pooled
    // sample — sensitive to broad, low-amplitude drift KS underweights.
    // Arithmetic discipline (the q274 Brier shape): the ECDF gap is
    // reduced to ppm PER VALUE first — d_ppm = D_k*1e6 div (n_a*n_b)
    // via the staged divide, with D_k = cumA_k*n_b - cumB_k*n_a — then
    // T_ppm = sum w_k*(d_ppm^2 div 1e6) div N. The naive
    // sum w*D^2 / (N^2*n_a*n_b) overflows BIGINT already at sf0.1
    // (den = N^2*n_a*n_b ~ 2e19); the staged-gap form holds to ~9e12
    // pooled rows, trading <=1ppm truncation per value (mirrored in the
    // oracle — both engines truncate toward zero, negatives included).
    // Under H0, T_ppm ~= 166667 ((N+1)/6N).
    "q281_cvm_drift" -> ((s, d) => {
      val split = Curation.hashSplit(
        Tables.orders(s, d).select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents")),
        "o_orderkey", Seq(("train", 90), ("val", 5), ("test", 5)))
      val counts = split.filter(col("split").isin("train", "test"))
        .groupBy(col("cents"))
        .agg(count(when(col("split") === "train", 1)).as("c_a"),
          count(when(col("split") === "test", 1)).as("c_b"))
      val runs = graft.operators.EventTime.globalRunningSums(
        counts, "cents", Seq("c_a", "c_b"))
      val tot = counts.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
      runs.crossJoin(broadcast(tot))
        .withColumn("d_ppm", graft.operators.Eval.stagedPpmDiv(
          col("running_c_a") * col("n_b") - col("running_c_b") * col("n_a"),
          col("n_a") * col("n_b")))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          sum((col("c_a") + col("c_b"))
            * expr("(d_ppm * d_ppm) div 1000000")).as("cvm_num"))
        .select(col("n_a"), col("n_b"), col("cvm_num"),
          expr("cvm_num div (n_a + n_b)").as("cvm_ppm"))
    }),

    // 2-D skyline (Pareto frontier) of parts on (price, size): the rows no
    // other part beats on both dimensions. The oracle is the O(n²)
    // NOT EXISTS self-join; the engine form is linear — per-price-group
    // min + an exclusive distributed running min over price order
    // (the q108 segmented scan with min as the combine) — so the hash
    // match is a physical-strategy equivalence proof.
    "q110_skyline" -> ((s, d) =>
      Relational.skyline2D(
        Tables.part(s, d).select(col("p_partkey"),
          floor(col("p_retailprice") * 100).cast("long").as("price_cents"),
          col("p_size").cast("long").as("p_size")),
        "p_partkey", "price_cents", "p_size")),

    // GLOBAL peak concurrency (no grouping key): the q106 sweep over one
    // corpus-wide timeline, running on the distributed prefix-sum
    // (range-partition + per-partition totals + broadcast offsets) instead
    // of a single-partition window — the segmented-scan construction.
    "q108_global_concurrency" -> ((s, d) =>
      graft.operators.EventTime.globalPeakConcurrency(
        Tables.orders(s, d).select(
          col("o_orderdate").as("start_at"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("end_at")),
        "start_at", "end_at")),

    // Nested (semi-structured) processing: denormalize lineitems into a
    // per-order ARRAY<STRUCT>, then answer from the nested value with
    // higher-order functions (aggregate / filter) — the document-model
    // pattern. The groupBy is the only shuffle; the HOFs are row-local
    // single-traversal lambdas (per the HOF-cost rule: one pass, no
    // per-element re-evaluation of a building expression). All nested
    // aggregations are order-independent, so no array sort is needed and
    // collect_list's nondeterministic order cannot leak into the output.
    "q105_nested_agg" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          struct(
            floor(col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_returnflag").as("flag")).as("item"))
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("item")).as("items"))
      items.select(
        col("l_orderkey"),
        size(col("items")).cast("long").as("n_items"),
        aggregate(col("items"), lit(0L),
          (acc, x) => acc + x.getField("cents")).as("total_cents"),
        size(filter(col("items"),
          x => x.getField("flag") === "R")).cast("long").as("n_returned"))
    }),

    // Split-balance drift: per-language train-vs-test share imbalance of
    // the q62 hash split, as the EXACT cross-multiplied count statistic
    // |n_train*N_test - n_test*N_train| — the release gate that catches
    // a skewed split before training does.
    "q104_split_drift" -> ((s, d) =>
      Quality.splitBalance(
        Curation.hashSplit(Tables.documents(s, d), "doc_id",
          Seq(("train", 90), ("val", 5), ("test", 5))),
        "lang", "split", a = "train", b = "test")),

    // Incremental checksum maintenance: q136's bucket digests advanced to
    // the NEW snapshot by folding only the q111 change log — signed
    // digest deltas, O(changes + buckets), base never rescanned. The
    // oracle checksums the new snapshot directly, so the hash match
    // proves maintenance == recompute (the q112 pattern lifted to the
    // integrity layer).
    "q141_incremental_checksum" -> ((s, d) => {
      val (o, n) = WarehouseQueries.cdcSnapshots(s, d)
      val base = Quality.tableChecksum(o, "o_orderkey",
        Seq(col("o_orderkey"), col("cents"), col("o_orderstatus")), 64)
      val diff = Relational.snapshotDiff(o, n, Seq("o_orderkey"),
        Seq("cents", "o_orderstatus"))
      Quality.applyChecksumDelta(base, diff, "o_orderkey",
        Seq("cents", "o_orderstatus"), 64)
    }),

    // Winsorized robust stats per status: exact discrete p05/p95 bounds
    // (cumsum crossing — no float percentile interpolation), values
    // clipped to the bounds, clipped sum + clip counts. The outlier-
    // robust aggregate for metrics pipelines, BIGINT end to end.
    "q139_winsorize" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      // both bounds from ONE shared cumulative frame (one shuffle + sort)
      val bounds = Relational.exactQuantiles(o, Seq(col("o_orderstatus")),
        col("cents"), Seq(("p05", 5, 100), ("p95", 95, 100)))
      o.join(broadcast(bounds), Seq("o_orderstatus"))
        .groupBy(col("o_orderstatus"))
        .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          count(lit(1)).as("n_rows"),
          sum(greatest(least(col("cents"), col("p95")), col("p05")))
            .as("winsorized_sum"),
          count(when(col("cents") < col("p05"), 1)).as("n_clipped_lo"),
          count(when(col("cents") > col("p95"), 1)).as("n_clipped_hi"))
    }),

    // Recency-weighted customer score with EXACT exponential decay:
    // half-life = 180 days as a power-of-2 bit shift (cents >> halflives)
    // — the decay curve engines usually compute in drifting floats,
    // quantized to shifts so the score is a BIGINT that cannot diverge.
    // Anchor = max order date (2-value broadcast, like q121's min/max).
    "q138_decayed_score" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
      o.crossJoin(broadcast(anchor))
        .select(col("o_custkey"), col("cents"),
          expr("shiftright(cents, CAST(least(datediff(anchor, o_orderdate) div 180, 40) AS INT))")
            .as("decayed"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("raw_cents"),
          sum(col("decayed")).as("decayed_score"))
    }),

    // Anti-entropy table checksums: 64 Merkle-style bucket digests of the
    // orders table — replicas compare O(buckets) rows to find divergent
    // ranges regardless of table size. Order-independent (commutative
    // sum), exact BIGINT, md5 canonical form mirrored in the oracle.
    "q136_table_checksum" -> ((s, d) =>
      Quality.tableChecksum(
        Tables.orders(s, d).select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus")),
        "o_orderkey",
        Seq(col("o_orderkey"), col("cents"), col("o_orderstatus")), 64)),

    // Month-over-month revenue growth: monthly cents, absolute delta vs
    // the previous month, cumulative revenue, and exact ppm growth rate
    // (delta·10⁶ div previous) — the growth-analytics staple with no
    // float anywhere.
    "q137_mom_growth" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.orderBy(col("month"))
      monthly
        .withColumn("prev", lag(col("cents"), 1).over(w))
        .withColumn("delta", col("cents") - col("prev"))
        .withColumn("growth_ppm",
          expr("CAST(delta * 1000000 div prev AS BIGINT)"))
        .withColumn("cum_cents", sum(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),

    // Declarative data-quality report: range, not-null, FK,
    // key-uniqueness and positivity checks, each one aggregate row —
    // violations are counted, never materialized.
    // Schema-discovery audit: functional dependencies that SHOULD hold
    // (key → attribute) vs ones expected to fail, plus a k-anonymity
    // check over the (nation, segment) quasi-identifier — one
    // group-aggregate per check, one-row summaries unioned (q103's
    // report shape).
    "q194_fd_kanon" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      Quality.report(Seq(
        Quality.fdCheck("nation_to_region", n,
          Seq(col("n_nationkey")), col("n_regionkey")),
        Quality.fdCheck("custkey_to_priority", o,
          Seq(col("o_custkey")), col("o_orderpriority")),
        Quality.fdCheck("orderkey_to_status", o,
          Seq(col("o_orderkey")), col("o_orderstatus")),
        Quality.kAnonymityCheck("cust_quasi_k10", c,
          Seq(col("c_nationkey"), col("c_mktsegment")), 10L)))
    }),

    // The re-identifiable classes behind q194's k-anonymity count: every
    // (nation, segment) combination with fewer than 10 customers.
    "q195_kanon_classes" -> ((s, d) =>
      Quality.kAnonymityClasses(Tables.customer(s, d),
        Seq(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment")), 10L)),

    "q103_dq_report" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      Quality.report(Seq(
        Quality.check("l_quantity_range", li,
          col("l_quantity") < 1 || col("l_quantity") > 50),
        Quality.check("l_shipdate_not_null", li, col("l_shipdate").isNull),
        Quality.fkCheck("l_orderkey_fk", li, "l_orderkey", o, "o_orderkey"),
        Quality.check("o_totalprice_positive", o, col("o_totalprice") <= 0),
        Quality.uniqueCheck("o_orderkey_unique", o, "o_orderkey")))
    }))

  /** The q99/q116/q117 co-occurrence edge list as DuckDB CTE text:
    * part pairs sharing >= 2 distinct orders, canonical p1 < p2.
    */
  private val CoocEdgesCte =
    """li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
      |edges AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
      |)""".stripMargin

  /** One k-core peeling round as two DuckDB CTEs (degree filter + edge
    * restriction), chained `rounds` times from `e0`.
    */
  private def kcorePeelSql(k: Int, rounds: Int): String =
    // MATERIALIZED is load-bearing: each round references the previous
    // round's edges three times, so CTE inlining would expand the chain
    // 3^rounds times (observed as fd exhaustion on the base scan)
    (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (
         |  SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN n$i a ON e.src = a.src JOIN n$i b ON e.dst = b.src)""".stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    // the DIRECT checksum of the new snapshot — maintenance must equal it
    "q141_incremental_checksum" ->
      s"""$CdcCte
         |SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
         |         % 64 AS bucket,
         |       count(*) AS n_rows,
         |       CAST(sum(('0x' || substr(md5(
         |         coalesce(CAST(o_orderkey AS VARCHAR), '') || '|' ||
         |         coalesce(CAST(cents AS VARCHAR), '') || '|' ||
         |         coalesce(o_orderstatus, '')), 1, 8))
         |         ::BIGINT) AS BIGINT) AS checksum
         |FROM new GROUP BY 1""".stripMargin,

    "q139_winsorize" ->
      """WITH o AS (
        |  SELECT o_orderstatus AS st,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), byv AS (
        |  SELECT st, cents AS v, count(*) AS w FROM o GROUP BY 1, 2
        |), c AS (
        |  SELECT st, v,
        |         sum(w) OVER (PARTITION BY st ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(w) OVER (PARTITION BY st) AS tot
        |  FROM byv
        |), lo AS (
        |  SELECT st, CAST(min(v) AS BIGINT) AS p05 FROM c
        |  WHERE cum * 100 >= tot * 5 GROUP BY st
        |), hi AS (
        |  SELECT st, CAST(min(v) AS BIGINT) AS p95 FROM c
        |  WHERE cum * 100 >= tot * 95 GROUP BY st
        |)
        |SELECT o.st AS o_orderstatus, max(lo.p05) AS p05, max(hi.p95) AS p95,
        |       count(*) AS n_rows,
        |       CAST(sum(greatest(least(o.cents, hi.p95), lo.p05)) AS BIGINT)
        |         AS winsorized_sum,
        |       count(CASE WHEN o.cents < lo.p05 THEN 1 END) AS n_clipped_lo,
        |       count(CASE WHEN o.cents > hi.p95 THEN 1 END) AS n_clipped_hi
        |FROM o JOIN lo ON o.st = lo.st JOIN hi ON o.st = hi.st
        |GROUP BY 1""".stripMargin,

    "q138_decayed_score" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), a AS (SELECT max(o_orderdate) AS anchor FROM o)
        |SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS raw_cents,
        |       CAST(sum(cents >> CAST(least(
        |         date_diff('day', o_orderdate, anchor) // 180, 40) AS INT))
        |         AS BIGINT) AS decayed_score
        |FROM o, a GROUP BY o_custkey""".stripMargin,

    "q136_table_checksum" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderstatus
        |  FROM orders
        |)
        |SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        |         % 64 AS bucket,
        |       count(*) AS n_rows,
        |       CAST(sum(('0x' || substr(md5(
        |         coalesce(CAST(o_orderkey AS VARCHAR), '') || '|' ||
        |         coalesce(CAST(cents AS VARCHAR), '') || '|' ||
        |         coalesce(o_orderstatus, '')), 1, 8))
        |         ::BIGINT) AS BIGINT) AS checksum
        |FROM t GROUP BY 1""".stripMargin,

    // both engines' integral division truncates toward zero, so negative
    // growth months agree
    "q137_mom_growth" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT month, cents,
        |       lag(cents) OVER w AS prev,
        |       cents - lag(cents) OVER w AS delta,
        |       CAST((cents - lag(cents) OVER w) * 1000000
        |         // lag(cents) OVER w AS BIGINT) AS growth_ppm,
        |       CAST(sum(cents) OVER (ORDER BY month
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_cents
        |FROM m WINDOW w AS (ORDER BY month)""".stripMargin,

    "q134_decile_lift" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), ranked AS (
        |  SELECT cents,
        |         row_number() OVER (ORDER BY cents, o_custkey) AS rnk
        |  FROM per
        |), tot AS (
        |  SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS tot_cents
        |  FROM per
        |)
        |SELECT ((rnk - 1) * 10) // n AS decile,
        |       count(*) AS n_customers,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(sum(cents) * 1000000 // max(tot_cents) AS BIGINT)
        |         AS share_ppm
        |FROM ranked, tot GROUP BY 1""".stripMargin,

    // replay == target snapshot
    "q130_time_travel" ->
      s"""$CdcCte
         |SELECT o_orderkey, cents, o_orderstatus FROM new""".stripMargin,

    "q131_ks_drift" ->
      s"""WITH split AS (
         |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
         |         ${OracleSql.splitCaseSql("o_orderkey")} AS split
         |  FROM orders
         |), counts AS (
         |  SELECT cents,
         |         count(CASE WHEN split = 'train' THEN 1 END) AS c_a,
         |         count(CASE WHEN split = 'test' THEN 1 END) AS c_b
         |  FROM split WHERE split IN ('train', 'test') GROUP BY cents
         |), runs AS (
         |  SELECT cents, c_a, c_b,
         |         sum(c_a) OVER w AS cum_a, sum(c_b) OVER w AS cum_b
         |  FROM counts
         |  WINDOW w AS (ORDER BY cents
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |), tot AS (
         |  SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
         |         CAST(sum(c_b) AS BIGINT) AS n_b
         |  FROM counts
         |)
         |SELECT max(n_a) AS n_a, max(n_b) AS n_b,
         |       CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
         |FROM runs, tot""".stripMargin,

    // Same CTE chain as q131 with the squared-gap integral in place of
    // the sup, staged exactly like the Spark side: per-value ppm gap
    // first, then the weighted mean of its reduced square.
    "q281_cvm_drift" ->
      s"""WITH split AS (
         |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
         |         ${OracleSql.splitCaseSql("o_orderkey")} AS split
         |  FROM orders
         |), counts AS (
         |  SELECT cents,
         |         count(CASE WHEN split = 'train' THEN 1 END) AS c_a,
         |         count(CASE WHEN split = 'test' THEN 1 END) AS c_b
         |  FROM split WHERE split IN ('train', 'test') GROUP BY cents
         |), runs AS (
         |  SELECT cents, c_a, c_b,
         |         sum(c_a) OVER w AS cum_a, sum(c_b) OVER w AS cum_b
         |  FROM counts
         |  WINDOW w AS (ORDER BY cents
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |), tot AS (
         |  SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
         |         CAST(sum(c_b) AS BIGINT) AS n_b
         |  FROM counts
         |), gap AS (
         |  SELECT c_a, c_b, n_a, n_b,
         |         (cum_a * n_b - cum_b * n_a) * 1000000 // (n_a * n_b)
         |           AS d_ppm
         |  FROM runs, tot
         |), agg AS (
         |  SELECT max(n_a) AS n_a, max(n_b) AS n_b,
         |         CAST(sum((c_a + c_b) * ((d_ppm * d_ppm) // 1000000))
         |           AS BIGINT) AS cvm_num
         |  FROM gap
         |)
         |SELECT n_a, n_b, cvm_num,
         |       CAST(cvm_num // (n_a + n_b) AS BIGINT) AS cvm_ppm
         |FROM agg""".stripMargin,

    "q174_scc" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
        |  WHERE a.l_partkey <> b.l_partkey AND a.l_orderkey % 7 = 0
        |), nd AS (
        |  SELECT DISTINCT s AS node FROM e UNION SELECT DISTINCT d FROM e
        |), reach AS (
        |  SELECT s AS v, d AS r FROM e
        |  UNION
        |  SELECT reach.v, e.d FROM reach JOIN e ON reach.r = e.s
        |), mutual AS (
        |  SELECT a.v AS x, a.r AS y FROM reach a JOIN reach b
        |    ON a.v = b.r AND a.r = b.v
        |)
        |SELECT node, CAST(least(node, coalesce(min(y), node)) AS BIGINT) AS scc_id
        |FROM nd LEFT JOIN mutual ON nd.node = mutual.x
        |GROUP BY node""".stripMargin,

    "q129_kcore" ->
      s"""WITH $CoocEdgesCte,
         |e0 AS (SELECT p1 AS src, p2 AS dst FROM edges
         |       UNION SELECT p2, p1 FROM edges),
         |${kcorePeelSql(3, 30)}
         |SELECT src AS partkey, count(*) AS core_deg
         |FROM e30 GROUP BY src""".stripMargin,

    // Triangles spelled directly: x<y<z triple self-join on the canonical
    // edge list; per-node counts by unnesting the three corners.
    "q116_triangles" ->
      s"""WITH $CoocEdgesCte,
         |tri AS (
         |  SELECT a.p1 AS x, a.p2 AS y, b.p2 AS z
         |  FROM edges a JOIN edges b ON a.p2 = b.p1
         |  JOIN edges c ON c.p1 = a.p1 AND c.p2 = b.p2
         |)
         |SELECT node AS partkey, count(*) AS n_triangles
         |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
         |GROUP BY 1""".stripMargin,

    // Eight unrolled peel rounds (fixpoint reached long before), then
    // the final in-truss support recount.
    "q284_ktruss" -> {
      def round(r: Int, prev: String): String =
        s"""tri$r AS MATERIALIZED (
           |  SELECT a.u AS x, a.v AS y, b.v AS z
           |  FROM $prev a JOIN $prev b ON a.u = b.u AND a.v < b.v
           |  JOIN $prev c ON c.u = a.v AND c.v = b.v
           |), sup$r AS MATERIALIZED (
           |  SELECT u, v, count(*) AS sup FROM (
           |    SELECT x AS u, y AS v FROM tri$r
           |    UNION ALL SELECT x AS u, z AS v FROM tri$r
           |    UNION ALL SELECT y AS u, z AS v FROM tri$r)
           |  GROUP BY 1, 2
           |), e$r AS MATERIALIZED (
           |  SELECT e.u, e.v FROM $prev e JOIN sup$r s
           |    ON e.u = s.u AND e.v = s.v
           |  WHERE s.sup >= 1
           |)""".stripMargin
      s"""WITH $CoocEdgesCte,
         |e0 AS (SELECT p1 AS u, p2 AS v FROM edges),
         |${(1 to 8).map(r => round(r, s"e${r - 1}")).mkString(", ")},
         |${round(9, "e8")}
         |SELECT e.u AS part_a, e.v AS part_b,
         |       CAST(s.sup AS BIGINT) AS support
         |FROM e8 e JOIN sup9 s ON e.u = s.u AND e.v = s.v""".stripMargin
    },

    // Triangles from the triple join + degrees from the canonical edge
    // list; the ppm ratio with NULL below degree 2.
    "q278_clustering_coeff" ->
      s"""WITH $CoocEdgesCte,
         |tri AS (
         |  SELECT a.p1 AS x, a.p2 AS y, b.p2 AS z
         |  FROM edges a JOIN edges b ON a.p2 = b.p1
         |  JOIN edges c ON c.p1 = a.p1 AND c.p2 = b.p2
         |), tcnt AS (
         |  SELECT node, count(*) AS n_tri
         |  FROM (SELECT unnest([x, y, z]) AS node FROM tri)
         |  GROUP BY 1
         |), deg AS (
         |  SELECT node, count(*) AS degree
         |  FROM (SELECT unnest([p1, p2]) AS node FROM edges)
         |  GROUP BY 1
         |)
         |SELECT d.node AS partkey, CAST(d.degree AS BIGINT) AS degree,
         |       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
         |       CASE WHEN d.degree >= 2 THEN
         |         CAST(2 * coalesce(t.n_tri, 0) * 1000000
         |              // (d.degree * (d.degree - 1)) AS BIGINT)
         |       END AS ccoef_ppm
         |FROM deg d LEFT JOIN tcnt t USING (node)""".stripMargin,

    // The declarative fixpoint the frontier iteration must equal.
    "q117_bfs_hops" ->
      s"""WITH RECURSIVE $CoocEdgesCte,
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |seeds AS (SELECT DISTINCT src AS node FROM sym WHERE src % 100 = 0),
         |reach AS (
         |  SELECT node, 0 AS hop FROM seeds
         |  UNION
         |  SELECT sym.dst, reach.hop + 1
         |  FROM reach JOIN sym ON reach.node = sym.src
         |  WHERE reach.hop < 3
         |)
         |SELECT node AS partkey, CAST(min(hop) AS BIGINT) AS hops
         |FROM reach GROUP BY node""".stripMargin,

    "q111_snapshot_diff" ->
      s"""$CdcCte
         |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         |       o.cents AS old_cents, n.cents AS new_cents,
         |       o.o_orderstatus AS old_o_orderstatus,
         |       n.o_orderstatus AS new_o_orderstatus,
         |       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
         |            WHEN n.o_orderkey IS NULL THEN 'delete'
         |            ELSE 'update' END AS change_type
         |FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
         |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
         |   OR o.cents IS DISTINCT FROM n.cents
         |   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus""".stripMargin,

    "q112_agg_delta" ->
      s"""$CdcCte
         |SELECT o_orderstatus, count(*) AS n_rows,
         |       CAST(sum(cents) AS BIGINT) AS sum_val
         |FROM new GROUP BY 1""".stripMargin,

    // Deliberately NOT the algorithm: the plain full join. The hash match
    // proves the delta decomposition loses and duplicates nothing.
    "q155_join_delta" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents,
        |       CAST(c.c_nationkey AS BIGINT) AS c_nationkey, c.c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    // Dominance spelled directly: <= on both dims, < on at least one.
    "q110_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey,
        |         CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
        |         CAST(p_size AS BIGINT) AS p_size
        |  FROM part
        |)
        |SELECT p.p_partkey, p.price_cents, p.p_size
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.price_cents <= p.price_cents AND q.p_size <= p.p_size
        |    AND (q.price_cents < p.price_cents OR q.p_size < p.p_size))""".stripMargin,

    "q94_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(row_number() OVER w AS BIGINT) AS version,
        |       o_orderdate AS valid_from,
        |       lead(o_orderdate) OVER w AS valid_to,
        |       lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q95_rollup_merge" ->
      """SELECT date_trunc('month', l_shipdate) AS month,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(*) AS n_rows,
        |       CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q96_zorder" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |       l_partkey, l_suppkey,
         |       ${zorderSql(Seq("l_partkey", "l_suppkey"), 8)} AS zval
         |FROM lineitem""".stripMargin,

    "q97_time_range_agg" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |       CAST(sum(cents) OVER w AS BIGINT) AS sum_30d,
        |       count(*) OVER w AS n_30d
        |FROM (SELECT *, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |             CAST(epoch(o_orderdate) AS BIGINT) AS sec
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY sec
        |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q98_topk_bounded" ->
      """SELECT l_suppkey, CAST(rnk AS BIGINT) AS rnk, l_quantity,
        |       l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
        |FROM (SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber,
        |             row_number() OVER (PARTITION BY l_suppkey
        |               ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rnk
        |      FROM lineitem)
        |WHERE rnk <= 3""".stripMargin,

    "q237_frequent_triples" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem
        |)
        |SELECT a.it AS a, b.it AS b, c.it AS c, count(*) AS support
        |FROM li a JOIN li b ON a.g = b.g AND a.it < b.it
        |          JOIN li c ON b.g = c.g AND b.it < c.it
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin,

    "q224_hits" -> {
      // one authority half-step then one hub half-step, each renormalized
      // by its global max — mirrors Graph.hitsInt term for term
      def authStep(out: String, hubs: String): String =
        s"""${out}r AS (
           |  SELECT e.dst, CAST(sum($hubs.h) AS BIGINT) AS m
           |  FROM e JOIN $hubs ON e.src = $hubs.src GROUP BY e.dst
           |), $out AS (
           |  SELECT dst,
           |         CAST(m * 1000000 // (SELECT max(m) FROM ${out}r)
           |           AS BIGINT) AS a
           |  FROM ${out}r
           |)""".stripMargin
      def hubStep(out: String, auths: String): String =
        s"""${out}r AS (
           |  SELECT e.src, CAST(sum($auths.a) AS BIGINT) AS m
           |  FROM e JOIN $auths ON e.dst = $auths.dst GROUP BY e.src
           |), $out AS (
           |  SELECT src,
           |         CAST(m * 1000000 // (SELECT max(m) FROM ${out}r)
           |           AS BIGINT) AS h
           |  FROM ${out}r
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |), h0 AS (
         |  SELECT DISTINCT src, CAST(1000000 AS BIGINT) AS h FROM e
         |),
         |${authStep("a1", "h0")},
         |${hubStep("h1", "a1")},
         |${authStep("a2", "h1")},
         |${hubStep("h2", "a2")}
         |SELECT 'hub' AS side, src AS node, h AS score FROM h2
         |UNION ALL
         |SELECT 'auth' AS side, dst AS node, a AS score FROM a2""".stripMargin
    },

    "q99_pagerank" ->
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |edges AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM deg),
         |${prIterSql("r1", "r0")},
         |${prIterSql("r2", "r1")},
         |${prIterSql("r3", "r2")}
         |SELECT node AS partkey, score FROM r3""".stripMargin,

    "q197_pagerank_weighted" -> {
      def iter(cur: String, prev: String): String =
        s"""$cur AS (
           |  SELECT d.src AS node,
           |         CAST(150000 + (coalesce(m.in_mass, 0) * 85) // 100 AS BIGINT) AS score
           |  FROM wdeg d LEFT JOIN (
           |    SELECT s.dst AS node,
           |           CAST(sum((r.score * s.w) // g.wdeg) AS BIGINT) AS in_mass
           |    FROM wsym s JOIN $prev r ON s.src = r.node
           |                JOIN wdeg g ON s.src = g.src
           |    GROUP BY s.dst) m ON d.src = m.node
           |)""".stripMargin
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |wedges AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         |         CAST(count(DISTINCT a.ok) AS BIGINT) AS w
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |wsym AS (SELECT p1 AS src, p2 AS dst, w FROM wedges
         |         UNION ALL SELECT p2, p1, w FROM wedges),
         |wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg
         |         FROM wsym GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM wdeg),
         |${iter("r1", "r0")},
         |${iter("r2", "r1")},
         |${iter("r3", "r2")}
         |SELECT node AS partkey, score FROM r3""".stripMargin
    },

    "q198_neighbor_agg" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
        |),
        |sym AS (SELECT p1 AS src, p2 AS dst FROM e
        |        UNION SELECT p2, p1 FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
        |f AS (
        |  SELECT d.src AS node, d.deg,
        |         CAST(coalesce(floor(p.p_retailprice * 100), 0) AS BIGINT) AS h0
        |  FROM deg d LEFT JOIN part p ON d.src = p.p_partkey
        |), m1 AS (
        |  SELECT s.dst AS node, CAST(sum(f2.h0) AS BIGINT) AS s1
        |  FROM sym s JOIN f f2 ON s.src = f2.node GROUP BY 1
        |), g1 AS (
        |  SELECT f.node, f.deg, f.h0,
        |         CAST(coalesce(m1.s1, 0) // f.deg AS BIGINT) AS h1
        |  FROM f LEFT JOIN m1 ON f.node = m1.node
        |), m2 AS (
        |  SELECT s.dst AS node, CAST(sum(g.h1) AS BIGINT) AS s2
        |  FROM sym s JOIN g1 g ON s.src = g.node GROUP BY 1
        |)
        |SELECT g1.node, g1.h0, g1.h1,
        |       CAST(coalesce(m2.s2, 0) // g1.deg AS BIGINT) AS h2
        |FROM g1 LEFT JOIN m2 ON g1.node = m2.node""".stripMargin,

    "q192_assortativity" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
        |),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
        |x AS (
        |  SELECT CAST(ds.deg AS BIGINT) AS a, CAST(dd.deg AS BIGINT) AS b
        |  FROM sym JOIN deg ds ON sym.u = ds.node
        |           JOIN deg dd ON sym.v = dd.node
        |), s AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
        |         CAST(sum(a*a) AS BIGINT) AS paa,
        |         CAST(sum(a*b) AS BIGINT) AS pab,
        |         CAST(sum(b*b) AS BIGINT) AS pbb
        |  FROM x
        |)
        |SELECT 'deg_src' AS var_a, 'deg_src' AS var_b, n,
        |       sa AS sum_a, sa AS sum_b, paa AS sum_ab FROM s
        |UNION ALL SELECT 'deg_src', 'deg_dst', n, sa, sb, pab FROM s
        |UNION ALL SELECT 'deg_dst', 'deg_dst', n, sb, sb, pbb FROM s""".stripMargin,

    "q201_label_prop" ->
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |edges AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |${lpaIterSql("l1", "l0")},
         |${lpaIterSql("l2", "l1")},
         |${lpaIterSql("l3", "l2")}
         |SELECT node AS partkey, label AS community FROM l3""".stripMargin,

    "q202_modularity" ->
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |edges AS MATERIALIZED (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |${lpaIterSql("l1", "l0")},
         |${lpaIterSql("l2", "l1")},
         |${lpaIterSql("l3", "l2")},
         |lab AS MATERIALIZED (SELECT node, label FROM l3),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
         |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY 1),
         |inte AS (
         |  SELECT la.label AS community,
         |         CAST(count(*) AS BIGINT) AS internal_edges
         |  FROM edges e JOIN lab la ON e.p1 = la.node
         |               JOIN lab lb ON e.p2 = lb.node
         |  WHERE la.label = lb.label GROUP BY 1
         |),
         |pc AS (
         |  SELECT la.label AS community, count(*) AS n_nodes,
         |         CAST(sum(d.deg) AS BIGINT) AS degree_sum
         |  FROM deg d JOIN lab la ON d.node = la.node GROUP BY 1
         |)
         |SELECT pc.community, pc.n_nodes,
         |       CAST(coalesce(i.internal_edges, 0) AS BIGINT)
         |         AS internal_edges,
         |       pc.degree_sum,
         |       CAST(4 * mm.m * coalesce(i.internal_edges, 0)
         |            - pc.degree_sum * pc.degree_sum AS BIGINT)
         |         AS contrib_4m2
         |FROM pc LEFT JOIN inte i ON pc.community = i.community
         |CROSS JOIN mm""".stripMargin,

    // Mirrors Graph.refineMoves + refineLabels exactly: gains in
    // 4m²-scaled BIGINTs, best-per-node via (gain DESC, b ASC)
    // row_number, conflict-free accept via per-community rank-1 in BOTH
    // roles, then modularity totals before/after. The output itself
    // exhibits q_after = q_before + Σ gains ≥ q_before in exact integers.
    "q218_louvain_refine" ->
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |edges AS MATERIALIZED (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |${lpaIterSql("l1", "l0")},
         |${lpaIterSql("l2", "l1")},
         |${lpaIterSql("l3", "l2")},
         |lab AS MATERIALIZED (SELECT node, label FROM l3),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
         |ki AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS k_i
         |       FROM sym GROUP BY 1),
         |dc AS (SELECT la.label, CAST(sum(k.k_i) AS BIGINT) AS d_c
         |       FROM ki k JOIN lab la ON k.node = la.node GROUP BY 1),
         |kto AS (SELECT s.src AS node, la.label AS c,
         |               CAST(count(*) AS BIGINT) AS k_to
         |        FROM sym s JOIN lab la ON s.dst = la.node GROUP BY 1, 2),
         |self AS (
         |  SELECT la.node, la.label AS a, k.k_i, da.d_c AS d_a,
         |         coalesce(ka.k_to, 0) AS k_ia
         |  FROM lab la JOIN ki k ON la.node = k.node
         |  JOIN dc da ON la.label = da.label
         |  LEFT JOIN kto ka ON ka.node = la.node AND ka.c = la.label
         |),
         |cand AS (
         |  SELECT t.node, s.a, t.c AS b,
         |         CAST(4 * mm.m * (t.k_to - s.k_ia)
         |              + 2 * s.k_i * (s.d_a - db.d_c)
         |              - 2 * s.k_i * s.k_i AS BIGINT) AS gain
         |  FROM kto t JOIN self s ON t.node = s.node AND t.c <> s.a
         |  JOIN dc db ON t.c = db.label
         |  CROSS JOIN mm
         |),
         |best AS MATERIALIZED (
         |  SELECT node, a, b, gain FROM (
         |    SELECT node, a, b, gain,
         |           row_number() OVER (PARTITION BY node
         |             ORDER BY gain DESC, b ASC) AS rn
         |    FROM cand WHERE gain > 0)
         |  WHERE rn = 1
         |),
         |roles AS (SELECT a AS comm, gain, node FROM best
         |          UNION ALL SELECT b, gain, node FROM best),
         |rr AS (SELECT comm, node,
         |              row_number() OVER (PARTITION BY comm
         |                ORDER BY gain DESC, node ASC) AS rn
         |       FROM roles),
         |acc AS MATERIALIZED (
         |  SELECT m.node, m.b AS to_label, m.gain
         |  FROM best m
         |  JOIN rr ra ON ra.comm = m.a AND ra.node = m.node AND ra.rn = 1
         |  JOIN rr rb ON rb.comm = m.b AND rb.node = m.node AND rb.rn = 1
         |),
         |lab2 AS MATERIALIZED (
         |  SELECT la.node, coalesce(ac.to_label, la.label) AS label
         |  FROM lab la LEFT JOIN acc ac ON la.node = ac.node
         |)
         |SELECT 'before' AS stage,
         |       (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM lab) AS n,
         |       CAST(4 * (SELECT m FROM mm) *
         |              (SELECT count(*) FROM edges e
         |                 JOIN lab x ON e.p1 = x.node
         |                 JOIN lab y ON e.p2 = y.node
         |                WHERE x.label = y.label)
         |            - (SELECT sum(ds * ds) FROM (
         |                 SELECT CAST(sum(k.k_i) AS BIGINT) AS ds
         |                 FROM ki k JOIN lab la ON k.node = la.node
         |                 GROUP BY la.label))
         |         AS BIGINT) AS q_4m2
         |UNION ALL
         |SELECT 'moves', (SELECT CAST(count(*) AS BIGINT) FROM acc),
         |       (SELECT CAST(coalesce(sum(gain), 0) AS BIGINT) FROM acc)
         |UNION ALL
         |SELECT 'after',
         |       (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM lab2),
         |       CAST(4 * (SELECT m FROM mm) *
         |              (SELECT count(*) FROM edges e
         |                 JOIN lab2 x ON e.p1 = x.node
         |                 JOIN lab2 y ON e.p2 = y.node
         |                WHERE x.label = y.label)
         |            - (SELECT sum(ds * ds) FROM (
         |                 SELECT CAST(sum(k.k_i) AS BIGINT) AS ds
         |                 FROM ki k JOIN lab2 la ON k.node = la.node
         |                 GROUP BY la.label))
         |         AS BIGINT)""".stripMargin,

    "q203_item_recs" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
        |wedges AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
        |         CAST(count(DISTINCT a.ok) AS BIGINT) AS w
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
        |),
        |wsym AS (SELECT p1 AS item, p2 AS cand, w FROM wedges
        |         UNION ALL SELECT p2, p1, w FROM wedges),
        |owned AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |),
        |scored AS (
        |  SELECT ow.cust, s.cand AS item, CAST(sum(s.w) AS BIGINT) AS score,
        |         count(*) AS n_sources
        |  FROM owned ow JOIN wsym s ON ow.item = s.item
        |  GROUP BY 1, 2
        |),
        |fresh AS (
        |  SELECT sc.* FROM scored sc
        |  WHERE NOT EXISTS (SELECT 1 FROM owned ow
        |                    WHERE ow.cust = sc.cust AND ow.item = sc.item)
        |),
        |ranked AS (
        |  SELECT cust, item, score, n_sources,
        |         row_number() OVER (PARTITION BY cust
        |           ORDER BY score DESC, item ASC) AS rnk
        |  FROM fresh
        |)
        |SELECT cust AS custkey, item AS partkey, score, n_sources,
        |       CAST(rnk AS BIGINT) AS rnk
        |FROM ranked WHERE rnk <= 5""".stripMargin,

    "q204_random_walks" -> {
      def step(cur: String, prev: String, t: Int): String =
        s"""$cur AS (
           |  SELECT w.walk_id, n.dst AS cur
           |  FROM $prev w
           |  JOIN deg d ON w.cur = d.cur
           |  JOIN nbr n ON n.src = w.cur AND n.rnk =
           |    ('0x' || substr(md5(CAST(w.walk_id AS VARCHAR) || ':$t'),
           |     1, 8))::BIGINT % d.deg
           |)""".stripMargin
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |edges AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |nbr AS (SELECT src, dst,
         |          CAST(row_number() OVER (PARTITION BY src ORDER BY dst)
         |               - 1 AS BIGINT) AS rnk
         |        FROM sym),
         |deg AS (SELECT src AS cur, CAST(count(*) AS BIGINT) AS deg
         |        FROM sym GROUP BY 1),
         |w0 AS (SELECT cur AS walk_id, cur FROM deg),
         |${step("w1", "w0", 1)},
         |${step("w2", "w1", 2)},
         |${step("w3", "w2", 3)},
         |${step("w4", "w3", 4)}
         |SELECT walk_id, CAST(0 AS BIGINT) AS step, cur AS partkey FROM w0
         |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), cur FROM w1
         |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), cur FROM w2
         |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), cur FROM w3
         |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), cur FROM w4""".stripMargin
    },

    "q175_ppr" ->
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |edges AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |sym AS (SELECT p1 AS src, p2 AS dst FROM edges
         |        UNION SELECT p2, p1 FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
         |sd AS (SELECT src AS node,
         |              CASE WHEN src % 97 = 0 THEN 1 ELSE 0 END AS is_seed
         |       FROM deg),
         |r0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS score FROM sd),
         |${pprIterSql("r1", "r0")},
         |${pprIterSql("r2", "r1")},
         |${pprIterSql("r3", "r2")}
         |SELECT node AS partkey, score FROM r3""".stripMargin,

    "q176_link_predict" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
        |),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
        |spokes AS (
        |  SELECT s.u AS w, s.v AS spoke,
        |         CAST(1000000 // d.deg AS BIGINT) AS contrib
        |  FROM sym s JOIN deg d ON s.u = d.node WHERE d.deg <= 10000
        |),
        |agg AS (
        |  SELECT x.spoke AS a, y.spoke AS b,
        |         CAST(sum(x.contrib) AS BIGINT) AS ra_score,
        |         count(*) AS common_n
        |  FROM spokes x JOIN spokes y
        |    ON x.w = y.w AND x.spoke < y.spoke
        |  GROUP BY 1, 2
        |)
        |SELECT a AS part_a, b AS part_b, ra_score, common_n
        |FROM agg
        |WHERE common_n >= 2
        |  AND NOT EXISTS (SELECT 1 FROM e WHERE e.u = agg.a AND e.v = agg.b)""".stripMargin,

    // q99's edge derivation + integer weights, then 16 unrolled
    // relaxation rounds. Valid because the Spark side PROVES fixpoint
    // within 16 rounds (ssspInt throws otherwise), and at the fixpoint
    // extra unrolled rounds are identity.
    "q159_sssp" ->
      s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey FROM lineitem),
         |wedges AS (
         |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         |         CAST(1000000 // count(DISTINCT a.ok) AS BIGINT) AS w
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.ok) >= 2
         |),
         |wsym AS (SELECT p1 AS src, p2 AS dst, w FROM wedges
         |         UNION ALL SELECT p2, p1, w FROM wedges),
         |d0 AS (SELECT CAST((SELECT min(p1) FROM wedges) AS BIGINT) AS node,
         |              CAST(0 AS BIGINT) AS dist),
         |${(1 to 16).map(i => ssspIterSql(s"d$i", s"d${i - 1}"))
           .mkString(",\n")}
         |SELECT node AS partkey, dist FROM d16""".stripMargin,

    "q101_merge_upsert" ->
      """WITH chg AS (
        |  SELECT o_orderkey, 'X-URGENT' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'NEW'
        |  FROM orders WHERE o_orderkey % 997 = 0
        |)
        |SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderpriority
        |            ELSE b.o_orderpriority END AS o_orderpriority,
        |       CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |            WHEN c.o_orderkey IS NULL THEN 'keep'
        |            ELSE 'update' END AS action
        |FROM orders b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey""".stripMargin,

    "q125_jaro_match" ->
      """WITH t AS (
        |  SELECT min(p_partkey) AS id, p_name AS txt,
        |         string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name
        |)
        |SELECT a.id AS part_a, b.id AS part_b,
        |       round(jaro_winkler_similarity(a.txt, b.txt), 6) AS sim
        |FROM t a JOIN t b ON a.blk = b.blk AND a.id < b.id
        |WHERE round(jaro_winkler_similarity(a.txt, b.txt), 6) >= 0.85""".stripMargin,

    "q102_fuzzy_match" ->
      """WITH t AS (
        |  SELECT min(p_partkey) AS id, p_name AS txt,
        |         string_split(p_name, ' ')[-1] AS blk
        |  FROM part GROUP BY p_name
        |)
        |SELECT a.id AS part_a, b.id AS part_b,
        |       CAST(levenshtein(a.txt, b.txt) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.txt, b.txt) <= 3""".stripMargin,

    "q167_relational_division" ->
      """SELECT l.l_partkey
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY l.l_partkey
        |HAVING count(DISTINCT o.o_orderpriority) =
        |       (SELECT count(DISTINCT o_orderpriority) FROM orders)""".stripMargin,

    // The oracle ranks with a plain window row_number — the single-node
    // formulation the distributed rank must equal exactly.
    "q166_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT p_partkey AS id, p_name AS k,
        |         row_number() OVER (ORDER BY p_name, p_partkey) AS rnk
        |  FROM part
        |)
        |SELECT a.id AS part_a, b.id AS part_b,
        |       CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5
        |WHERE levenshtein(a.k, b.k) <= 2""".stripMargin,

    "q115_entity_resolution" ->
      """WITH RECURSIVE t AS (
        |  SELECT min(p_partkey) AS id, p_name AS txt,
        |         string_split(p_name, ' ')[-1] AS blk,
        |         count(*) AS n_rows_name,
        |         CAST(min(floor(p_retailprice * 100)) AS BIGINT) AS min_c,
        |         CAST(max(floor(p_retailprice * 100)) AS BIGINT) AS max_c
        |  FROM part GROUP BY p_name
        |), pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM t a JOIN t b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.txt, b.txt) <= 3
        |), edges AS (
        |  SELECT id_a AS s, id_b AS d FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach AS (
        |  SELECT DISTINCT s AS node, s AS r FROM edges
        |  UNION
        |  SELECT reach.node, edges.d FROM reach JOIN edges ON reach.r = edges.s
        |), cc AS (
        |  SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
        |), labeled AS (
        |  SELECT t.*, coalesce(cc.cluster_id, t.id) AS cluster_id
        |  FROM t LEFT JOIN cc ON t.id = cc.node
        |), golden AS (
        |  SELECT cluster_id, count(*) AS n_entities,
        |         CAST(sum(n_rows_name) AS BIGINT) AS n_rows,
        |         CAST(min(min_c) AS BIGINT) AS min_cents,
        |         CAST(max(max_c) AS BIGINT) AS max_cents
        |  FROM labeled GROUP BY cluster_id
        |)
        |SELECT g.cluster_id, t.txt AS rep_name, g.n_entities, g.n_rows,
        |       g.min_cents, g.max_cents
        |FROM golden g JOIN t ON g.cluster_id = t.id""".stripMargin,

    "q106_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT o_orderpriority AS g, o_orderdate AS s,
        |         o_orderdate + INTERVAL 30 DAY AS e
        |  FROM orders
        |), deltas AS (
        |  SELECT g, s AS t, 1 AS d FROM iv
        |  UNION ALL
        |  SELECT g, e, -1 FROM iv
        |), net AS (
        |  SELECT g, t, CAST(sum(d) AS BIGINT) AS net
        |  FROM deltas GROUP BY g, t
        |), conc AS (
        |  SELECT g, t,
        |         CAST(sum(net) OVER (PARTITION BY g ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM net
        |), mx AS (
        |  SELECT g, t, c, max(c) OVER (PARTITION BY g) AS m FROM conc
        |)
        |SELECT g AS o_orderpriority, CAST(max(m) AS BIGINT) AS peak,
        |       min(t) AS peak_at
        |FROM mx WHERE c = m GROUP BY g""".stripMargin,

    "q108_global_concurrency" ->
      """WITH iv AS (
        |  SELECT o_orderdate AS s, o_orderdate + INTERVAL 30 DAY AS e
        |  FROM orders
        |), deltas AS (
        |  SELECT s AS t, 1 AS d FROM iv
        |  UNION ALL
        |  SELECT e, -1 FROM iv
        |), net AS (
        |  SELECT t, CAST(sum(d) AS BIGINT) AS net FROM deltas GROUP BY t
        |), conc AS (
        |  SELECT t, CAST(sum(net) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM net
        |)
        |SELECT CAST(max(c) AS BIGINT) AS peak,
        |       min(t) FILTER (WHERE c = (SELECT max(c) FROM conc)) AS peak_at
        |FROM conc""".stripMargin,

    "q105_nested_agg" ->
      """WITH nested AS (
        |  SELECT l_orderkey,
        |         list(struct_pack(
        |           cents := CAST(floor(l_extendedprice * 100) AS BIGINT),
        |           flag := l_returnflag)) AS items
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT l_orderkey,
        |       CAST(len(items) AS BIGINT) AS n_items,
        |       CAST(list_sum(list_transform(items, x -> x.cents)) AS BIGINT) AS total_cents,
        |       CAST(len(list_filter(items, x -> x.flag = 'R')) AS BIGINT) AS n_returned
        |FROM nested""".stripMargin,

    "q104_split_drift" ->
      s"""WITH s AS (
        |  SELECT lang,
        |         ${OracleSql.splitCaseSql("doc_id")} AS split
        |  FROM documents
        |), agg AS (
        |  SELECT lang,
        |         count(CASE WHEN split = 'train' THEN 1 END) AS n_a,
        |         count(CASE WHEN split = 'test' THEN 1 END) AS n_b
        |  FROM s GROUP BY lang
        |), tot AS (
        |  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
        |  FROM agg
        |)
        |SELECT lang, n_a, n_b, abs(n_a * tb - n_b * ta) AS imbalance
        |FROM agg, tot""".stripMargin,

    "q194_fd_kanon" ->
      """WITH f1 AS (
        |  SELECT count(DISTINCT n_regionkey)
        |         + CASE WHEN count(*) > count(n_regionkey) THEN 1 ELSE 0 END
        |         AS nd FROM nation
        |  GROUP BY n_nationkey
        |), f2 AS (
        |  SELECT count(DISTINCT o_orderpriority)
        |         + CASE WHEN count(*) > count(o_orderpriority) THEN 1 ELSE 0 END
        |         AS nd FROM orders
        |  GROUP BY o_custkey
        |), f3 AS (
        |  SELECT count(DISTINCT o_orderstatus)
        |         + CASE WHEN count(*) > count(o_orderstatus) THEN 1 ELSE 0 END
        |         AS nd FROM orders
        |  GROUP BY o_orderkey
        |), ka AS (
        |  SELECT count(*) AS n FROM customer
        |  GROUP BY c_nationkey, c_mktsegment
        |)
        |SELECT 'nation_to_region' AS check_name,
        |       count(CASE WHEN nd > 1 THEN 1 END) AS n_violations,
        |       count(*) AS n_checked FROM f1
        |UNION ALL SELECT 'custkey_to_priority',
        |       count(CASE WHEN nd > 1 THEN 1 END), count(*) FROM f2
        |UNION ALL SELECT 'orderkey_to_status',
        |       count(CASE WHEN nd > 1 THEN 1 END), count(*) FROM f3
        |UNION ALL SELECT 'cust_quasi_k10',
        |       count(CASE WHEN n < 10 THEN 1 END), count(*) FROM ka""".stripMargin,

    "q195_kanon_classes" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment,
        |       count(*) AS class_size
        |FROM customer
        |GROUP BY 1, 2 HAVING count(*) < 10""".stripMargin,

    "q103_dq_report" ->
      """SELECT 'l_quantity_range' AS check_name,
        |       count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS n_violations,
        |       count(*) AS n_checked FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate_not_null',
        |       count(CASE WHEN l_shipdate IS NULL THEN 1 END), count(*)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey_fk',
        |       (SELECT count(*) FROM lineitem l
        |        WHERE l.l_orderkey IS NOT NULL
        |          AND NOT EXISTS (SELECT 1 FROM orders o
        |                          WHERE o.o_orderkey = l.l_orderkey)),
        |       (SELECT count(*) FROM lineitem)
        |UNION ALL
        |SELECT 'o_totalprice_positive',
        |       count(CASE WHEN o_totalprice <= 0 THEN 1 END), count(*)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderkey_unique',
        |       count(o_orderkey) - count(DISTINCT o_orderkey), count(*)
        |FROM orders""".stripMargin,

    "q100_stratified_sample" ->
      s"""SELECT doc_id, lang, source
        |FROM (SELECT d.doc_id, d.lang, d.source,
        |             coalesce(r.rate, 10) AS rate
        |      FROM documents d
        |      LEFT JOIN (VALUES ('en', 50), ('de', 25)) r(lang, rate)
        |        ON d.lang = r.lang)
        |WHERE ${OracleSql.bucketSql("doc_id", 100)} < rate""".stripMargin)
}
