package graft

import org.apache.spark.sql.functions._

import graft.functions.{RankedEntry, TopKAggregator}
import graft.operators.{Curation, Graph, Quality, Relational}

/** Warehouse-lifecycle operators: SCD2 intervals, Z-order interleave,
  * bounded top-k aggregation, integer PageRank, stratified sampling.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("deltaJoin == full recompute, including duplicate keys and the " +
      "delta-x-delta corner; empty deltas are the identity") {
    import graft.operators.Relational
    val a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"), (9L, "a5"))
      .toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b3"), (3L, "b4"), (8L, "b5"))
      .toDF("k", "bv")
    // split: ΔA = av in (a2, a4); ΔB = bv in (b3, b4)
    val (oldA, dA) = (a.filter(!col("av").isin("a2", "a4")),
      a.filter(col("av").isin("a2", "a4")))
    val (oldB, dB) = (b.filter(!col("bv").isin("b3", "b4")),
      b.filter(col("bv").isin("b3", "b4")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "av", "bv").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
    val full = rows(a.join(b, Seq("k")))
    assert(rows(Relational.deltaJoin(oldA.join(oldB, Seq("k")),
      oldA, dA, oldB, dB, Seq("k"))) == full)
    // ΔA⋈ΔB corner is actually exercised: a4/b4 share key 3
    assert(rows(dA.join(dB, Seq("k"))).nonEmpty)
    // empty deltas: maintenance returns exactly the old result
    val empty = a.filter(lit(false))
    val emptyB = b.filter(lit(false))
    assert(rows(Relational.deltaJoin(a.join(b, Seq("k")), a, empty,
      b, emptyB, Seq("k"))) == full)
  }

  test("scd2 builds gapless per-key validity chains with one current row") {
    val snaps = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-02-01 00:00:00")),
      (1L, 12L, ts("2024-03-01 00:00:00")),
      (2L, 20L, ts("2024-01-15 00:00:00")),
      // same event time, distinct tie-break ids -> deterministic order
      (3L, 31L, ts("2024-01-01 00:00:00")),
      (3L, 30L, ts("2024-01-01 00:00:00")))
      .toDF("key", "id", "at")
    val out = Relational.scd2(snaps, Seq("key"), "at", Seq("id"))
      .orderBy("key", "version").collect()

    // key 1: versions 1..3, each valid_to = next valid_from, last open
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    assert(k1.init.map(_.getTimestamp(5)).toSeq ==
      k1.tail.map(_.getTimestamp(4)).toSeq, "valid_to must chain to next valid_from")
    assert(k1.count(_.getBoolean(6)) == 1 && k1.last.getBoolean(6))
    // tie on event time ordered by the tie-break id
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.map(_.getLong(1)).toSeq == Seq(30L, 31L))
  }

  test("zorderValue interleaves bits (column j at position i*k + j)") {
    // x=3 (binary 011) -> bits at out positions 0,2 = 5
    // y=5 (binary 101) -> bits at out positions 1,5 = 34
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Relational.zorderValue(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(out == 39L, s"expected 39 (5 | 34), got $out")
    // one dimension degenerates to the identity on the masked bits
    val ident = Seq((13L, 0L)).toDF("x", "y")
      .select(Relational.zorderValue(Seq(col("x")), 8).as("z"))
      .head().getLong(0)
    assert(ident == 13L)
  }

  test("zorder locality: neighbors in both dims are closer than far rows") {
    val z = (x: Long, y: Long) =>
      Seq((x, y)).toDF("x", "y")
        .select(Relational.zorderValue(Seq(col("x"), col("y")), 8).as("z"))
        .head().getLong(0)
    assert(math.abs(z(10, 10) - z(11, 11)) < math.abs(z(10, 10) - z(200, 200)))
  }

  test("TopKAggregator equals the window-function top-k on skewed groups") {
    // group 0 is hot (300 rows), groups 1..9 small — the bounded
    // accumulator must agree with the full-sort window form everywhere
    val rows = (1 to 500).map { i =>
      val g = if (i <= 300) 0L else (i % 9 + 1).toLong
      (g, (i * 37 % 101).toDouble, i.toLong, (i % 7).toLong)
    }
    val df = rows.toDF("g", "score", "id", "sub")
    val agg = df
      .select(col("g").as("_1"),
        struct(col("score").as("rank"), col("id"), col("sub")).as("_2"))
      .as[(Long, RankedEntry)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(5).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("e.rank").as("score"), col("e.id").as("id"), col("e.sub").as("sub"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc, col("sub").asc)
    val win = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("g"), col("rnk"), col("score"), col("id"), col("sub"))
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty,
      "bounded aggregator must match the window top-k")
  }

  test("TopKAggregator runs as a partial aggregate (no full-row shuffle sort)") {
    val df = (1 to 100).map(i => (i % 4L, i.toDouble, i.toLong, 0L))
      .toDF("g", "score", "id", "sub")
    val plan = df
      .select(col("g").as("_1"),
        struct(col("score").as("rank"), col("id"), col("sub")).as("_2"))
      .as[(Long, RankedEntry)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate") && plan.contains("partial_"),
      s"expected a partial (map-side) aggregate phase in plan:\n$plan")
  }

  test("pageRankInt: hub outranks leaves, mass conserved, partitioning-invariant") {
    // star: 0-1, 0-2, 0-3, 0-4 plus a 5-6 pendant pair
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L))
      .toDF("a", "b")
    val r = Graph.pageRankInt(edges, "a", "b", iterations = 3)
    val scores = r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(scores.size == 7)
    assert(scores(0L) > scores(1L), "hub must outrank a leaf")
    assert(scores(1L) == scores(2L) && scores(2L) == scores(3L),
      "symmetric leaves must tie exactly (integer arithmetic)")
    // total mass stays within quantization loss of n*scale (div truncation
    // loses < 1 unit per edge per iteration, damping redistributes 15%)
    val total = scores.values.sum
    assert(total > 0 && total <= 7L * 1000000L)
    // bit-identical across a different physical distribution
    val r2 = Graph.pageRankInt(edges.repartition(7), "a", "b", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == scores, "integer PageRank must not depend on partitioning")
  }

  test("personalizedPageRankInt: mass concentrates near seeds, " +
    "non-seed components drain, partitioning-invariant") {
    // two disjoint triangles (odd cycle — APERIODIC, so scores don't
    // oscillate the way a bipartite even cycle's do); seed only node 0 —
    // the second triangle must drain to zero score
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("a", "b")
    val seeds = Seq(0L).toDF("node")
    val r = Graph.personalizedPageRankInt(edges, "a", "b", seeds,
      iterations = 3)
    val scores = r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(scores.size == 6)
    assert(scores(0L) > scores(1L), "seed must outrank its neighbors")
    assert(scores(1L) == scores(2L), "symmetric neighbors tie exactly")
    assert(Seq(10L, 11L, 12L).forall(scores(_) == 0L),
      "an unseeded component has no teleport source and must drain to 0")
    val r2 = Graph.personalizedPageRankInt(edges.repartition(7), "a", "b",
      seeds, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == scores, "integer PPR must not depend on partitioning")
  }

  test("pageRankWeightedInt: w≡1 reduces exactly to pageRankInt; " +
      "heavier edge pulls more mass") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L))
      .toDF("a", "b")
    val unweighted = Graph.pageRankInt(edges, "a", "b", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val w1 = Graph.pageRankWeightedInt(edges.withColumn("w", lit(1L)),
        "a", "b", "w", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(w1 == unweighted, "weighted PR with unit weights must equal " +
      "the unweighted recurrence bit-for-bit")
    // triangle with one heavy edge: 1-2 weight 10, others weight 1 — the
    // heavy edge's endpoints exchange more mass than node 0 receives
    val tri = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 10L))
      .toDF("a", "b", "w")
    val r = Graph.pageRankWeightedInt(tri, "a", "b", "w", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(2L), "symmetric heavy endpoints tie exactly")
    assert(r(1L) > r(0L), "heavy-edge endpoints must outrank the light node")
  }

  test("neighborMeanInt: hand-computed two rounds on a path graph") {
    // path 1-2-3 with features 100, 200, 600
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val feats = Seq((1L, 100L), (2L, 200L), (3L, 600L)).toDF("node", "f")
    val got = Graph.neighborMeanInt(edges, "a", "b", feats, rounds = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // h1: n1 = 200/1, n2 = (100+600)/2 = 350, n3 = 200/1
    // h2: n1 = 350/1, n2 = (200+200)/2 = 200, n3 = 350/1
    assert(got == Map(
      1L -> ((100L, 200L, 350L)),
      2L -> ((200L, 350L, 200L)),
      3L -> ((600L, 200L, 350L))))
  }

  test("linkPredictRA: scores match brute force, adjacent pairs excluded, " +
    "hub cap drops wedges") {
    // square 1-2-3-4-1 plus center 5 wired to 1 and 3
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 1L), (5L, 3L))
    val edges = raw.toDF("a", "b")
    val got = Graph.linkPredictRA(edges, "a", "b")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // brute force in memory with the same floor(scale/deg) contributions
    val sym = raw.flatMap { case (u, v) => Seq(u -> v, v -> u) }.distinct
    val nbr = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = nbr.map { case (k, v) => k -> v.size.toLong }
    val nodes = nbr.keys.toSeq.sorted
    val expect = (for {
      a <- nodes; b <- nodes if a < b && !nbr(a).contains(b)
      common = nbr(a).intersect(nbr(b)) if common.nonEmpty
    } yield (a, b) -> (common.toSeq.map(w => 1000000L / deg(w)).sum,
      common.size.toLong)).toMap
    assert(got == expect, s"got $got\nexpect $expect")
    // (1,3) share low-degree 5 AND high-degree... all degrees small here;
    // now verify the maxDeg cap: with maxDeg=2 the degree-3 centers 1 and
    // 3 stop generating wedges, so only center-2/4/5 wedges survive
    val capped = Graph.linkPredictRA(edges, "a", "b", maxDeg = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val expectCapped = (for {
      a <- nodes; b <- nodes if a < b && !nbr(a).contains(b)
      common = nbr(a).intersect(nbr(b)).filter(w => deg(w) <= 2L)
      if common.nonEmpty
    } yield (a, b) -> (common.toSeq.map(w => 1000000L / deg(w)).sum,
      common.size.toLong)).toMap
    assert(capped == expectCapped)
  }

  test("ssspInt: weighted detour beats direct edge, unreachable absent, " +
    "partitioning-invariant") {
    // 1-2 (1), 2-3 (1), 1-3 (5): the 2-hop detour to 3 costs 2, beating
    // the direct weight-5 edge; 3-4 (2) extends it; 5-6 is unreachable.
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 2L),
      (5L, 6L, 1L)).toDF("s", "d", "w")
    val got = Graph.ssspInt(edges, "s", "d", "w", source = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L))
    val got2 = Graph.ssspInt(edges.repartition(7), "s", "d", "w", source = 1L)
      .as[(Long, Long)].collect().toMap
    assert(got2 == got, "integer SSSP must not depend on partitioning")
  }

  test("ssspInt matches an in-memory Floyd-Warshall on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 8
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.35
      } yield (a.toLong, b.toLong, (rnd.nextInt(9) + 1).toLong)).toSeq
      if (edges.nonEmpty) {
        val inf = Long.MaxValue / 4
        val dist = Array.fill(n, n)(inf)
        (0 until n).foreach(i => dist(i)(i) = 0L)
        edges.foreach { case (a, b, w) =>
          dist(a.toInt)(b.toInt) = math.min(dist(a.toInt)(b.toInt), w)
          dist(b.toInt)(a.toInt) = math.min(dist(b.toInt)(a.toInt), w)
        }
        for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
          if (dist(i)(k) + dist(k)(j) < dist(i)(j))
            dist(i)(j) = dist(i)(k) + dist(k)(j)
        val src = edges.map(_._1).min.toInt
        val want = (0 until n)
          .filter(dist(src)(_) < inf)
          .map(j => j.toLong -> dist(src)(j)).toMap
        val got = Graph.ssspInt(edges.toDF("s", "d", "w"), "s", "d", "w",
          source = src.toLong)
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"edges=$edges src=$src")
      }
    }
  }

  test("mergeUpsert: change rows replace wholesale, actions tag the three cases") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v")
    // update k=2 with an INTENTIONAL null name (must not backfill "b"),
    // insert k=9, keep k=1 and k=3
    val changes = Seq((2L, null.asInstanceOf[String], 99), (9L, "new", 1))
      .toDF("k", "name", "v")
    val out = Relational.mergeUpsert(base, changes, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "a", 10, "keep"),
      (2L, null, 99, "update"),
      (3L, "c", 30, "keep"),
      (9L, "new", 1, "insert")))
  }

  test("mergeUpsert rejects a changeset with duplicate keys at execution") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val dup = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val ex = intercept[Exception] {
      Relational.mergeUpsert(base, dup, "k").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("mergeUpsert")),
      s"expected the duplicate-change guard to fire, got $ex")
    // opt-out keeps the lazy path for pre-validated changesets
    assert(Relational.mergeUpsert(base, dup, "k", validateChanges = false)
      .count() == 2)
  }

  test("TopKAggregator matches the window form on NaN and -0.0 ranks") {
    val df = Seq(
      (1L, Double.NaN, 10L, 0L), (1L, 5.0, 11L, 0L), (1L, 7.0, 12L, 0L),
      (2L, -0.0, 20L, 0L), (2L, 0.0, 21L, 0L), (2L, -1.0, 22L, 0L))
      .toDF("g", "score", "id", "sub")
    val agg = df
      .select(col("g").as("_1"),
        struct(col("score").as("rank"), col("id"), col("sub")).as("_2"))
      .as[(Long, RankedEntry)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(2).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rnk"), col("e.id").as("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc, col("sub").asc)
    val win = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .select(col("g"), col("rnk"), col("id"))
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty,
      s"NaN/-0.0 ordering diverged: agg=${agg.collect().toSeq} win=${win.collect().toSeq}")
  }

  test("writeShards bounds file size, partitions the tree, sorts within files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val rows = (1 to 500).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", (i * 131) % 997))
      .toDF("doc_id", "lang", "n_chars")
    Curation.writeShards(rows, dir, Seq("lang"),
      maxRecordsPerFile = 60, layoutSort = Seq(col("n_chars")))
    // partition directories exist and roundtrip preserves every row
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    assert(new java.io.File(s"$dir/lang=en").isDirectory &&
      new java.io.File(s"$dir/lang=de").isDirectory)
    for (part <- Seq("en", "de")) {
      val files = new java.io.File(s"$dir/lang=$part").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      // 250 rows / cap 60 -> exactly ceil(250/60) = 5 files, none over cap
      assert(files.length == 5, s"$part: expected 5 files, got ${files.length}")
      files.foreach { f =>
        val vals = spark.read.parquet(f.getAbsolutePath)
          .select("n_chars").as[Int].collect()
        assert(vals.length <= 60, s"file over the record cap: ${vals.length}")
        assert(vals.sameElements(vals.sorted), "rows inside a file must be sorted")
      }
    }
  }

  test("fuzzyMatch finds within-block near-names and respects maxDist") {
    val names = Seq((1L, "red ring"), (2L, "bed ring"), (3L, "red wing"),
      (4L, "blue bolt"), (5L, "glue bolt"), (6L, "totally different"))
      .toDF("id", "name")
    val out = Relational.fuzzyMatch(names, "id", "name",
      element_at(split(col("name"), " "), -1), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    // (1,2) dist 1 same block "ring"; (4,5) dist 1 same block "bolt";
    // (1,3) is dist 2 but DIFFERENT blocks (ring vs wing) -> blocked out:
    // recall is a function of blocking quality, by design
    assert(out == Seq((1L, 2L, 1L), (4L, 5L, 1L)), s"got $out")
  }

  test("stronglyConnectedComponents: cycles found, DAG nodes are " +
      "singletons, matches an in-memory Tarjan on random digraphs") {
    // 1→2→3→1 (cycle), 3→4→5 (tail), 6→7, 7→6 (2-cycle), 5→5 ignored
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 6L), (5L, 5L)).toDF("s", "d")
    val got = Graph.stronglyConnectedComponents(edges, "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 6L), s"got $got")

    // randomized cross-check vs an in-memory reference (SCC = mutual
    // reachability; Floyd-Warshall closure is fine at n=14)
    val rnd = new scala.util.Random(42L)
    (0 until 3).foreach { _ =>
      val n = 14
      val es = Seq.fill(22)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val present = es.flatMap(e => Seq(e._1, e._2)).distinct
      val reach = Array.ofDim[Boolean](n, n)
      es.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
      val want = present.map { v =>
        val scc = present.filter(u => u == v ||
          (reach(v.toInt)(u.toInt) && reach(u.toInt)(v.toInt)))
        v -> scc.min
      }.toMap
      val out = Graph.stronglyConnectedComponents(
        es.toDF("s", "d").repartition(5), "s", "d")
        .as[(Long, Long)].collect().toMap
      assert(out == want, s"edges $es: got $out want $want")
    }
  }

  test("relational divide: full coverage qualifies, partial doesn't, " +
      "extra non-divisor b's don't help, empty divisor is vacuous truth") {
    val dividend = Seq(
      ("s1", "p1"), ("s1", "p2"), ("s1", "p3"), // all of divisor
      ("s2", "p1"), ("s2", "p2"),               // missing p3
      ("s3", "p1"), ("s3", "p2"), ("s3", "p9"), // p9 not in divisor
      ("s1", "p1")                              // duplicate pair
    ).toDF("sup", "part")
    val divisor = Seq("p1", "p2", "p3").toDF("part")
    val got = Relational.divide(dividend, Seq("sup"), Seq("part"), divisor)
      .as[String].collect().toSet
    assert(got == Set("s1"), s"got $got")
    val vac = Relational.divide(dividend, Seq("sup"), Seq("part"),
        divisor.filter(lit(false)))
      .as[String].collect().toSet
    assert(vac == Set("s1", "s2", "s3"), s"empty divisor must return all groups, got $vac")
  }

  test("sortedNeighborhoodPairs: window-local near-names found across " +
      "block-key typos, matches a brute-force rank-window reference") {
    // "bed ring" vs "red ring": a typo in the FIRST character — equality
    // blocking on the first word would separate them; sort adjacency
    // keeps them neighbors
    val names = Seq((1L, "red ring"), (2L, "bed ring"), (3L, "red wing"),
      (4L, "blue bolt"), (5L, "glue bolt"), (6L, "totally different"))
      .toDF("id", "name")
    val out = Relational.sortedNeighborhoodPairs(names.repartition(3), "id",
        "name", col("name"), w = 3, maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().toSet
    // brute-force reference over the same total order
    val ranked = names.collect().map(r => (r.getString(1), r.getLong(0)))
      .sorted.zipWithIndex
    val want = (for {
      ((ka, a), ra) <- ranked; ((kb, b), rb) <- ranked
      if rb > ra && rb <= ra + 3
      d = {
        val dp = Array.tabulate(ka.length + 1, kb.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to ka.length; j <- 1 to kb.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
            dp(i - 1)(j - 1) + (if (ka(i - 1) == kb(j - 1)) 0 else 1))
        dp(ka.length)(kb.length).toLong
      }
      if d <= 2
    } yield (a, b, d)).toSet
    assert(out == want, s"got $out want $want")
    assert(out.contains((2L, 1L, 1L)) || out.contains((1L, 2L, 1L)),
      "cross-block typo pair must be found")
  }

  test("Quality checks count violations without materializing rows") {
    val li = Seq((1L, 5.0, "a"), (1L, -2.0, "b"), (2L, 60.0, null),
      (9L, 10.0, "d")).toDF("fk", "qty", "tag")
    val parent = Seq((1L, "x"), (2L, "y")).toDF("pk", "p")
    val rep = Quality.report(Seq(
      Quality.check("qty_range", li, col("qty") < 0 || col("qty") > 50),
      Quality.check("tag_not_null", li, col("tag").isNull),
      Quality.fkCheck("fk_parent", li, "fk", parent, "pk"),
      Quality.uniqueCheck("pk_unique", parent, "pk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("qty_range") == (2L, 4L))
    assert(rep("tag_not_null") == (1L, 4L))
    assert(rep("fk_parent") == (1L, 4L), "fk=9 has no parent")
    assert(rep("pk_unique") == (0L, 2L))
  }

  test("splitBalance: zero imbalance iff shares match across splits") {
    // lang x: 6 train / 3 test; lang y: 4 train / 2 test -> both 2:1,
    // perfectly proportional -> imbalance 0 for both
    val even = (Seq.fill(6)(("x", "train")) ++ Seq.fill(3)(("x", "test")) ++
      Seq.fill(4)(("y", "train")) ++ Seq.fill(2)(("y", "test")))
      .toDF("lang", "split")
    val ev = Quality.splitBalance(even, "lang", "split", "train", "test")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ev == Map("x" -> 0L, "y" -> 0L), s"proportional split must be 0: $ev")
    // skew lang y entirely into train -> nonzero imbalance on both strata
    val skewed = (Seq.fill(6)(("x", "train")) ++ Seq.fill(3)(("x", "test")) ++
      Seq.fill(6)(("y", "train"))).toDF("lang", "split")
    val sk = Quality.splitBalance(skewed, "lang", "split", "train", "test")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sk("y") == 18L && sk("x") == 18L, s"skew must surface: $sk")
  }

  test("peakConcurrency sweeps half-open intervals correctly") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 9L, 12L),
      // half-open: [0,5) and [5,10) never overlap
      ("b", 0L, 5L), ("b", 5L, 10L))
      .toDF("g", "s", "e")
    val out = graft.operators.EventTime.peakConcurrency(iv, "g", "s", "e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") == (3L, 9L), s"expected peak 3 first at t=9, got ${out("a")}")
    assert(out("b") == (1L, 0L),
      s"touching half-open intervals must not overlap, got ${out("b")}")
  }

  test("snapshotDiff: null-safe compares, presence not inferred from values") {
    val old = Seq((1L, Option(10L), "a"), (2L, None: Option[Long], "b"),
      (3L, Option(30L), "c"), (4L, Option(40L), "d"))
      .toDF("k", "v", "g")
    val neu = Seq((1L, Option(10L), "a"),      // unchanged -> dropped
      (2L, None: Option[Long], "b"),           // null == null -> unchanged
      (3L, None: Option[Long], "c"),           // 30 -> null: an update
      (5L, Option(50L), "e"))                  // insert; 4 deleted
      .toDF("k", "v", "g")
    val out = Relational.snapshotDiff(old, neu, Seq("k"), Seq("v", "g"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("change_type")).toMap
    assert(out == Map(3L -> "update", 4L -> "delete", 5L -> "insert"),
      s"got $out")
  }

  test("applyAggDelta: group-moving update and vanishing group match recompute") {
    val old = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"))
      .toDF("k", "v", "g")
    val neu = Seq((1L, 10L, "a"),   // unchanged
      (2L, 25L, "b"),               // update that MOVES group a -> b
      (4L, 40L, "c"))               // insert; 3 (group b) deleted
      .toDF("k", "v", "g")
    val baseAgg = old.groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_val"))
    val diff = Relational.snapshotDiff(old, neu, Seq("k"), Seq("v", "g"))
    val got = Relational.applyAggDelta(baseAgg, diff, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = neu.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"delta=$got recompute=$want")
    assert(got.keySet == Set("a", "b", "c"))
  }

  test("skyline2D: domination edges — equal points kept, equal-one-dim dominated") {
    val pts = Seq(
      (1L, 10L, 50L),  // skyline
      (2L, 10L, 50L),  // exact duplicate of 1: neither dominates -> kept
      (3L, 10L, 60L),  // same x as 1, worse y -> dominated
      (4L, 20L, 50L),  // same y as 1, worse x -> dominated
      (5L, 20L, 40L),  // skyline (cheaper on y than anything at x<20)
      (6L, 30L, 40L),  // y ties 5 at higher x -> dominated
      (7L, 5L, 90L))   // lowest x -> skyline regardless of y
      .toDF("id", "x", "y")
    val got = Relational.skyline2D(pts, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L, 7L), s"skyline ids: $got")
  }

  test("skyline2D matches the naive quadratic definition on random points") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("id", "x", "y").cache()
    val fast = Relational.skyline2D(pts, "id", "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    val a = pts.select(col("id"), col("x"), col("y"))
    val b = pts.select(col("id").as("qid"), col("x").as("qx"),
      col("y").as("qy"))
    val dominated = a.join(b,
        col("qx") <= col("x") && col("qy") <= col("y") &&
          (col("qx") < col("x") || col("qy") < col("y")), "left_semi")
      .select("id").collect().map(_.getLong(0)).toSet
    val naive = pts.select("id").collect().map(_.getLong(0)).toSet -- dominated
    assert(fast == naive,
      s"missing=${naive -- fast} extra=${fast -- naive}")
  }

  test("q115 entity resolution conserves rows and entities across clustering") {
    val dir = "/root/testdata/sf0.001"
    val part = graft.sources.Tables.part(spark, dir)
    val out = graft.queries.WarehouseQueries
      .queries("q115_entity_resolution")(spark, dir).cache()
    val sums = out.agg(sum("n_rows"), sum("n_entities")).head()
    assert(sums.getLong(0) == part.count(),
      "every part row lands in exactly one cluster")
    assert(sums.getLong(1) == part.select("p_name").distinct().count(),
      "every canonical entity lands in exactly one cluster")
    // representative id is the cluster min -> cluster ids are member ids
    val ids = part.groupBy("p_name").agg(min("p_partkey").as("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.select("cluster_id").collect().map(_.getLong(0)).forall(ids))
  }

  test("stratifiedSample applies per-stratum rates and is id-pure") {
    val docs = (1L to 2000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val out = Curation.stratifiedSample(docs, "lang", "doc_id",
      Seq(("en", 100), ("de", 0)), defaultRate = 25)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("en", 0L) == docs.filter(col("lang") === "en").count(),
      "rate 100 keeps every row of the stratum")
    assert(!byLang.contains("de"), "rate 0 drops the stratum entirely")
    val fr = byLang.getOrElse("fr", 0L).toDouble /
      docs.filter(col("lang") === "fr").count()
    assert(fr > 0.15 && fr < 0.35, s"default rate ~25% expected, got $fr")
    // same ids survive under a different partitioning (content-pure)
    val again = Curation.stratifiedSample(docs.repartition(13), "lang", "doc_id",
      Seq(("en", 100), ("de", 0)), defaultRate = 25)
    assert(out.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(out.select("doc_id")).isEmpty)
  }

  test("HLL sketches merge without losing accuracy (rollup pattern)") {
    // the q95 partial-aggregate pattern at the SKETCH level: per-day HLL
    // sketches hll_union_agg'd to a month estimate the same cardinality
    // (within HLL error) as one direct month-level sketch, so 100 TB
    // distinct-count rollups can read tiny persisted sketch tables
    // instead of rescanning raw data. NOTE the union is NOT bit-identical
    // to the direct sketch (sparse vs dense internal modes) — mergeability
    // preserves ACCURACY, not sketch bytes; both must sit within the
    // configured error of exact
    val rows = (1L to 5000L).map(i => (i % 30, i % 997)).toDF("day", "uid")
    val daily = rows.groupBy(col("day"))
      .agg(expr("hll_sketch_agg(uid)").as("sk"))
    val merged = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val direct = rows
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(uid))").as("est"))
      .head().getLong(0)
    val exact = rows.select(col("uid")).distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged should be within 5% of exact $exact")
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
      s"direct estimate $direct should be within 5% of exact $exact")
  }

  test("tableChecksum: permutation-invariant, localizes a single-row change") {
    val base = (1L to 500L).map(i => (i, i * 7, s"s${i % 3}"))
      .toDF("k", "v", "s")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Quality.tableChecksum(df, "k", Seq(col("k"), col("v"), col("s")), 16)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = sums(base)
    assert(a.keySet.subsetOf((0L until 16L).toSet) && a.values.map(_._1).sum == 500L)
    // row order / partitioning must not change any digest
    assert(sums(base.repartition(13)) == a)
    // one tampered value flips exactly its own bucket's checksum
    val tampered = base.withColumn("v",
      when(col("k") === 250L, lit(999999L)).otherwise(col("v")))
    val b = sums(tampered)
    val diff = a.keySet.filter(k => a(k) != b(k))
    assert(diff.size == 1, s"exactly one bucket must diverge, got $diff")
    assert(a(diff.head)._1 == b(diff.head)._1, "row count unchanged")
  }

  test("applyChangeLog replays a snapshotDiff back to the target state") {
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "s")
    val target = Seq((1L, 10L, "a"), (2L, 25L, "b"), (4L, 40L, "d"))
      .toDF("k", "v", "s")
    val diff = Relational.snapshotDiff(base, target, Seq("k"), Seq("v", "s"))
    val replayed = Relational.applyChangeLog(base, diff, Seq("k"), Seq("v", "s"))
    assert(replayed.except(target).isEmpty && target.except(replayed).isEmpty,
      "replay must reconstruct the target snapshot exactly")
    assert(replayed.count() == 3)
  }

  test("triangleCounts: each triangle credited once per corner node") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    // and an isolated edge 6-7 (no triangles); duplicate + reversed edges
    // must not double-count
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (4L, 5L), (6L, 7L), (2L, 1L))
      .toDF("s", "d")
    val got = Graph.triangleCounts(edges, "s", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 per-node triangle counts, got $got")
  }

  test("clusteringCoefficients: triangle=1e6, junction=1/3, pendant NULL") {
    // triangle {1,2,3} + pendant edge 3-4: nodes 1,2 have deg 2 and one
    // triangle -> 2*1*1e6/2 = 1e6; node 3 has deg 3, one triangle ->
    // 2e6/6 = 333333; node 4 has deg 1 -> undefined (NULL, not 0)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.clusteringCoefficients(edges, "s", "d").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1L, Some(1000000L))))
    assert(got(2L) == ((2L, 1L, Some(1000000L))))
    assert(got(3L) == ((3L, 1L, Some(333333L))))
    assert(got(4L) == ((1L, 0L, None)))
    assert(got.size == 4, "every node in the edge set must appear")
  }

  test("kCore: peels to the maximal subgraph, throws when not converged") {
    // 4-clique {1,2,3,4} + chain 4-5-6 + triangle {7,8,9}:
    // 3-core = the clique only (the triangle's nodes have degree 2)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
      .toDF("s", "d")
    val core3 = Graph.kCore(edges, "s", "d", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be exactly the clique, got $core3")
    // 2-core keeps the triangle, drops the chain
    val core2 = Graph.kCore(edges, "s", "d", k = 2).collect()
      .map(_.getLong(0)).toSet
    assert(core2 == Set(1L, 2L, 3L, 4L, 7L, 8L, 9L), s"got $core2")
    // k above max degree empties cleanly (converges at zero edges)
    assert(Graph.kCore(edges, "s", "d", k = 5).isEmpty)
    // chain 1-2-3-4-5 under k=2 needs several peel rounds; maxIter=1 must
    // fail loudly rather than return a partial core
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    intercept[IllegalStateException] {
      Graph.kCore(chain, "s", "d", k = 2, maxIter = 1).collect()
    }
  }

  test("bfsHops: min hop wins, maxHops caps, unreachable absent") {
    // chain 1-2-3-4-5-6 plus shortcut 1-4; seeds {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, "s", "d", seeds, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 is 1 hop via the shortcut (not 3); 6 is 3 hops -> cut by maxHops
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L),
      s"expected capped BFS distances, got $got")
    // isolated seed explores nothing but reports itself
    val iso = Graph.bfsHops(edges, "s", "d", Seq(9L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iso == Map(9L -> 0L))
  }

  test("labelPropagation: a bridge edge does not merge two triangles; " +
    "partitioning-invariant") {
    // triangles {0,1,2} and {10,11,12} joined by the single edge 2-10:
    // connected components would report ONE blob; LPA must find two
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 6)
    assert(got(0L) == got(1L) && got(1L) == got(2L),
      s"first triangle must share one label, got $got")
    assert(got(10L) == got(11L) && got(11L) == got(12L),
      s"second triangle must share one label, got $got")
    assert(got(0L) != got(10L),
      s"the bridge must not merge the triangles, got $got")
    val got2 = Graph.labelPropagation(edges.repartition(7), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got, "deterministic LPA must not depend on partitioning")
  }

  test("modularityInt: hand-checked two-community split; " +
    "one-community partition scores exactly zero") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L)).toDF("a", "b")
    val twoComm = Seq((0L, 0L), (1L, 0L), (2L, 0L),
      (10L, 1L), (11L, 1L), (12L, 1L)).toDF("node", "label")
    // m=7; each community: e_c=3, d_c=2+2+3=7 → 4·7·3 − 49 = 35
    val got = Graph.modularityInt(edges, "a", "b", twoComm).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == Map(0L -> ((3L, 3L, 7L, 35L)),
      1L -> ((3L, 3L, 7L, 35L))), s"hand-check failed: $got")
    // everything in one community: Q = 4m·m − (2m)² = 0 by identity
    val oneComm = Seq(0L, 1L, 2L, 10L, 11L, 12L)
      .toDF("node").withColumn("label", lit(0L))
    val total = Graph.modularityInt(edges, "a", "b", oneComm)
      .agg(sum("contrib_4m2")).first().getLong(0)
    assert(total == 0L, s"one-community modularity must be 0, got $total")
  }

  test("refineMoves: mislabeled clique node rejoins with the exact " +
    "hand-computed gain; Q(after) = Q(before) + Σ gains always; accepted " +
    "moves are community-disjoint; partitioning-invariant") {
    // 5-clique with node 4 mislabeled into its own community 99:
    // m=10, moving 4→0 gains 4m·k_4→0 + 2k_4(d_99 − d_0) − 2k_4²
    // = 160 − 96 − 32 = 32; every reverse move is negative, so the
    // accepted set is exactly {4 → 0}.
    val clique = (for (i <- 0 to 4; j <- 0 to 4 if i < j)
      yield (i.toLong, j.toLong)).toDF("a", "b")
    val lab0 = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 99L))
      .toDF("node", "label")
    val moves = Graph.refineMoves(clique, "a", "b", lab0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(moves.toSeq == Seq((4L, 99L, 0L, 32L)), s"got ${moves.toSeq}")
    val refined = Graph.refineLabels(lab0,
      Graph.refineMoves(clique, "a", "b", lab0))
    val after = Graph.modularityInt(clique, "a", "b", refined)
      .agg(sum("contrib_4m2")).first().getLong(0)
    assert(after == 0L, s"one-community clique must score 0, got $after")

    // randomized invariants: for random graphs and random labelings,
    // (1) every accepted gain is > 0; (2) accepted moves touch pairwise
    // disjoint {from, to} community pairs; (3) each single gain is
    // EXACTLY the modularity delta of applying that move alone; (4) the
    // full accepted set satisfies Q(after) = Q(before) + Σ gains; and
    // (5) the accepted set is partitioning-invariant.
    val rnd = new scala.util.Random(7L)
    (0 until 3).foreach { _ =>
      val n = 12
      val es = Seq.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val lab = nodes.map(v => (v, rnd.nextInt(4).toLong)).toDF("node", "label")
      val edges = es.toDF("a", "b")
      def q(l: org.apache.spark.sql.DataFrame): Long =
        Graph.modularityInt(edges, "a", "b", l)
          .agg(coalesce(sum("contrib_4m2"), lit(0L))).first().getLong(0)
      val mv = Graph.refineMoves(edges, "a", "b", lab).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(mv.forall(_._4 > 0), s"non-positive accepted gain in ${mv.toSeq}")
      val comms = mv.flatMap(m => Seq(m._2, m._3))
      assert(comms.distinct.length == comms.length,
        s"accepted moves share a community: ${mv.toSeq}")
      val before = q(lab)
      mv.foreach { case (node, _, to, gain) =>
        val one = lab.withColumn("label",
          when(col("node") === node, to).otherwise(col("label")))
        assert(q(one) - before == gain,
          s"single-move delta mismatch for node $node: " +
            s"${q(one) - before} vs claimed $gain")
      }
      val refinedR = Graph.refineLabels(lab,
        Graph.refineMoves(edges, "a", "b", lab))
      assert(q(refinedR) == before + mv.map(_._4).sum,
        s"Q(after) must equal Q(before) + sum of gains")
      val mv2 = Graph.refineMoves(edges.repartition(7), "a", "b",
          lab.repartition(3)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(mv2.sorted.toSeq == mv.sorted.toSeq,
        "accepted set must not depend on partitioning")
    }
  }

  test("randomWalks: every consecutive pair is an edge, one (L+1)-row " +
    "walk per node, partitioning-invariant") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L)).toDF("a", "b")
    val walks = Graph.randomWalks(edges, "a", "b", steps = 4)
    val rows = walks.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 6 * 5, s"6 walks x 5 rows, got ${rows.length}")
    val sym = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L),
      (12L, 10L), (2L, 10L)).flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .toSet
    rows.groupBy(_._1).foreach { case (wid, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      assert(path.length == 5 && steps.map(_._2).sorted.sameElements(0L to 4L))
      assert(path.head == wid, "walk must start at its seed node")
      path.sliding(2).foreach { p =>
        assert(sym.contains(p(0) -> p(1)),
          s"walk $wid takes non-edge ${p(0)}->${p(1)}")
      }
    }
    val again = Graph.randomWalks(edges.repartition(7), "a", "b", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet,
      "hash-driven walks must not depend on partitioning")
  }

  test("itemCfRecommend: owned items never recommended, scores are " +
    "co-weight sums, rank is bounded and total") {
    val owned = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("u", "i")
    val co = Seq((1L, 2L, 5L), (1L, 3L, 2L), (2L, 3L, 1L))
      .toDF("item_a", "item_b", "n_groups")
    val got = Relational.itemCfRecommend(owned, "u", "i", co, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // user 1 owns {1,2}: candidate 3 scores 2+1 from 2 sources; 1 and 2
    // are co-neighbors of each other but OWNED → suppressed.
    // user 2 owns {3}: candidates 1 (w2) and 2 (w1), ranked by score.
    assert(got == Map(
      (1L, 3L) -> ((3L, 2L, 1L)),
      (2L, 1L) -> ((2L, 1L, 1L)),
      (2L, 2L) -> ((1L, 1L, 2L))), s"unexpected recommendations: $got")
  }

  test("CvM drift arithmetic: identical samples -> 0, disjoint -> 375000") {
    // the q281 statistic replayed on hand counts through the same ops:
    // A={1,2} B={3,4} -> 375000 ppm; A == B -> gap 0 everywhere
    def cvm(counts: Seq[(Long, Long, Long)]): (Long, Long) = {
      val df = counts.toDF("v", "c_a", "c_b")
      val runs = graft.operators.EventTime.globalRunningSums(
        df, "v", Seq("c_a", "c_b"))
      val tot = df.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
      val r = runs.crossJoin(broadcast(tot))
        .withColumn("d_ppm", graft.operators.Eval.stagedPpmDiv(
          col("running_c_a") * col("n_b") - col("running_c_b") * col("n_a"),
          col("n_a") * col("n_b")))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          sum((col("c_a") + col("c_b"))
            * expr("(d_ppm * d_ppm) div 1000000")).as("cvm_num"))
        .select(col("cvm_num"),
          expr("cvm_num div (n_a + n_b)").as("cvm_ppm"))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    // d_ppm over pooled values = 500000, 1000000, 500000, 0 ->
    // reduced squares 250000, 1000000, 250000, 0 -> num 1500000, /4
    assert(cvm(Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L),
      (4L, 0L, 1L))) == ((1500000L, 375000L)))
    assert(cvm(Seq((1L, 1L, 1L), (2L, 1L, 1L))) == ((0L, 0L)))
  }

  test("kTruss: K4 survives the 4-truss, pendant and glued-triangle " +
      "edges peel, the diamond chain cascades to empty") {
    import graft.operators.Graph
    // K4 {1,2,3,4} (every edge closes 2 triangles) + pendant 4-5 +
    // triangle {3,4,6} glued onto a K4 edge
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (3L, 6L), (4L, 6L)).toDF("s", "d")
    val t4 = Graph.kTruss(edges, "s", "d", k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)), s"4-truss must be exactly K4, got $t4")
    assert(t4.values.forall(_ == 2L), "every K4 edge closes 2 triangles")
    // diamond chain T(1,2,3)+T(2,3,4)+T(3,4,5): the 4-truss peel needs a
    // CASCADE (round 1 leaves (2,3),(3,4); round 2 drops them) -> empty
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("s", "d")
    assert(Graph.kTruss(chain, "s", "d", k = 4).count() == 0L,
      "the cascade must peel the chain to empty")
    // ...while its 3-truss keeps every edge (each closes one triangle)
    assert(Graph.kTruss(chain, "s", "d", k = 3).count() == 7L)
  }
}
