package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
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

  test("densityClusters: hand-built geometry — two dense families stay " +
      "separate clusters, under-dense points are absent") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 2-d unit-ish vectors: family A = 3 near-identical vectors around
    // (1,0); family B = 3 around (0,1); a mid-angle point seeing neither
    // family at eps=0.97 (noise); a far-out noise point; and an isolated
    // tight PAIR — mutual neighbors but only 2-dense, so with minPts=3
    // neither is core and neither has a core neighbor -> noise
    def v(x: Double, y: Double) = Seq(x, y)
    val rows = Seq(
      1L -> v(1.0, 0.0), 2L -> v(0.999, 0.04), 3L -> v(0.998, 0.06),
      10L -> v(0.0, 1.0), 11L -> v(0.04, 0.999), 12L -> v(0.06, 0.998),
      20L -> v(0.76, 0.65),               // 40° out: sees no one at 0.97
      30L -> v(-1.0, 0.0),                // noise
      40L -> v(-0.70, 0.71), 41L -> v(-0.71, 0.70)) // tight pair, not core
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("vec", ArrayType(DoubleType)),
      StructField("nrm", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, xy) =>
        Row(id, xy, math.sqrt(xy.map(a => a * a).sum)) }),
      schema)
    val got = Similarity.densityClusters(df, eps = 0.97, minPts = 3, nBlocks = 4)
      .as[(Long, Long, String)].collect().toSet
    // A: {1,2,3} all within cos 0.97 of each other -> all core, cluster 1
    // B: {10,11,12} likewise, cluster 10
    // 20: cos(20,1)=0.76 < eps... must be absent unless near a core.
    val clusters = got.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(clusters.contains(1L) && clusters(1L).map(identity) == Set(1L, 2L, 3L),
      s"family A wrong: $got")
    assert(clusters.contains(10L) && clusters(10L) == Set(10L, 11L, 12L),
      s"family B wrong: $got")
    assert(!got.exists(r => Set(20L, 30L, 40L, 41L).contains(r._1)),
      s"noise leaked into output: $got")
    assert(got.forall(_._3 == "core"))
  }

  test("densityClusters: a core bridge merges families; an isolated " +
      "core is its own singleton cluster; borders take the min cluster") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Two identical-vector families 22.5° apart (cos 0.9239 < eps, so
    // they never see each other directly); point 5 sits ~11° from BOTH
    // (cos ≈ 0.981 ≥ eps) and bridges them; 99 is orthogonal to all.
    def v(x: Double, y: Double, z: Double) = Seq(x, y, z)
    val rows = Seq(
      1L -> v(1, 0, 0), 2L -> v(1, 0, 0), 3L -> v(1, 0, 0),
      7L -> v(0.9239, 0.3827, 0), 8L -> v(0.9239, 0.3827, 0),
      9L -> v(0.9239, 0.3827, 0),
      5L -> v(0.981, 0.196, 0),
      99L -> v(0, 0, 1))
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("vec", ArrayType(DoubleType)),
      StructField("nrm", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, xy) =>
        Row(id, xy, math.sqrt(xy.map(a => a * a).sum)) }), schema)
    // minPts=1: every point is core, so 5 is a core bridge -> one merged
    // cluster (id 1), and isolated 99 is a singleton core cluster
    val got = Similarity.densityClusters(df, eps = 0.97, minPts = 1,
        nBlocks = 4)
      .as[(Long, Long, String)].collect().toSet
    assert(got.contains((99L, 99L, "core")), s"singleton core missing: $got")
    val ids = got.filter(r => Seq(1L, 2L, 3L, 5L, 7L, 8L, 9L).contains(r._1))
    assert(ids.forall(_._2 == 1L), s"bridged families must merge: $got")
    // minPts=5: families of 3 + the bridge give each family member
    // 4 in-neighborhood points + self = 5 -> core only for members seeing
    // both the family AND the bridge... family members see {fam(3) + 5}
    // = 4 + self = 5 -> core; 5 sees {both families} = 6 + self -> core;
    // 99 sees only itself -> NOT core (needs 5) -> absent entirely
    val strict = Similarity.densityClusters(df, eps = 0.97, minPts = 5,
        nBlocks = 4)
      .as[(Long, Long, String)].collect().toSet
    assert(!strict.exists(_._1 == 99L), s"under-dense point kept: $strict")
    assert(strict.map(_._1) == Set(1L, 2L, 3L, 5L, 7L, 8L, 9L))
  }

  test("hardNegatives matches a brute-force cross-label top-k in memory") {
    val c = corpus.filter(col("vec_id") < 120)
    val labels = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 120).select(col("vec_id"), col("label"))
    val got = Similarity.hardNegatives(c, labels, k = 3, minSim = 0.1)
      .select("anchor_id", "negative_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet

    val vecs = c.select("vec_id", "vec").as[(Long, Seq[Double])]
      .collect().toMap
    val lab = labels.as[(Long, Int)].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val expect = (for {
      (a, va) <- vecs.toSeq
      cands = vecs.toSeq
        .filter { case (b, _) => b != a && lab(b) != lab(a) }
        .map { case (b, vb) => (b, cos(va, vb)) }
        .filter(_._2 >= 0.1)
        .sortBy { case (b, s) => (-s, b) }
        .take(3)
      ((b, s), i) <- cands.zipWithIndex
    } yield (a, b, (i + 1).toLong, s)).toSet
    assert(got == expect,
      s"diff got-expect=${got -- expect}\nexpect-got=${expect -- got}")
    // every emitted pair crosses labels
    assert(got.forall { case (a, b, _, _) => lab(a) != lab(b) })
  }

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

  test("PQ ADC top-10 recall vs the exact float path (measured, pinned)") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 5)
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val truth = topkMap(Similarity.bruteForceTopK(queries, c, 10))
    // pure ADC at the q152 geometry (16 subspaces x 32 codewords):
    // measured 0.36 on this corpus — the honest compressed-only number
    val adcOnly = topkMap(Similarity.pqTopK(queries, c, 16, 32, 64, 10))
    val adcRecall = truth.map { case (q, t) =>
      (t & adcOnly.getOrElse(q, Set.empty)).size / 10.0 }.sum / truth.size
    info(s"PQ pure-ADC recall@10 = $adcRecall")
    assert(adcRecall >= 0.3, s"ADC recall collapsed: $adcRecall")
    // shortlist-100 + exact re-rank (the q152 shape): measured 0.88
    val rr = topkMap(Similarity.pqRerankTopK(queries, c, 16, 32, 64, 100, 10))
    val rrRecall = truth.map { case (q, t) =>
      (t & rr.getOrElse(q, Set.empty)).size / 10.0 }.sum / truth.size
    info(s"PQ rerank recall@10 = $rrRecall")
    assert(rrRecall >= 0.8, s"reranked recall collapsed: $rrRecall")
    assert(rrRecall >= adcRecall - 1e-9,
      "re-ranking must not lose recall vs pure ADC")
  }

  test("persisted PQ index: served-from-disk == in-session rerank, " +
      "recall@10 floor re-asserted on the loaded artifact") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 5)
    val pqDir = java.nio.file.Files.createTempDirectory("graft_pq_spec")
      .toString
    Similarity.savePqIndex(Similarity.buildPqIndex(c, 16, 32, 64), pqDir)
    val idx = Similarity.loadPqIndex(spark, pqDir)
    assert(idx.subspaces == 16 && idx.codewords == 32,
      "loaded geometry must be read off the codebook artifact")
    val served = Similarity.pqTopKFromIndex(idx, queries, 100, 10)
      .select("query_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    // the in-session path retrains the codebook from the same corpus with
    // the same md5-pivot rule, so save -> load -> serve must be
    // bit-identical to it: any drift here means the persisted artifact
    // does not reproduce the trained quantizer
    val inSession = Similarity.pqRerankTopK(queries, c, 16, 32, 64, 100, 10)
      .select("query_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == inSession,
      s"served-from-disk PQ != in-session PQ: ${served.diff(inSession)}")
    // recall floor on the LOADED artifact (the q152 pinned number)
    def topkMap(rows: Set[(Long, Long, Long, Double)]): Map[Long, Set[Long]] =
      rows.groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2) }
    val truth = Similarity.bruteForceTopK(queries, c, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val recall = truth.map { case (q, t) =>
      (t & topkMap(served).getOrElse(q, Set.empty)).size / 10.0 }
      .sum / truth.size
    info(s"persisted-PQ rerank recall@10 = $recall")
    assert(recall >= 0.8, s"recall collapsed on the loaded artifact: $recall")
  }

  test("matryoshka tiered serve: 16-dim shortlist + full re-rank recall " +
      "(measured, pinned); deeper prefixes never lose recall") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 5)
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val truth = topkMap(Similarity.bruteForceTopK(queries, c, 10))
    def trunc(df: org.apache.spark.sql.DataFrame, d: Int) = {
      val v = slice(col("vec"), 1, d)
      df.select(col("vec_id"), v.as("vec"), Similarity.norm(v).as("nrm"))
    }
    def rerankRecall(d: Int): Double = {
      val sl = Similarity.bruteForceTopK(trunc(queries, d), trunc(c, d), 50)
        .select(col("query_id"), col("neighbor_id"))
      val rr = sl
        .join(queries.select(col("vec_id").as("query_id"),
          col("vec").as("qvec"), col("nrm").as("qnrm")), Seq("query_id"))
        .join(c.select(col("vec_id").as("neighbor_id"),
          col("vec").as("cvec"), col("nrm").as("cnrm")), Seq("neighbor_id"))
        .withColumn("sim", round(Similarity.cosineWithNorms(col("qvec"),
          col("cvec"), col("qnrm"), col("cnrm")), 6))
      val top = topkMap(graft.operators.Relational.topKPerGroup(rr,
        Seq(col("query_id")),
        Seq(col("sim").desc, col("neighbor_id").asc), 10, "rank"))
      truth.map { case (q, t) =>
        (t & top.getOrElse(q, Set.empty)).size / 10.0 }.sum / truth.size
    }
    // measured on this corpus: 16-dim 0.48, 32-dim 0.72. These synthetic
    // embeddings are NOT MRL-trained — information is spread evenly
    // across dimensions, so truncation costs more than a trained model
    // would pay (front-loaded prefixes). The pins hold the measured
    // floor and the monotone improvement; q271 serves the 32-dim tier.
    val r16 = rerankRecall(16)
    val r32 = rerankRecall(32)
    info(f"matryoshka rerank recall@10: 16-dim $r16%.2f, 32-dim $r32%.2f")
    assert(r16 >= 0.4, s"16-dim shortlist recall collapsed: $r16")
    assert(r32 >= r16 - 1e-9, "a deeper prefix lost recall vs a shallower one")
    assert(r32 >= 0.65, s"32-dim shortlist recall collapsed: $r32")
  }

  // The MRL tier is a pure projection: save -> load roundtrips
  // bit-identically, retraction == rebuilding from the remaining corpus,
  // and retract ∘ delta == identity (the q301/q262-surface-8 algebra).
  test("MRL tier: save/load roundtrip; retract == rebuild; " +
      "retract ∘ delta == identity") {
    val c = corpus
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mrl-spec").toString
    val tier = Similarity.buildMrlTier(c, 32)
    Similarity.saveMrlTier(tier, dir)
    val loaded = Similarity.loadMrlTier(spark, dir)
    def set(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("vec_id"), col("pvec").cast("string"),
        col("pnrm"))).as[String].collect().toSet
    assert(set(loaded) == set(tier), "save/load did not roundtrip")
    val del = c.filter(col("vec_id") % 10 === 3).select("vec_id")
    val retracted = Similarity.retractFromMrlTier(loaded, del)
    val rebuilt = Similarity.buildMrlTier(
      c.filter(col("vec_id") % 10 =!= 3), 32)
    assert(set(retracted) == set(rebuilt), "retract != rebuild")
    val back = Similarity.applyMrlDelta(retracted,
      c.filter(col("vec_id") % 10 === 3), 32)
    assert(set(back) == set(tier), "retract ∘ delta lost rows")
  }

  test("recodeDriftedSubspaces: drifted-subspace quantization error drops " +
      "(measured); cold subspaces bit-identical") {
    val c = corpus
    val old = c.filter(col("vec_id") % 10 =!= 7)
    val fresh = c.filter(col("vec_id") % 10 === 7)
      .withColumn("vec", reverse(col("vec")))
    val driftedIdx = Similarity.applyPqDelta(
      Similarity.buildPqIndex(old, 16, 32, 64), fresh)
    def qerrBySub(ix: Similarity.PqIndex): Map[Int, Long] =
      Similarity.pqDriftStats(ix).groupBy(col("m"))
        .agg(sum(col("sum_qerr")).as("q")).as[(Int, Long)].collect().toMap
    val before = qerrBySub(driftedIdx)
    val threshold = before.values.sum / 16
    val driftedSubs = before.filter(_._2 > threshold).keySet
    assert(driftedSubs.nonEmpty && driftedSubs.size < 16,
      s"drift rule degenerate: $driftedSubs")
    val recoded = Similarity.recodeDriftedSubspaces(driftedIdx)
    val after = qerrBySub(recoded)
    // MONOTONE by construction (validate-before-swap): no subspace may
    // ever regress — the guard this rule exists for, since the raw
    // md5-pivot retrain DOES regress on some subspaces here
    (0 until 16).foreach { m =>
      assert(after(m) <= before(m),
        s"subspace $m error increased: ${before(m)} -> ${after(m)}")
    }
    val swapped = (0 until 16).filter(m => after(m) < before(m))
    assert(swapped.nonEmpty,
      "no subspace validated its retrain — the drift scenario is vacuous")
    assert(swapped.toSet.subsetOf(driftedSubs),
      s"swapped $swapped outside the drifted set $driftedSubs")
    info(s"drifted $driftedSubs, swapped $swapped: qerr over swapped " +
      s"${swapped.map(before).sum} -> ${swapped.map(after).sum}")
    // unswapped subspaces: codes bit-identical
    def codesOf(ix: Similarity.PqIndex) =
      ix.codes.select(col("vec_id"),
          posexplode(col("codes")).as(Seq("m", "code")))
        .filter(!col("m").isInCollection(swapped))
        .as[(Long, Int, Int)].collect().toSet
    assert(codesOf(recoded) == codesOf(driftedIdx),
      "unswapped subspaces' codes changed under the partial retrain")
    // evalAll: absolute decay is actionable — every subspace is a
    // candidate, the validate-before-swap gate keeps it monotone, and
    // it can only swap MORE than the relative rule, never less
    val afterAll = qerrBySub(
      Similarity.recodeDriftedSubspaces(driftedIdx, evalAll = true))
    (0 until 16).foreach { m =>
      assert(afterAll(m) <= before(m),
        s"evalAll: subspace $m error increased: ${before(m)} -> ${afterAll(m)}")
      assert(afterAll(m) <= after(m),
        s"evalAll swapped less than the relative rule on subspace $m")
    }
    val swappedAll = (0 until 16).filter(m => afterAll(m) < before(m))
    assert(swapped.toSet.subsetOf(swappedAll.toSet),
      s"evalAll swapped $swappedAll, missing relative-rule swaps $swapped")
  }

  test("IVF-PQ compound recall and the pruning it buys (measured, pinned)") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 5)
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val truth = topkMap(Similarity.bruteForceTopK(queries, c, 10))
    val cents = c.filter(col("vec_id") % 40 === 0)
    val ivfpq = topkMap(Similarity.ivfPqTopK(queries, c, cents,
      16, 32, 64, 2, 50, 10))
    val recall = truth.map { case (q, t) =>
      (t & ivfpq.getOrElse(q, Set.empty)).size / 10.0 }.sum / truth.size
    info(s"IVF-PQ recall@10 = $recall")
    // compounds the nprobe=2 cell miss on top of the ADC cut — must stay
    // a usable index, and must never exceed what pure PQ rerank achieves
    assert(recall >= 0.5, s"IVF-PQ recall collapsed: $recall")
    // work pruning: with 13 cells and nprobe=2, each query scans ~2/13 of
    // the corpus instead of all of it
    val scanned = Similarity.probeCentroids(queries, cents, 2)
      .select(col("centroid_id")).distinct().count()
    assert(scanned <= 10, s"probe set unexpectedly wide: $scanned cells")
  }

  test("PQ ADC distances are non-decreasing in rank") {
    val c = corpus
    val out = Similarity.pqTopK(c.filter(col("vec_id") < 5), c, 8, 16, 64, 10)
      .select("query_id", "rank", "adc").as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    out.values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  // The block grid must emit exactly the pairs a naive cross join emits —
  // every unordered pair exactly once, any block geometry. Small corpus so
  // the cross-join truth is cheap; nBlocks values cover degenerate (1),
  // non-dividing (7), and more-blocks-than-rows (97) geometries.
  test("blockGridPairs == cross-join truth for any block count") {
    val c = corpus.filter(col("vec_id") < 60).cache()
    val truth = c.select(col("vec_id").as("id_a"), col("vec").as("va"), col("nrm").as("na"))
      .crossJoin(c.select(col("vec_id").as("id_b"), col("vec").as("vb"), col("nrm").as("nb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosineWithNorms(col("va"), col("vb"), col("na"), col("nb")), 6).as("sim"))
      .filter(col("sim") >= 0.2)
      .as[(Long, Long, Double)].collect().toSet
    for (b <- Seq(1, 7, 97)) {
      val got = Similarity.blockGridPairs(c, 0.2 - 1e-6, nBlocks = b)
        .select(col("id_a"), col("id_b"), round(col("sim_raw"), 6).as("sim"))
        .filter(col("sim") >= 0.2)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == truth, s"nBlocks=$b: ${got.size} pairs vs truth ${truth.size}")
    }
  }

  // RH-LSH tradeoff, side 1: at q60's LOW threshold (0.4 — chosen so the
  // random synthetic corpus yields a non-trivial oracle-checkable pair set)
  // the 16×4-bit bands keep recall near-perfect, but pruning is weak
  // (~36%): random 64-dim pairs sit at |sim|≈0.1, only ~84° from the 66°
  // threshold, so short bands collide often. That is a property of the
  // threshold, not the method — side 2 (next test) shows the design point.
  test("rh-lsh at threshold 0.4: high recall, weak pruning (documented)") {
    val c = corpus.withColumn("bands", Similarity.rhBands(col("vec"), 64, 4, 64)).cache()
    val n = c.count()
    val cand = Dedup.candidatePairs(c, "vec_id", "bands")
      .as[(Long, Long)].collect().toSet
    val exact = Similarity.blockGridPairs(corpus, 0.4 - 1e-6)
      .select(col("id_a"), col("id_b"), round(col("sim_raw"), 6).as("sim"))
      .filter(col("sim") >= 0.4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val recall = (exact & cand).size.toDouble / exact.size
    val allPairs = n * (n - 1) / 2.0
    assert(recall >= 0.9, s"recall $recall < 0.9 (${exact.size} exact pairs)")
    assert(cand.size < allPairs * 0.8,
      s"candidates ${cand.size} vs all ${allPairs.toLong} pairs - worse than no banding")
  }

  // RH-LSH tradeoff, side 2: the production near-dup regime (sim >= ~0.99,
  // e.g. crawl dups / boilerplate). Plant 20 dups by deterministic <=5%
  // relative perturbation; with 8 bands x 16 bits every planted pair
  // collides (per-plane agreement ~0.98 -> miss prob ~4e-5) while random
  // pairs (agreement ~0.53, band hit 0.53^16) almost never do — candidates
  // collapse to ~0.1% of the quadratic pair space. THIS is the operating
  // point that makes banding the 100 TB path.
  test("rh-lsh at the high-sim operating point: planted dups found, strong pruning") {
    val base = corpus.filter(col("vec_id") < 200)
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("vec"), (x, j) =>
          x * (lit(1.0) + (pmod(hash(concat(col("vec_id"), lit(":"), j)), lit(2001))
            - 1000) / 1000.0 * 0.05)).as("vec"))
      .withColumn("nrm", Similarity.norm(col("vec")))
    val c = base.unionByName(planted)
      .withColumn("bands", Similarity.rhBands(col("vec"), 128, 16, 64)).cache()
    val n = c.count()
    val cand = Dedup.candidatePairs(c, "vec_id", "bands")
      .as[(Long, Long)].collect().toSet
    val plantedPairs = (0L until 20L).map(i => (i, i + 10000)).toSet
    assert((plantedPairs & cand) == plantedPairs,
      s"missed planted pairs: ${plantedPairs -- cand}")
    val allPairs = n * (n - 1) / 2.0
    assert(cand.size < allPairs * 0.02,
      s"candidates ${cand.size} vs all ${allPairs.toLong} pairs - pruning too weak")
  }

  // Multi-probe at the harder 16x8-bit geometry: probing each band's
  // single-bit flips must recover the recall exact banding loses there —
  // >= 0.9 vs the exact block-grid pairs, at a geometry where
  // single-probe demonstrably fails (so the probes, not the bands, do
  // the work). Deterministic: md5-derived planes, fixed corpus.
  test("multi-probe rh-lsh: recall >= 0.9 where single-probe fails") {
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), 128, 8, 64)).cache()
    val exact = Similarity.blockGridPairs(corpus, 0.4 - 1e-6)
      .withColumn("sim", round(col("sim_raw"), 6))
      .filter(col("sim") >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = Dedup.candidatePairs(c, "vec_id", "bands")
      .as[(Long, Long)].collect().toSet
    val multi = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", 8)
      .as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi), "multi-probe must only ADD candidates")
    def recall(cand: Set[(Long, Long)]) =
      (exact & cand).size.toDouble / exact.size
    assert(recall(multi) >= 0.9, s"multi-probe recall ${recall(multi)} < 0.9")
    assert(recall(single) < 0.9,
      s"single-probe recall ${recall(single)} already >= 0.9 - geometry too easy")
  }

  // The band-geometry dial (round-10 verdict #1). Floor calibration:
  // at the oracle-checked scales the dial must reproduce the pinned
  // q145 geometry EXACTLY (the q250/q261/q215/q216 DuckDB mirrors
  // hardcode 16 bands x 8 bits); at the synthesized sf1 it widens.
  test("dialedBandGeometry: floor == pinned q145 geometry; widens with n") {
    assert(Similarity.dialedBandGeometry(500L) == (16, 8))   // sf0.01
    assert(Similarity.dialedBandGeometry(2000L) == (16, 8))  // sf0.1
    assert(Similarity.dialedBandGeometry(2048L) == (16, 8))  // floor edge
    assert(Similarity.dialedBandGeometry(20000L) == (67, 12)) // synth sf1
    // bits grows with log n; bucket count tracks n/8 within a factor 2
    val ns = Seq(4097L, 20000L, 100000L, 1000000L)
    ns.foreach { n =>
      val (_, bits) = Similarity.dialedBandGeometry(n)
      val buckets = 1L << bits
      assert(buckets >= n / 8 && buckets <= n / 8 * 2,
        s"n=$n: 2^$bits buckets misses the n/8 occupancy target")
    }
    intercept[IllegalArgumentException](
      Similarity.dialedBandGeometry(1L << 40)) // radius, not width, past 24 bits
  }

  // The UNIFIED dial (round-13 verdict #3): one entry point across the
  // 24-bit cap. Below it: dialedBandGeometry verbatim at radius 1
  // (floor pinned). At the boundary (n = 8·2^24 vs +1): radius steps
  // 1 -> 2, the corpus-side index SHRINKS (fewer bands — the measured
  // 40%-smaller-index trade), and the modeled background candidate
  // mass per query moves by a bounded factor, not a discontinuity.
  // And no n throws — the refusal the old dial hard-required is gone.
  test("dialedGeometry: continuous across the 24-bit cap; floor pinned") {
    assert(Similarity.dialedGeometry(500L) == ((8, 16, 1)))
    assert(Similarity.dialedGeometry(2048L) == ((8, 16, 1)))
    assert(Similarity.dialedGeometry(20000L) == ((12, 67, 1)))
    val nCap = 8L << 24 // largest n the occupancy rule maps to 24 bits
    val (bits1, bands1, r1) = Similarity.dialedGeometry(nCap)
    val (bits2, bands2, r2) = Similarity.dialedGeometry(nCap + 1)
    assert((bits1, r1) == ((24, 1)) && (bits2, r2) == ((25, 2)))
    assert(bands2 < bands1, "the radius step must shrink the index")
    def chs(nn: Int, k: Int): Double =
      (0 until k).map(i => (nn - i).toDouble / (i + 1)).product
    def mass(n: Long, bits: Int, bands: Int, radius: Int): Double = {
      val probedBuckets = (0 to radius).map(chs(bits, _)).sum
      n.toDouble * bands * probedBuckets / math.pow(2.0, bits)
    }
    val m1 = mass(nCap, bits1, bands1, r1)
    val m2 = mass(nCap + 1, bits2, bands2, r2)
    info(f"boundary candidate mass per query: $m1%.0f -> $m2%.0f " +
      f"(x${m2 / m1}%.2f); index bands $bands1 -> $bands2")
    assert(m2 < m1 * 4 && m2 > m1 / 4,
      s"candidate mass discontinuity at the cap: $m1 -> $m2")
    // way past the cap: still defined, still radius 2. The occupancy
    // rule tops out at 60 bits for ANY Long n (ceil(log2(n/8)) ≤ 60 at
    // n = 2^63 − 1), so the 62-bit saturation guard is defensive and
    // unreachable — and the largest reachable probe set (radius 2 at
    // 60 bits = 1831 masks) stays under the 2048 codegen bound
    val (bitsBig, _, rBig) = Similarity.dialedGeometry(Long.MaxValue)
    assert(bitsBig == 60 && rBig == 2)
  }

  // Recall of the DIALED sf1 geometry (67 bands x 12 bits), measured on
  // this corpus against the exact block-grid pairs at the q145
  // operating threshold: recall depends on pair similarity and geometry,
  // never on n, so measuring the large-n geometry on the test corpus is
  // the honest check that the dial's band-count rule actually holds the
  // q145 recall floor while the bucket count grows 16x.
  test("dialed sf1 geometry (67x12) holds the q145 recall floor (0.93)") {
    val (bands, bits) = Similarity.dialedBandGeometry(20000L)
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), bands * bits, bits, 64)).cache()
    val exact = Similarity.blockGridPairs(corpus, 0.4 - 1e-6)
      .withColumn("sim", round(col("sim_raw"), 6))
      .filter(col("sim") >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", bits)
      .as[(Long, Long)].collect().toSet
    val recall = (exact & cand).size.toDouble / exact.size
    info(f"dialed ($bands x $bits) recall at sim>=0.4: $recall%.3f " +
      s"(${cand.size} candidates)")
    assert(recall >= 0.93, s"dialed-geometry recall $recall < 0.93")
  }

  // The probe-radius leg (round 12, verdict #6): the PAST-CAP shape —
  // 3 more bits than the dial affords at radius 1, Hamming radius 2
  // restoring the band count via the binomial-tail model — must hold
  // the same recall floor. Recall depends on geometry and pair
  // similarity, never on n (the dialed-geometry test's argument), so
  // the oracle corpus measures it honestly; candidate volume at
  // n = 200k is ScaleCurve's probe leg (PROBE_LEG.json).
  test("radius-2 past-cap geometry holds the 0.93 recall floor") {
    // model consistency: radius 1 at the dialed width reproduces the
    // dial's own band rule
    assert(Similarity.bandsAtRadius(12, 1) ==
      Similarity.dialedBandGeometry(20000L)._1)
    val bits = 15 // dial(20k) gives 12; +3 bits, radius 2
    val bands = Similarity.bandsAtRadius(bits, 2)
    // fewer bands than radius 1 would need at this width — the whole
    // point of the radius escalation
    assert(bands < Similarity.bandsAtRadius(bits, 1),
      s"radius 2 saved no bands at $bits bits")
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), bands * bits, bits, 64)).cache()
    val exact = Similarity.blockGridPairs(corpus, 0.4 - 1e-6)
      .withColumn("sim", round(col("sim_raw"), 6))
      .filter(col("sim") >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", bits,
        radius = 2)
      .as[(Long, Long)].collect().toSet
    val recall = (exact & cand).size.toDouble / exact.size
    info(f"past-cap ($bands x $bits, radius 2) recall at sim>=0.4: " +
      f"$recall%.3f (${cand.size} candidates)")
    assert(recall >= 0.93, s"radius-2 geometry recall $recall < 0.93")
  }

  // The EXECUTED candidate swap (q215/q216): the kNN-outlier and
  // hard-negative operators run over the multi-probe LSH candidates
  // instead of the exact grid, and the recall of each END RESULT —
  // not just the candidate pairs — is measured against the exact
  // version. This turns the "candidate-source-agnostic at 100 TB"
  // Scaladoc claim into numbers: on this corpus, candidate-only
  // outlier recall is 0.60 — WHY q215 ships the two-stage shape —
  // and the exact re-rank lifts it to 1.00 (asserted ≥ 0.9);
  // hard-negative top-5-pair recall 0.84 (asserted ≥ 0.8). Also pins
  // full anchor coverage (every corpus vector receives candidates at
  // this geometry), the precondition knnOutliersFrom's fallback rank
  // needs to matter only for sparse — not absent — anchors.
  test("executed LSH swap: knnOutliersRerank + hardNegativesFrom recall vs exact grid") {
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), 128, 8, 64)).cache()
    val cand = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", 8)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b")).cache()
    val covered = cand.select(explode(array(col("id_a"), col("id_b"))))
      .distinct().count()
    assert(covered == c.count(),
      s"anchor coverage $covered/${c.count()} - geometry leaves orphans")

    val exactOut = Similarity.knnOutliers(corpus, 5, 50)
      .select("vec_id").as[Long].collect().toSet
    // stage 1 alone: the candidate-only estimate — kept as the measured
    // statement of WHY the exact re-rank stage exists (0.60 here)
    val stage1 = Similarity.knnOutliersFrom(corpus, cand, 5, 50)
      .select("vec_id").as[Long].collect().toSet
    val stage1Recall = (exactOut & stage1).size.toDouble / exactOut.size
    // the shipped two-stage shape (q215): shortlist factor 3, exact
    // re-rank — measured 1.00 on this corpus
    val reranked = Similarity.knnOutliersRerank(corpus, cand, 5, 50, 3)
      .select("vec_id").as[Long].collect().toSet
    val outRecall = (exactOut & reranked).size.toDouble / exactOut.size
    assert(outRecall >= 0.9, s"re-ranked outlier-set recall $outRecall < 0.9")
    assert(outRecall > stage1Recall,
      "re-rank no longer improves on candidate-only - geometry changed?")

    val labels = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val exactNeg = Similarity.hardNegatives(corpus, labels, 5, 0.2)
      .select("anchor_id", "negative_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val lshNeg = Similarity.hardNegativesFrom(corpus, labels, cand, 5, 0.2)
      .select("anchor_id", "negative_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    // two metrics, deliberately: PAIR recall is what contrastive training
    // consumes (which (anchor, negative) pairs made the top-5) — measured
    // 0.84 here; TRIPLE recall additionally demands the GLOBAL rank
    // column match, which any missed higher-sim candidate shifts — 0.64
    // here, reported not asserted (rank-within-candidates is the
    // documented semantics of the pruned source). The LSH ∪ IVF-cell
    // union dial (SCALE.md) measured 0.95/0.87 on the same corpus.
    val exactPairs = exactNeg.map(t => (t._1, t._2))
    val lshPairs = lshNeg.map(t => (t._1, t._2))
    val pairRecall = (exactPairs & lshPairs).size.toDouble / exactPairs.size
    val tripleRecall = (exactNeg & lshNeg).size.toDouble / exactNeg.size
    assert(pairRecall >= 0.8, s"hard-negative pair recall $pairRecall < 0.8")
    info(f"outlier recall: stage1 $stage1Recall%.3f, re-ranked $outRecall%.3f; " +
      f"hard-negative pair recall $pairRecall%.3f, strict-rank $tripleRecall%.3f")
  }

  // Drift ACTED ON (round-9): the production drift story made concrete —
  // a NEW TOPIC the frozen centroids never saw arrives as the %10==7
  // batch: its direction is Gram-Schmidt-orthogonal to every pre-drift
  // centroid, with a small alternating lean toward centroid 0 vs 1, so
  // the topic STRADDLES two cells (the IVF failure mode: a query probes
  // its half and misses the other half's neighbors) and drags both
  // cells' mean member→centroid cosine down — exactly what driftStats
  // measures. reclusterDrifted re-seeds only the flagged cells; the
  // k-center seed lands inside the topic, the topic coheres into one
  // cell, and recall recovers. Measures recall@5 fresh / drifted /
  // re-clustered (topic queries and all queries) against brute-force
  // truth, and asserts the TOUCHED-SET bound: every vector whose
  // assignment changed was a flagged cell's member.
  test("reclusterDrifted recovers fresh-index recall on a drifted corpus " +
      "while touching only drifted cells' members (measured)") {
    val base = corpus.filter(col("vec_id") % 10 =!= 7).cache()
    val preCents = Similarity.kmeansCentroids(base, 12, 2).cache()

    // ---- build the drifted topic in memory from the frozen centroids
    val cents = preCents.orderBy("vec_id")
      .select("vec").as[Seq[Double]].collect()
      .map { v => val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n).toArray }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // u1, u2: a deterministic 2-D subspace orthogonalized against ALL
    // centroids (two Gram-Schmidt passes) — a topic plane the index has
    // never seen
    def orthogonalize(seed: Int, against: Seq[Array[Double]]): Array[Double] = {
      var u = Array.tabulate(64)(j => ((j * seed % 13) - 6) / 6.0)
      // the centroid set is NOT mutually orthogonal, so sequential
      // projection-subtraction is Gauss-Seidel — iterate to convergence
      for (_ <- 1 to 25; c <- against) {
        val p = dot(u, c) / dot(c, c)
        u = u.zip(c).map { case (x, cj) => x - p * cj }
      }
      val un = math.sqrt(u.map(x => x * x).sum); u.map(_ / un)
    }
    val u1 = orthogonalize(37, cents.toSeq)
    val u2 = orthogonalize(23, cents.toSeq :+ u1)
    val topicIds = corpus.filter(col("vec_id") % 10 === 7)
      .select("vec_id").as[Long].collect().sorted
    // the topic is a smooth arc in span(u1, u2): TRUE neighbors are
    // θ-adjacent ids. Each row also carries per-id hash noise in
    // span(c0..c3) — invisible to topic-topic similarity (the arc term
    // dominates) but the ONLY nonzero centroid projection, so it alone
    // decides the cell: the topic SHATTERS across those 4 cells,
    // decorrelated from who its neighbors are — the IVF drift failure
    // mode (probing your own cell misses your θ-neighbors)
    val topicRows = topicIds.zipWithIndex.map { case (id, r) =>
      val theta = r * (math.Pi / 2) / topicIds.length
      // positive weights over centroids 0..1 ONLY: the noise decides
      // WHICH of the two cells (hash-random, decorrelated from θ) and
      // guarantees the argmax stays inside {c0, c1} — every topic row
      // lands in a cell the drift rule will flag
      val mult = Array(2654435761L, 2246822519L)
      val w = Array.tabulate(2)(m =>
        ((id * mult(m)) % 1009) / 1009.0 * 0.008 + 0.002)
      val v = Array.tabulate(64)(j =>
        math.cos(theta) * u1(j) + math.sin(theta) * u2(j) +
          (0 until 2).map(m => w(m) * cents(m)(j)).sum)
      (id, v.toSeq, math.sqrt(v.map(x => x * x).sum))
    }.toSeq
    val topic = topicRows.toDF("vec_id", "vec", "nrm")
    val drifted = base.unionByName(topic).cache()

    val freshCents = Similarity.kmeansCentroids(drifted, 12, 2).cache()
    val driftedIdx = Similarity.buildIvfIndex(drifted, preCents)
    val freshIdx = Similarity.buildIvfIndex(drifted, freshCents)

    val queries = drifted.filter(col("vec_id") < 200).cache()
    val truth = Similarity.bruteForceTopK(queries, drifted, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val topicSet = topicIds.toSet
    def recalls(idx: Similarity.IvfIndex): (Double, Double) = {
      val got = Similarity.ivfTopKFromIndex(idx, queries, 5, 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val tTruth = truth.view.filterKeys(topicSet).toMap
      (recallAt5(got, truth), recallAt5(got, tTruth))
    }

    val t = Similarity.driftStats(driftedIdx)
      .agg(sum(col("sum_sim_e6")), sum(col("n_members"))).head
    val thrPpm = t.getLong(0) / t.getLong(1)
    val flagged = Similarity.driftedCells(driftedIdx, thrPpm)
      .as[Long].collect().toSet
    assert(flagged.nonEmpty, "no cell drifted - corpus recipe broken")
    val re = Similarity.reclusterDrifted(driftedIdx, thrPpm, 10)

    val (fAll, fTopic) = recalls(freshIdx)
    val (dAll, dTopic) = recalls(driftedIdx)
    val (pAll, pTopic) = recalls(re)
    info(f"recall@5 all: fresh $fAll%.3f drifted $dAll%.3f post $pAll%.3f; " +
      f"topic: fresh $fTopic%.3f drifted $dTopic%.3f post $pTopic%.3f " +
      s"(${flagged.size} flagged cells)")
    val topicCellsPost = re.assignments
      .filter(col("vec_id").isInCollection(topicSet))
      .select("centroid_id").as[Long].collect().groupBy(identity)
      .view.mapValues(_.length).toMap
    val seedIds = re.centroids.select("vec_id").as[Long].collect().toSet
    info(s"topic cells post: $topicCellsPost; topic seeds: " +
      s"${(seedIds & topicSet).toSeq.sorted}")
    assert(dTopic < fTopic - 0.2,
      s"drift did not hurt topic recall ($dTopic vs $fTopic)")
    assert(pTopic >= fTopic - 0.1 && pTopic >= 0.9,
      s"re-clustered topic recall $pTopic did not recover to fresh $fTopic")
    assert(pTopic >= dTopic + 0.3,
      s"re-clustering barely improved topic recall ($dTopic -> $pTopic)")
    assert(pAll >= dAll - 0.02,
      s"overall recall regressed after re-cluster ($pAll vs $dAll)")

    // touched-set bound: assignment changes confined to flagged members
    val before = driftedIdx.assignments.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    val after = re.assignments.select("vec_id", "centroid_id")
      .as[(Long, Long)].collect().toMap
    val flaggedMembers = driftedIdx.assignments
      .filter(col("centroid_id").isInCollection(flagged))
      .select("vec_id").as[Long].collect().toSet
    val changed = before.keySet.filter(id => before(id) != after(id))
    assert(after.keySet == before.keySet, "re-cluster lost or grew rows")
    assert(changed.subsetOf(flaggedMembers),
      s"${(changed -- flaggedMembers).size} non-drifted vectors moved")
  }

  // Identity check for the guard's "exact GIVEN the shortlist" claim:
  // feed densityClustersGuarded the COMPLETE candidate set (every pair)
  // and it must reproduce the exact build verbatim — members, labels,
  // and roles. Any divergence would mean the guard machinery itself
  // (shortlist, exact confirm, core edges, border attach) warps the
  // semantics rather than only inheriting candidate misses.
  test("densityClustersGuarded over ALL pairs == densityClusters exactly") {
    val sub = corpus.filter(col("vec_id") < 250).cache()
    val allPairs = sub.select(col("vec_id").as("id_a"))
      .crossJoin(sub.select(col("vec_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val exact = Similarity.densityClusters(sub, 0.35, 3)
      .as[(Long, Long, String)].collect().toSet
    val guarded = Similarity
      .densityClustersGuarded(sub, allPairs, 0.35, 3, confirmSlack = 1)
      .as[(Long, Long, String)].collect().toSet
    assert(guarded == exact,
      s"diff g-e=${guarded -- exact} e-g=${exact -- guarded}")
  }

  // The round-8 verdict's one open 100 TB claim, executed: DBSCAN over
  // q145's multi-probe candidates. Measures (1) the GUARDED swap's
  // cluster recovery vs the exact q181 build — pair-recall AND
  // pair-precision over same-cluster pairs, plus exact member/role
  // agreement — and (2) the failure mode of the UNGUARDED swap the
  // guard exists for: how many true cores the candidate-only degrees
  // demote, and what that does to the clustering. q215's lesson made
  // quantitative for density clustering.
  test("executed DBSCAN swap: guarded LSH clustering recovers the exact " +
      "q181 build (measured); unguarded core demotion measured alongside") {
    val eps = 0.35
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), 128, 8, 64)).cache()
    val cand = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", 8)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b")).cache()

    val exact = Similarity.densityClusters(corpus, eps, 3)
      .select("vec_id", "cluster_id", "role")
      .as[(Long, Long, String)].collect()
    val guarded = Similarity.densityClustersGuarded(corpus, cand, eps, 3, 1)
      .select("vec_id", "cluster_id", "role")
      .as[(Long, Long, String)].collect()

    def samePairs(rows: Array[(Long, Long, String)]): Set[(Long, Long)] =
      rows.groupBy(_._2).values.flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val ep = samePairs(exact)
    val gp = samePairs(guarded)
    assert(ep.nonEmpty, "exact build found no clusters - corpus changed?")
    val pairRecall = (ep & gp).size.toDouble / ep.size
    val pairPrecision = if (gp.isEmpty) 0.0 else (ep & gp).size.toDouble / gp.size

    // the unguarded swap, inline (verified candidate pairs AS the
    // ε-graph): degrees under-count, so true cores demote
    val v = corpus
    val vp = cand
      .join(v.select(col("vec_id").as("id_a"), col("vec").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(v.select(col("vec_id").as("id_b"), col("vec").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .filter(round(Similarity.cosineWithNorms(col("va"), col("vb"),
        col("na"), col("nb")), 6) >= eps)
      .select(col("id_a"), col("id_b")).cache()
    val candDeg = vp.select(col("id_a")).unionByName(
        vp.select(col("id_b").as("id_a")))
      .groupBy(col("id_a")).agg(count(lit(1)).as("cd"))
      .as[(Long, Long)].collect().toMap
    val trueCores = exact.filter(_._3 == "core").map(_._1).toSet
    val demoted = trueCores.count(id => candDeg.getOrElse(id, 0L) + 1 < 3)

    info(f"guarded swap: pair-recall $pairRecall%.3f, pair-precision " +
      f"$pairPrecision%.3f (${ep.size} exact same-cluster pairs); " +
      s"members exact=${exact.length} guarded=${guarded.length}; " +
      s"unguarded candidate-only degrees demote $demoted/${trueCores.size} " +
      "true cores")
    assert(pairRecall >= 0.95, s"guarded cluster pair-recall $pairRecall")
    assert(pairPrecision >= 0.95, s"guarded cluster pair-precision $pairPrecision")
    // membership recovery: every exactly-clustered point is clustered by
    // the guarded swap with the same role
    val exactMap = exact.map(r => r._1 -> r._3).toMap
    val guardMap = guarded.map(r => r._1 -> r._3).toMap
    val missing = exactMap.keySet -- guardMap.keySet
    assert(missing.size <= math.max(1, exactMap.size / 20),
      s"guarded swap dropped ${missing.size}/${exactMap.size} clustered points")
  }

  // The guard's PAYOFF REGIME, executed (round-9 verdict #3b): at a
  // high-similarity operating point the candidate degrees prune the
  // confirm shortlist to ~the duplicate mass, so the cell-confined exact
  // confirm is marginal — measured as the shortlist fraction at q261's
  // ε = 0.42 (this corpus's top-0.05%-of-pairs regime) against the
  // ε = 0.35 point where the round-9 verdict correctly observed the
  // shortlist approaches the corpus. Recovery vs the exact build is
  // asserted EXACT at the high-τ point.
  test("high-similarity operating point: shortlist prune rate measured, " +
      "guarded == exact build at eps 0.42") {
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), 128, 8, 64)).cache()
    val cand = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", 8)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b")).cache()
    val n = corpus.count()
    def shortlistFrac(eps: Double): Double = {
      val vp = cand
        .join(corpus.select(col("vec_id").as("id_a"), col("vec").as("va"),
          col("nrm").as("na")), Seq("id_a"))
        .join(corpus.select(col("vec_id").as("id_b"), col("vec").as("vb"),
          col("nrm").as("nb")), Seq("id_b"))
        .filter(round(Similarity.cosineWithNorms(col("va"), col("vb"),
          col("na"), col("nb")), 6) >= eps)
        .select(col("id_a"), col("id_b"))
      val deg = vp.select(col("id_a")).unionByName(
          vp.select(col("id_b").as("id_a")))
        .groupBy(col("id_a")).agg(count(lit(1)).as("cd"))
      // the q250/q261 shortlist rule: candidate degree + 1 >= minPts - slack
      deg.filter(col("cd") + 1 >= 3 - 1).count().toDouble / n
    }
    val fracLow = shortlistFrac(0.35)
    val fracHigh = shortlistFrac(0.42)
    info(f"confirm shortlist fraction: eps=0.35 -> $fracLow%.3f of corpus, " +
      f"eps=0.42 -> $fracHigh%.3f of corpus")
    // measured on this corpus: 0.642 -> 0.116 (a 5.5x collapse); the
    // asserts pin the ORDER of magnitude so a corpus/band change that
    // destroys the prune fails loudly (exact numbers in SCALE.md)
    assert(fracHigh <= 0.2,
      f"high-tau shortlist did not collapse: $fracHigh%.3f of the corpus")
    assert(fracLow > 4 * fracHigh,
      "the two operating points should differ by >4x prune rate")
    // recovery at the high-τ point: the guarded swap must equal the
    // exact build outright (small, tight families — no room for misses)
    val exact = Similarity.densityClusters(corpus, 0.42, 3)
      .select("vec_id", "cluster_id", "role")
      .as[(Long, Long, String)].collect().toSet
    val guarded = Similarity
      .densityClustersGuarded(corpus, cand, 0.42, 3, 1)
      .select("vec_id", "cluster_id", "role")
      .as[(Long, Long, String)].collect().toSet
    assert(exact.nonEmpty, "exact build found no clusters at 0.42")
    assert(guarded == exact,
      s"high-tau guarded != exact: ${guarded.diff(exact)} / ${exact.diff(guarded)}")
  }

  // Probe semantics pinned on hand-built signatures: Hamming <= 1 within
  // some band collides, Hamming >= 2 in every band does not.
  test("multiProbeCandidatePairs: exactly Hamming <= 1 per band") {
    val rows = Seq(
      (1L, Seq(java.lang.Long.valueOf(0x01L))), // 0b0001
      (2L, Seq(java.lang.Long.valueOf(0x03L))), // 0b0011: H1 from 1
      (3L, Seq(java.lang.Long.valueOf(0x07L))), // 0b0111: H2 from 1, H1 from 2
      (4L, Seq(java.lang.Long.valueOf(0x0cL)))) // 0b1100: H2+ from all above
      .toDF("id", "bands")
    val got = Dedup.multiProbeCandidatePairs(rows, "id", "bands", 8)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 3L)), s"got $got")
  }

  // int8 quantization: codes stay in [-127,127], the quantized score
  // tracks the true cosine closely, and quantized top-10 recall vs the
  // exact float path stays high — the 4x-memory-reduction trade, measured.
  test("quantizedTopK: bounded codes, small score error, high recall@10") {
    val c = corpus
    val qz = Similarity.quantized(c)
    val bounds = qz.select(array_max(transform(col("qvec"), abs(_))).as("m"))
      .agg(max(col("m"))).as[Double].head()
    assert(bounds <= 127.0, s"quantized code out of range: $bounds")

    val queries = c.filter(col("vec_id") < 5)
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topkMap(Similarity.bruteForceTopK(queries, c, 10))
    val quant = topkMap(Similarity.quantizedTopK(queries, c, 10))
    val recall = exact.map { case (q, t) =>
      (t & quant.getOrElse(q, Set.empty)).size / 10.0 }.sum / exact.size
    assert(recall >= 0.8, s"quantized recall@10 $recall < 0.8")

    // score error vs the true cosine on a bounded pair sample
    val qq = Similarity.quantized(c.filter(col("vec_id") < 40))
    val pairs = qq.select(col("vec_id").as("ida"), col("vec").as("va"),
        col("nrm").as("na"), col("qvec").as("qa"), col("qscale").as("sa"))
      .crossJoin(qq.select(col("vec_id").as("idb"), col("vec").as("vb"),
        col("nrm").as("nb"), col("qvec").as("qb"), col("qscale").as("sb")))
      .filter(col("ida") < col("idb"))
      .select(abs(
        Similarity.cosineWithNorms(col("va"), col("vb"), col("na"), col("nb")) -
        Similarity.dot(col("qa"), col("qb")) * col("sa") * col("sb")).as("err"))
      .agg(max(col("err"))).as[Double].head()
    assert(pairs < 0.05, s"max quantization score error $pairs >= 0.05")
  }

  // Engine-portability invariant the q60 oracle relies on: the plane
  // constants must be the md5 recipe exactly (DuckDB recomputes them).
  test("rh planes are deterministic md5-derived constants in [-1, 1]") {
    val p0 = Similarity.rhPlane(0, 64)
    assert(p0.toSeq == Similarity.rhPlane(0, 64).toSeq)
    assert(Similarity.rhPlane(1, 64).toSeq != p0.toSeq)
    assert(p0.forall(v => v >= -1.0 && v <= 1.0))
    // md5('rh:0:0') = dd3d1fbf... -> 0xdd3d1fbf % 2001 spot-check
    assert(p0(0) == ((java.lang.Long.parseLong("dd3d1fbf", 16) % 2001) - 1000) / 1000.0)
  }

  test("assembleDense: sparse triples -> zero-filled vectors; empty ids drop") {
    val sparse = Seq((1L, 0L, 2L), (1L, 3L, -1L), (2L, 2L, 5L))
      .toDF("id", "idx", "v")
    val out = Similarity.assembleDense(sparse, "id", "idx", "v", 4)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out == Map(
      1L -> Seq(2.0, 0.0, 0.0, -1.0),
      2L -> Seq(0.0, 0.0, 5.0, 0.0)), s"got $out")
  }

  // SemDeDup on a hand-built 2-cell corpus: within-cell near-dups drop
  // (smaller id survives), cell boundaries shield cross-cell neighbors,
  // and the rule is pairwise — every vector near a smaller-id cellmate
  // drops, even if that cellmate itself dropped.
  test("semDedupKeep: min-id survives per cell, pairwise rule") {
    val raw = Seq(
      (0L, Array(1.0f, 0.0f)),     // cell 0 anchor
      (1L, Array(0.9f, 0.1f)),     // ~0.994 to id 0 -> dropped
      (2L, Array(1.0f, 0.05f)),    // ~0.999 to id 0 -> dropped (pairwise)
      (10L, Array(0.0f, 1.0f)),    // cell 1 anchor
      (11L, Array(0.05f, 1.0f)),   // ~0.999 to id 10 -> dropped
      (12L, Array(-1.0f, 0.2f)))   // cell 1 (0.2 > -1.0), far from all -> kept
      .toDF("vec_id", "embedding")
    val c = Similarity.prepared(raw, "embedding")
      .select(col("vec_id"), col("vec"), col("nrm"))
    val cents = c.filter(col("vec_id") === 0L || col("vec_id") === 10L)
    val kept = Similarity.semDedupKeep(c, cents, 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 10L, 12L), s"kept $kept")
  }

  // The incremental-index contract, end to end through disk: build on the
  // historical corpus, save, load, fold in a new batch — the
  // delta-maintained assignments must be row-identical to a full rebuild
  // over old ∪ new (same frozen centroids), and a search served from the
  // loaded+delta'd index must equal one served from the rebuilt index.
  test("ivf index: save -> load -> applyIndexDelta == full rebuild") {
    val c = corpus
    val old = c.filter(col("vec_id") % 10 =!= 7)
    val fresh = c.filter(col("vec_id") % 10 === 7)
    val cents = old.filter(col("vec_id") % 40 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec")
      .toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(old, cents), dir)
    val updated = Similarity.applyIndexDelta(
      Similarity.loadIvfIndex(spark, dir), fresh)
    val rebuilt = Similarity.buildIvfIndex(c, cents)

    def assignSet(ix: Similarity.IvfIndex) =
      ix.assignments.select("vec_id", "centroid_id")
        .as[(Long, Long)].collect().toSet
    assert(assignSet(updated) == assignSet(rebuilt))

    def searchRows(ix: Similarity.IvfIndex) =
      Similarity.ivfTopKFromIndex(ix, c.filter(col("vec_id") < 8), 4, 2)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(searchRows(updated) == searchRows(rebuilt))
    // the delta batch actually landed (the test isn't vacuous)
    assert(updated.assignments.count() == c.count())
    assert(fresh.count() > 0)
  }

  // The inverted-list layout must prune at the scan: probing 2 cells of a
  // saved index plans a PartitionFilters entry on centroid_id and reads
  // strictly fewer files than the full index scan (numFiles metric after
  // execution — the physical proof, not just the plan text).
  test("ivf index on disk: partition pruning on probed cells") {
    val c = corpus
    val cents = c.filter(col("vec_id") % 40 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_prune")
      .toString
    Similarity.saveIvfIndex(Similarity.buildIvfIndex(c, cents), dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    val probed = loaded.assignments
      .filter(col("centroid_id").isin(0L, 40L))
    val planStr = probed.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [") &&
      planStr.contains("centroid_id"),
      s"probe filter did not reach the partition level:\n$planStr")

    // collect() executes the df's OWN plan instance, so the scan metrics
    // are readable afterwards (a .write would execute a separate
    // QueryExecution and leave these at 0)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    }
    val probedFiles = filesRead(probed)
    val allFiles = filesRead(loaded.assignments)
    assert(probedFiles > 0 && probedFiles < allFiles,
      s"probed scan read $probedFiles files vs full $allFiles - no pruning")
  }

  // Drift detection on a hand-built 2D corpus (random high-dim vectors are
  // near-orthogonal to everything, so drift needs constructed geometry):
  // members start near their centroids (mean_sim ~0.995); the drifted
  // batch sits diagonally opposite BOTH centroids, so its best-centroid
  // cosine is ~-0.7 and the index-wide mean collapses below the bar.
  test("driftStats / driftTriggersRebuild: drifted corpus trips, fresh does not") {
    def prep(rows: Seq[(Long, Array[Float])]) =
      Similarity.prepared(rows.toDF("vec_id", "embedding"), "embedding")
        .select(col("vec_id"), col("vec"), col("nrm"))
    val base = prep(Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.1f)),
      (2L, Array(1.0f, -0.1f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 0.95f))))
    val cents = base.filter(col("vec_id").isin(0L, 10L))
    val index = Similarity.buildIvfIndex(base, cents)
    val stats = Similarity.driftStats(index)
      .select("centroid_id", "n_members", "mean_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, m) => k -> ((n, m)) }.toMap
    assert(stats.keySet == Set(0L, 10L) &&
      stats.values.forall(_._2 > 0.97), s"fresh stats off: $stats")
    // fresh index: healthy mean, no rebuild at a 0.8 bar
    assert(!Similarity.driftTriggersRebuild(index, 0.8))
    // drifted batch: anti-aligned with both centroids
    val drifted = prep(Seq(
      (100L, Array(-0.7f, -0.7f)), (101L, Array(-0.6f, -0.75f)),
      (102L, Array(-0.75f, -0.6f)), (103L, Array(-0.7f, -0.72f)),
      (104L, Array(-0.72f, -0.7f))))
    val after = Similarity.applyIndexDelta(index, drifted)
    assert(Similarity.driftTriggersRebuild(after, 0.8))

    // the full lifecycle: the trip triggers a k-means rebuild over the
    // CURRENT population (old ∪ drifted), and the rebuilt index is
    // healthy again at the same bar — centroids follow the corpus
    val population = base.unionByName(drifted)
    val rebuilt = Similarity.buildIvfIndex(population,
      Similarity.kmeansCentroids(population, 3, 3))
    assert(!Similarity.driftTriggersRebuild(rebuilt, 0.8),
      "k-means rebuild did not restore index health")
    assert(rebuilt.assignments.count() == population.count())
  }

  test("kcenterSeeds: one seed per directional cluster, partitioning-" +
      "invariant; corpus smaller than k returns everything") {
    import spark.implicits._
    // three tight direction bundles; farthest-point must pick one from
    // each before ever doubling up inside a bundle
    val vs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.99, 0.01, 0.0)),
      (10L, Seq(0.0, 1.0, 0.0)), (11L, Seq(0.0, 0.99, 0.01)),
      (20L, Seq(0.0, 0.0, 1.0)), (21L, Seq(0.01, 0.0, 0.99)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), col("v").as("vec"),
        sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)).as("nrm"))
    for (parts <- Seq(1, 5)) {
      val seeds = graft.operators.Similarity
        .kcenterSeeds(vs.repartition(parts), 3)
        .select("rank", "vec_id").as[(Long, Long)].collect().toMap
      assert(seeds(1L) == 1L, s"seed 1 must be min id, got $seeds")
      val bundles = seeds.values.map(id => id / 10).toSet
      assert(bundles == Set(0L, 1L, 2L),
        s"seeds must cover all three bundles, got $seeds")
    }
    val tiny = graft.operators.Similarity.kcenterSeeds(vs.limit(2), 5)
    assert(tiny.count() == 2, "corpus < k must return the whole corpus")
  }

  test("mmrSelect: near-duplicate of the top pick is demoted below a " +
      "diverse candidate; lambda=0 is pure relevance; bound throws") {
    import spark.implicits._
    // id 1: most relevant. id 2: near-copy of 1 (sim ~1). id 3: orthogonal,
    // slightly less relevant than 2. MMR(λ=0.5) must pick 1 then 3.
    val cand = Seq(
      (1L, 0.90, Seq(1.0, 0.0)),
      (2L, 0.89, Seq(1.0, 0.001)),
      (3L, 0.80, Seq(0.0, 1.0)))
      .toDF("id", "rel", "v")
      .select(col("id"), col("rel"), col("v").as("vec"),
        sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)).as("nrm"))
    val picked = Similarity.mmrSelect(cand, k = 2, lambda = 0.5)
      .select("rank", "id").as[(Long, Long)].collect().toSeq.sorted
    assert(picked == Seq((1L, 1L), (2L, 3L)), s"got $picked")
    val pure = Similarity.mmrSelect(cand, k = 3, lambda = 0.0)
      .select("rank", "id").as[(Long, Long)].collect().toSeq.sorted
    assert(pure == Seq((1L, 1L), (2L, 2L), (3L, 3L)), s"got $pure")
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(cand, k = 1, lambda = 0.5, maxCandidates = 2)
    }
  }

  test("knnOutliers: the isolated vector ranks first; scores ascend; " +
      "m truncates; partitioning-invariant") {
    import spark.implicits._
    // five near-collinear vectors + one orthogonal outlier (id 99)
    val rows = Seq(
      (1L, Seq(1.0, 0.00)), (2L, Seq(1.0, 0.01)), (3L, Seq(1.0, 0.02)),
      (4L, Seq(1.0, 0.03)), (5L, Seq(1.0, 0.04)), (99L, Seq(0.0, 1.0)))
    val corpus = rows.toDF("vec_id", "vec")
      .withColumn("nrm", sqrt(aggregate(col("vec"), lit(0.0),
        (a, x) => a + x * x)))
    val out = Similarity.knnOutliers(corpus, k = 2, m = 3)
      .select("vec_id", "kth_sim").as[(Long, Double)].collect()
    assert(out.length == 3)
    assert(out.head._1 == 99L,
      s"the orthogonal vector must be most isolated, got ${out.toSeq}")
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted,
      "kth_sim must come back ascending")
    val again = Similarity.knnOutliers(corpus.repartition(5), k = 2, m = 3)
      .select("vec_id", "kth_sim").as[(Long, Double)].collect()
    assert(again.toSeq == out.toSeq, "selection must not depend on partitioning")
  }

  test("prototypeMargin: boundary vectors rank as most ambiguous, " +
      "margins agree with prototype geometry, k truncates") {
    import spark.implicits._
    // class 0 hugs the x axis, class 1 the y axis; vec 5 sits on the
    // diagonal — minimal margin by construction; vec 2 = (1, -0.1)
    // points furthest from the y prototype — maximal margin (note the
    // class-0 prototype tilts up toward its diagonal member, so the pure
    // x-axis vec 6 is NOT the extreme)
    val rows = Seq(
      (1L, Seq(1.0f, 0.1f), 0), (2L, Seq(1.0f, -0.1f), 0),
      (3L, Seq(0.1f, 1.0f), 1), (4L, Seq(-0.1f, 1.0f), 1),
      (5L, Seq(1.0f, 1.0f), 0), (6L, Seq(1.0f, 0.0f), 0))
    val corpus = rows.toDF("vec_id", "v", "label")
      .select(col("vec_id"),
        transform(col("v"), _.cast("double")).as("vec"))
      .withColumn("nrm", sqrt(aggregate(col("vec"), lit(0.0),
        (a, x) => a + x * x)))
    val labels = rows.map(r => (r._1, r._3)).toDF("vec_id", "label")
    val out = Similarity.prototypeMargin(corpus, labels, dim = 2, k = 6)
      .select("vec_id", "margin").as[(Long, Double)].collect()
    assert(out.length == 6)
    assert(out.head._1 == 5L,
      s"the diagonal vector must be the most ambiguous, got ${out.toSeq}")
    assert(out.last._1 == 2L,
      s"(1,-0.1) must be the least ambiguous, got ${out.toSeq}")
    assert(out.forall(_._2 >= 0.0), "margin = top1 - top2 is nonnegative")
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted,
      "rows must come back margin-ascending")
    val top2 = Similarity.prototypeMargin(corpus, labels, dim = 2, k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(top2 == out.take(2).map(_._1).toSet, "k must take the prefix")
  }

  test("randomProjectInt: basis vectors read out the sign matrix; linearity holds") {
    import spark.implicits._
    val dim = 8; val out = 4
    // e_i scaled by 1.0 => uq = 1e6 at slot i => y_j = sign(i,j) * 1e6
    val basis = (0 until dim).map(i =>
      (i.toLong, Array.tabulate(dim)(k => if (k == i) 1.0f else 0.0f)))
    val proj = Similarity.randomProjectInt(basis.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim, out)
      .as[(Long, Long, Long)].collect()
      .map { case (id, j, y) => (id, j) -> y }.toMap
    for (i <- 0 until dim; j <- 0 until out) {
      assert(proj((i.toLong, j.toLong)) ==
        Similarity.jlSign(i, j) * 1000000L, s"($i,$j)")
      assert(math.abs(proj((i.toLong, j.toLong))) == 1000000L)
    }
    // linearity: y(a + b) == y(a) + y(b) for quantization-exact inputs
    val a = Array.tabulate(dim)(k => k.toFloat)        // integral floats
    val b = Array.tabulate(dim)(k => (2 * k).toFloat)
    val ab = Array.tabulate(dim)(k => (3 * k).toFloat)
    val three = Seq((1L, a), (2L, b), (3L, ab)).toDF("vec_id", "embedding")
    val p = Similarity.randomProjectInt(three, "vec_id", "embedding", dim, out)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(p(3L) == p(1L).zip(p(2L)).map { case (x, y) => x + y })
  }

  test("jacobiEigen recovers a known spectrum; pcaProject satisfies the spectral invariants") {
    import spark.implicits._
    // known 2x2: [[2,1],[1,2]] has eigenvalues 3 and 1
    val (ev, _) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(ev.sorted.reverse.zip(Seq(3.0, 1.0))
      .forall { case (g, w) => math.abs(g - w) < 1e-9 })

    // anisotropic synthetic cloud: x ~ (t, 0.1*t, noise), top axis ~ (1, 0.1, 0)/|.|
    val rnd = new scala.util.Random(5)
    val dim = 6
    val rows = (1 to 400).map { i =>
      val t = rnd.nextGaussian() * 10
      val arr = Array.tabulate(dim)(k =>
        (if (k == 0) t else if (k == 1) 0.1 * t
         else rnd.nextGaussian() * 0.5).toFloat)
      (i.toLong, arr)
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", dim, k = 3)
      .as[(Long, Long, Double)].collect()
    val byPc = proj.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val vars = (0 until 3).map(c => variance(byPc(c.toLong)))
    // component variances are sorted and the first dominates (signal axis)
    assert(vars(0) > vars(1) && vars(1) >= vars(2) - 1e-9)
    assert(vars(0) > 50.0, s"signal variance ${vars(0)}")
    assert(vars(1) < 1.0 && vars(2) < 1.0, "noise axes stay small")
    // components are uncorrelated (covariance ~ 0 between pc0 and pc1)
    val p0 = proj.filter(_._2 == 0L).sortBy(_._1).map(_._3)
    val p1 = proj.filter(_._2 == 1L).sortBy(_._1).map(_._3)
    val m0 = p0.sum / p0.length; val m1 = p1.sum / p1.length
    val covPc = p0.zip(p1).map { case (x, y) => (x - m0) * (y - m1) }
      .sum / (p0.length - 1)
    assert(math.abs(covPc) < 0.05 * math.sqrt(vars(0) * vars(1)) + 1e-6,
      s"pc0/pc1 covariance $covPc")
  }

  // The q305 audit's ACTION (round 12): mutual proximity must (a) demote
  // a PLANTED hub — a vector riding the global mean direction, the
  // classic high-dimensional hub geometry — out of the lists it
  // pollutes, (b) strictly improve the q92-style label-agreement readout
  // on exactly the hub-heavy slice (anchors whose raw top-k contains the
  // hub), and (c) on the REAL corpus, flatten the in-degree distribution
  // (skewness and max in-degree do not increase — measured, not
  // claimed; the audit-to-action loop the IVF/PQ drift family already
  // follows).
  test("mutualProximityKnn demotes a planted hub; agreement improves") {
    val rnd = new scala.util.Random(42)
    val dims = 16
    def pt(center: Array[Double], noise: Double): Seq[Double] =
      center.map(x => x + noise * rnd.nextGaussian()).toSeq
    val c1 = Array.tabulate(dims)(i => if (i < 8) 1.0 else 0.0)
    val c2 = Array.tabulate(dims)(i => if (i >= 8) 1.0 else 0.0)
    val rows =
      (0 until 30).map(i => (i.toLong, pt(c1, 1.2), "A")) ++
        (30 until 60).map(i => (i.toLong, pt(c2, 1.2), "B")) ++
        // the hub: the (normalized) global mean direction — cosine ~0.7
        // to EVERY point of both clusters, so it outranks the noisy
        // within-cluster tail in many raw top-3 lists
        Seq((99L, c1.zip(c2).map { case (a, b) => a + b }.toSeq, "C"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val c = Similarity.prepared(df, "embedding")
      .select(col("vec_id"), col("vec"), col("nrm"))
    val labels = rows.map(r => r._1 -> r._3).toMap

    val raw = Similarity.bruteForceTopK(c, c, 3)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    val mp = Similarity.mutualProximityKnn(c, 3)
      .select(col("vec_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    def inDeg(pairs: Array[(Long, Long)], id: Long): Int =
      pairs.count(_._2 == id)
    val rawHub = inDeg(raw, 99L)
    val mpHub = inDeg(mp, 99L)
    assert(rawHub >= 5, s"plant failed: raw hub in-degree $rawHub")
    assert(mpHub < rawHub,
      s"hub not demoted: raw $rawHub -> mp $mpHub")
    // hub-heavy slice: anchors whose RAW top-3 contains the hub
    val polluted = raw.filter(_._2 == 99L).map(_._1).toSet
    def agreement(pairs: Array[(Long, Long)]): Double = {
      val slice = pairs.filter(p => polluted.contains(p._1))
      slice.count(p => labels(p._1) == labels(p._2)).toDouble / slice.length
    }
    val (aRaw, aMp) = (agreement(raw), agreement(mp))
    assert(aMp > aRaw,
      s"agreement on the hub-heavy slice: raw $aRaw -> mp $aMp")

    // real corpus: the correction flattens the in-degree distribution
    def skew(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
      xs.map(x => math.pow((x - m) / sd, 3)).sum / xs.length
    }
    val realRaw = Similarity.knnHubness(corpus, 5)
      .as[(Long, Long)].collect().map(_._2.toDouble)
    val mpDeg = Similarity.mutualProximityKnn(corpus, 5)
      .groupBy(col("neighbor_id")).agg(count(lit(1)).as("d"))
      .as[(Long, Long)].collect().toMap
    val realMp = corpus.select(col("vec_id")).as[Long].collect()
      .map(id => mpDeg.getOrElse(id, 0L).toDouble)
    assert(realMp.max <= realRaw.max,
      s"max in-degree grew: raw ${realRaw.max} -> mp ${realMp.max}")
    assert(skew(realMp) <= skew(realRaw),
      s"skewness grew: raw ${skew(realRaw)} -> mp ${skew(realMp)}")
  }

  // The executed candidate swap for MP (q313, the q215/q216 discipline).
  // The naive swap FAILED measurably: with raw count products over
  // variable-length candidate lists, heavy LSH colliders' reverse
  // counts have more headroom, so pruned MP re-created hubs from
  // collision degree (in-degree skew 0.37 → 1.08, exact-MP overlap
  // 0.49 — the measured reason mutualProximityKnnFrom normalizes).
  // With the ppm list-size normalization the same swap measures
  // overlap 0.82 with exact-grid MP and skew 0.37 → 0.05 — asserted:
  // (1) MP must flatten the in-degree distribution vs raw-sim ranking
  // of the SAME candidates (the property the hub fix exists for,
  // candidate source held fixed), (2) overlap with exact MP stays
  // high (it is a re-ranking of the candidate lists, so equality is
  // not expected).
  test("mutualProximityKnnFrom over LSH candidates: re-ranks and flattens hubs") {
    val c = corpus.withColumn("bands",
      Similarity.rhBands(col("vec"), 128, 8, 64)).cache()
    val cand = Dedup.multiProbeCandidatePairs(c, "vec_id", "bands", 8)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b")).cache()
    val cv = corpus.select(col("vec_id"), col("vec"), col("nrm"))
    def lists(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("vec_id"), col("neighbor_id")).as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = lists(Similarity.mutualProximityKnn(corpus, 5))
    val mpLsh = lists(Similarity.mutualProximityKnnFrom(cv, cand, 5))
    val overlap = exact.map { case (q, t) =>
      (t & mpLsh.getOrElse(q, Set.empty)).size.toDouble / t.size
    }.sum / exact.size
    info(f"MP-from-LSH top-5 overlap with exact-grid MP: $overlap%.3f " +
      "(re-ranking, not approximation — see comment)")
    // raw-sim top-5 over the SAME candidates
    val scored = Similarity.scoredPairs(cv, cand)
    val directed = scored
      .select(col("id_a").as("vec_id"), col("id_b").as("nbr"), col("sim"))
      .unionByName(scored
        .select(col("id_b").as("vec_id"), col("id_a").as("nbr"), col("sim")))
    val rawLsh = graft.operators.Relational.topKPerGroup(directed,
        Seq(col("vec_id")), Seq(col("sim").desc, col("nbr").asc), 5, "rn")
      .select(col("vec_id"), col("nbr").as("neighbor_id"))
    def degs(lists: Map[Long, Set[Long]]): Array[Double] = {
      val d = lists.toSeq.flatMap(_._2).groupBy(identity)
        .view.mapValues(_.size.toDouble).toMap
      corpus.select(col("vec_id")).as[Long].collect()
        .map(id => d.getOrElse(id, 0.0))
    }
    def skew(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
      xs.map(x => math.pow((x - m) / sd, 3)).sum / xs.length
    }
    val rawDegs = degs(lists(rawLsh))
    val mpDegs = degs(mpLsh)
    info(f"in-degree skew on LSH candidates: raw ${skew(rawDegs)}%.3f " +
      f"-> mp ${skew(mpDegs)}%.3f; max ${rawDegs.max}%.0f -> ${mpDegs.max}%.0f")
    assert(skew(mpDegs) <= skew(rawDegs),
      s"MP did not flatten skew on the candidate source: " +
        s"${skew(rawDegs)} -> ${skew(mpDegs)}")
    assert(overlap >= 0.7, s"MP-from-LSH diverged from exact MP: $overlap")
  }
}
