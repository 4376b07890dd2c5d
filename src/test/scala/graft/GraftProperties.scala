package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.model.{Priority, Status}
import graft.operators.{AsofJoin, Dedup, IngestOps, Similarity, TextAnalysis}

/** ScalaCheck properties for the algebraic operators (SURVEY.md §5):
  * chunking is a partition of the input, the rollup lattice matches its
  * reference definition, dequeue returns the sort-key minimum, jaccard is
  * a bounded symmetric similarity.
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def sq = { val s = spark; import s.implicits._; s }

  property("chunkArray partitions ids into full batches + short tail") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 1000000007L)),
      Gen.choose(1, 7)) { (ids, bs) =>
      val s = spark
      import s.implicits._
      val batches = Seq(Tuple1(ids)).toDF("ids")
        .select(IngestOps.chunkArray(col("ids"), bs).as("b"))
        .as[Seq[Seq[Long]]].head()
      batches.flatten == ids &&
        batches.init.forall(_.size == bs) &&
        batches.last.nonEmpty && batches.last.size <= bs
    }

  property("tokenBudgetSelect keeps exactly the maximal in-budget prefix " +
    "of the (score desc, id asc) ordering, per group") =
    forAll(Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b", "c")
      tok <- Gen.choose(1L, 40L)
      q <- Gen.choose(0, 100)
    } yield (g, tok, q / 100.0)), Gen.choose(0L, 150L)) { (rows, budget) =>
      val s = spark
      import s.implicits._
      val df = rows.zipWithIndex
        .map { case ((g, t, q), i) => (g, i.toLong, t, q) }
        .toDF("source", "doc_id", "n_tokens", "quality")
      val got = graft.operators.Curation
        .tokenBudgetSelect(df, "source", "doc_id", "n_tokens", "quality",
          budget)
        .select("doc_id").as[Long].collect().toSet
      val expect = rows.zipWithIndex
        .map { case ((g, t, q), i) => (g, i.toLong, t, q) }
        .groupBy(_._1).flatMap { case (_, grp) =>
          val ordered = grp.sortBy { case (_, id, _, q) => (-q, id) }
          val cums = ordered.scanLeft(0L)(_ + _._3).tail
          ordered.zip(cums).takeWhile(_._2 <= budget).map(_._1._2)
        }.toSet
      got == expect
    }

  property("slidingDistinct equals the brute-force window count on " +
    "random (key, day) activity") =
    forAll(Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 8L)
      d <- Gen.choose(1L, 25L)
    } yield (k, d)), Gen.choose(1, 9)) { (rows, w) =>
      val s = spark
      import s.implicits._
      val got = graft.operators.EventTime
        .slidingDistinct(rows.toDF("k", "day"), col("k"), col("day"), w)
        .as[(Long, Long)].collect().toMap
      val days = rows.map(_._2).distinct
      val expect = days.map(e =>
        e -> rows.filter(r => r._2 <= e && r._2 > e - w).map(_._1)
          .distinct.size.toLong).toMap
      got == expect
    }

  property("rollup lattice matches the reference definition") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf(Status.All))) { statuses =>
      val s = spark
      import s.implicits._
      val rolled = IngestOps.rollupStatus(
        statuses.map(("req", _)).toDF("ingestion_id", "status"))
        .as[(String, String)].head()._2
      val expected =
        if (statuses.forall(_ == Status.YetToStart)) Status.YetToStart
        else if (statuses.forall(_ == Status.Completed)) Status.Completed
        else Status.Triggered
      rolled == expected
    }

  private val jobGen = for {
    id <- Gen.uuid.map(_.toString.take(8))
    pri <- Gen.oneOf(Priority.Valid)
    t <- Gen.choose(0L, 1000000L)
  } yield (id, pri, new java.sql.Timestamp(t))

  property("dequeue returns the (rank, created_at, id) minimum") =
    forAll(Gen.nonEmptyListOf(jobGen)) { jobs =>
      val s = spark
      import s.implicits._
      val df = jobs.toDF("ingestion_id", "priority", "created_at")
      val got = IngestOps.dequeue(df, 1, "priority", "created_at",
        col("ingestion_id")).as[(String, String, java.sql.Timestamp)].head()
      val rank = Map("HIGH" -> 1, "MEDIUM" -> 2, "LOW" -> 3)
      val want = jobs.minBy { case (id, p, t) => (rank(p), t.getTime, id) }
      (got._1, got._2, got._3.getTime) == ((want._1, want._2, want._3.getTime))
    }

  // The trickiest hand-rolled operator: union-and-fill as-of vs a brute
  // nested-loop reference on random data — both directions, null times on
  // both sides, tie times (inclusive bounds), keys with no match.
  private val asofKeyGen = Gen.oneOf("a", "b", "c")
  private val asofTimeGen = Gen.frequency(
    9 -> Gen.choose(0L, 20L).map(Option(_)), // small range forces ties
    1 -> Gen.const(Option.empty[Long]))      // null event times

  property("as-of joins match the nested-loop reference (both directions)") =
    forAll(Gen.nonEmptyListOf(Gen.zip(asofKeyGen, asofTimeGen)),
      Gen.nonEmptyListOf(Gen.zip(asofKeyGen, asofTimeGen))) { (lRows, rRows0) =>
      val s = spark
      import s.implicits._
      // contract: right side pre-deduplicated on (key, time)
      val rRows = rRows0.zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i") }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "lt")
      val right = rRows.toDF("k", "rt", "v")

      def reference(fwd: Boolean): Map[Long, Option[String]] =
        lRows.zipWithIndex.map { case ((k, t), i) =>
          i.toLong -> t.flatMap { lt =>
            val cands = rRows.filter(r => r._1 == k && r._2.exists(rt =>
              if (fwd) rt >= lt else rt <= lt))
            if (cands.isEmpty) None
            else Some((if (fwd) cands.minBy(_._2.get) else cands.maxBy(_._2.get))._3)
          }
        }.toMap

      val back = AsofJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("v"))
        .select("lid", "v").as[(Long, Option[String])].collect().toMap
      val fwd = AsofJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("v"))
        .select("lid", "v").as[(Long, Option[String])].collect().toMap
      back == reference(fwd = false) && fwd == reference(fwd = true)
    }

  // Same reference, native physical operator (custom LogicalPlan +
  // Strategy + merge-walk SparkPlan): the two as-of implementations must
  // be row-identical on the same adversarial inputs.
  property("native as-of exec matches the nested-loop reference") =
    forAll(Gen.nonEmptyListOf(Gen.zip(asofKeyGen, asofTimeGen)),
      Gen.nonEmptyListOf(Gen.zip(asofKeyGen, asofTimeGen))) { (lRows, rRows0) =>
      val s = spark
      import s.implicits._
      val rRows = rRows0.zipWithIndex.map { case ((k, t), i) => (k, t, s"v$i") }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "lt")
      val right = rRows.toDF("k", "rt", "v")

      def reference(fwd: Boolean): Map[Long, Option[String]] =
        lRows.zipWithIndex.map { case ((k, t), i) =>
          i.toLong -> t.flatMap { lt =>
            val cands = rRows.filter(r => r._1 == k && r._2.exists(rt =>
              if (fwd) rt >= lt else rt <= lt))
            if (cands.isEmpty) None
            else Some((if (fwd) cands.minBy(_._2.get) else cands.maxBy(_._2.get))._3)
          }
        }.toMap

      val back = graft.plans.NativeAsof.backward(
        left, right, Seq("k"), "lt", "rt", Seq("v"))
        .select("lid", "v").as[(Long, Option[String])].collect().toMap
      val fwd = graft.plans.NativeAsof.forward(
        left, right, Seq("k"), "lt", "rt", Seq("v"))
        .select("lid", "v").as[(Long, Option[String])].collect().toMap
      back == reference(fwd = false) && fwd == reference(fwd = true)
    }

  property("jaccard is bounded, symmetric, 1 on self") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")),
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))) { (xs, ys) =>
      val s = spark
      import s.implicits._
      val Seq(jab, jba, jaa) = Seq((xs, ys), (ys, xs), (xs, xs)).toDF("x", "y")
        .select(Dedup.jaccard(col("x"), col("y")).as("j"))
        .as[Double].collect().toSeq
      jab >= 0.0 && jab <= 1.0 && jab == jba &&
        (xs.isEmpty || jaa == 1.0)
    }

  property("gramCountStats matches the in-memory sliding-window reference") =
    forAll(
      Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))),
      Gen.choose(1, 3)) { (docs, n) =>
      val s = spark
      import s.implicits._
      val df = docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
        .toDF("doc_id", "tok")
      val got = TextAnalysis.gramCountStats(df, "doc_id", "tok", n)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = docs.zipWithIndex.flatMap { case (toks, i) =>
        if (toks.size < n) None
        else {
          val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
          Some(i.toLong -> ((counts.values.sum,
            counts.values.filter(_ > 1).sum, counts.values.max)))
        }
      }.toMap
      got == want
    }

  property("mergeUpsert partitions output into keep/update/insert exactly") =
    forAll(Gen.listOf(Gen.choose(1L, 40L)), Gen.listOf(Gen.choose(1L, 40L))) {
      (baseKeys, changeKeys) =>
      val s = spark
      import s.implicits._
      val base = baseKeys.distinct.map(k => (k, s"b$k")).toDF("k", "v")
      val changes = changeKeys.distinct.map(k => (k, s"c$k")).toDF("k", "v")
      val out = graft.operators.Relational.mergeUpsert(base, changes, "k")
        .as[(Long, String, String)].collect()
      val bk = baseKeys.distinct.toSet
      val ck = changeKeys.distinct.toSet
      out.length == (bk ++ ck).size &&
        out.forall { case (k, v, action) =>
          action match {
            case "keep"   => bk(k) && !ck(k) && v == s"b$k"
            case "update" => bk(k) && ck(k) && v == s"c$k"
            case "insert" => !bk(k) && ck(k) && v == s"c$k"
            case _ => false
          }
        }
    }

  property("coOccurrence matches the in-memory pair-count reference") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 12L)))) {
      rows =>
      val s = spark
      import s.implicits._
      val want = rows.groupBy(_._1).values
        .flatMap(g => g.map(_._2).distinct.sorted.combinations(2))
        .toSeq.groupBy(identity).view
        .mapValues(_.size.toLong)
        .map { case (p, n) => (p(0), p(1), n) }.toSet
      val got =
        if (rows.isEmpty) Set.empty[(Long, Long, Long)]
        else graft.operators.Relational.coOccurrence(
          rows.toDF("g", "item"), "g", "item")
          .as[(Long, Long, Long)].collect().toSet
      got == want
    }

  property("mergeIntervals covers exactly the input's point-set union") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(0L, 40L), Gen.choose(0L, 12L)))) { raw =>
      val s = spark
      import s.implicits._
      val iv = raw.zipWithIndex.map { case ((k, st, len), i) =>
        (k, st, st + len, i.toLong)
      }
      val out = graft.operators.EventTime.mergeIntervals(
        iv.toDF("k", "s", "e", "id")
          .select(col("k"), timestamp_micros(col("s")).as("s"),
            timestamp_micros(col("e")).as("e"), col("id")),
        "k", "s", "e", "id")
        .select(col("k"), unix_micros(col("merged_start")),
          unix_micros(col("merged_end")), col("n_merged"))
        .as[(Long, Long, Long, Long)].collect()
      // 1) merged intervals per key are disjoint, non-touching, ordered
      val disjoint = out.groupBy(_._1).values.forall { g =>
        val sorted = g.sortBy(_._2)
        sorted.zip(sorted.drop(1)).forall { case (a, b) => a._3 < b._2 }
      }
      // 2) covered integer point-set equals the union of inputs per key
      val wantPts = iv.groupBy(_._1).view.mapValues(
        _.flatMap(r => r._2 to r._3).toSet).toMap
      val gotPts = out.groupBy(_._1).view.mapValues(
        _.flatMap(r => r._2 to r._3).toSet).toMap
      // 3) every input interval is counted exactly once
      val counts = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
      val wantCounts = iv.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      disjoint && gotPts == wantPts && counts == wantCounts
    }

  property("weightedMedian equals the brute-force crossing definition") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(-20L, 20L), Gen.choose(1L, 9L)))) { rows =>
      val s = spark
      import s.implicits._
      val got = graft.operators.Relational.weightedMedian(
        rows.toDF("g", "v", "w"), Seq(col("g")), col("v"), col("w"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val tot = rs.map(_._3).sum
        val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        var cum = 0L
        val med = byV.collectFirst {
          case (v, w) if { cum += w; cum * 2 >= tot } => v
        }.get
        g -> (med, tot)
      }
      got == want
    }

  property("bfsHops matches the in-memory level-BFS reference") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L))),
      Gen.nonEmptyListOf(Gen.choose(1L, 10L)), Gen.choose(0, 3)) {
      (raw, seedsRaw, maxHops) =>
      val s = spark
      import s.implicits._
      val edges = raw.filter(e => e._1 != e._2).distinct
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val seeds = seedsRaw.distinct
      // reference: level-synchronous BFS capped at maxHops
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds.toSet
      var hop = 0L
      while (hop < maxHops && frontier.nonEmpty) {
        hop += 1
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        dist = dist ++ next.map(_ -> hop)
        frontier = next
      }
      val edgeDf =
        if (edges.isEmpty) Seq((-1L, -2L)).toDF("s", "d") // disconnected stub
        else edges.toDF("s", "d")
      val got = graft.operators.Graph.bfsHops(edgeDf, "s", "d",
        seeds.toDF("node"), maxHops)
        .as[(Long, Long)].collect().toMap
      got == dist
    }

  property("triangleCounts matches the naive triple-loop reference") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 12L)))) {
      raw =>
      val s = spark
      import s.implicits._
      val edges = raw.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val eset = edges.toSet
      val want = (for {
        a <- nodes; b <- nodes if a < b && eset((a, b))
        c <- nodes if b < c && eset((b, c)) && eset((a, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else graft.operators.Graph.triangleCounts(
          edges.toDF("s", "d"), "s", "d")
          .as[(Long, Long)].collect().toMap
      got == want
    }

  property("waterFill == min(supply, L*) for the max feasible integer " +
    "level, full supplies when no cap binds") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 40L)), Gen.choose(0L, 300L)) {
      (xs, budget) =>
      val s = spark
      import s.implicits._
      val supplies = xs.zipWithIndex.map { case (x, i) => (s"g$i", x) }
      val got = graft.operators.Curation.waterFill(
        supplies.toDF("g", "supply"), "g", "supply", budget)
        .collect().map(r => r.getString(0) -> (r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val total = xs.sum
      if (total <= budget) {
        // no cap binds: everyone keeps their supply, level is NULL
        supplies.forall { case (g, x) =>
          got(g) == ((x, None)) }
      } else {
        // naive reference: the largest integer level whose capped sum fits
        val lStar = (0L to xs.max).takeWhile(l =>
          xs.map(math.min(_, l)).sum <= budget).last
        supplies.forall { case (g, x) =>
          got(g)._1 == math.min(x, lStar) } &&
          got.values.forall(_._2.contains(lStar))
      }
    }

  property("kTruss matches the naive peel-to-fixpoint reference") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L))),
      Gen.choose(3, 5)) { (raw, k) =>
      val s = spark
      import s.implicits._
      val edges = raw.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      // naive reference: recompute per-edge support, peel, repeat
      def supportOf(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
        val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
        val tris = for {
          a <- nodes; b <- nodes if a < b && es((a, b))
          c <- nodes if b < c && es((b, c)) && es((a, c))
        } yield (a, b, c)
        tris.flatMap { case (a, b, c) => Seq((a, b), (a, c), (b, c)) }
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
      }
      var es = edges.toSet
      var done = false
      while (!done) {
        val sup = supportOf(es)
        val next = es.filter(e => sup.getOrElse(e, 0L) >= k - 2)
        done = next == es
        es = next
      }
      val want = supportOf(es).filter { case (e, _) => es(e) }
        .map { case ((u, v), c) => (u, v, c) }.toSet
      val got =
        if (edges.isEmpty) Set.empty[(Long, Long, Long)]
        else graft.operators.Graph.kTruss(edges.toDF("s", "d"), "s", "d", k)
          .as[(Long, Long, Long)].collect().toSet
      got == want
    }

  property("Misra-Gries merge tree: superset of n/(m+1)-heavy items, ≤ m " +
    "counters, bounded undercount") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 12)), Gen.choose(1, 8),
      Gen.choose(1, 5)) { (raw, m, nSplits) =>
      val agg = new graft.functions.MisraGriesAggregator(m)
      val items = raw.map(i => s"t$i")
      // deterministic round-robin split into nSplits streams, each reduced
      // independently then merged left-to-right — exercises reduce AND the
      // (m+1)-th-largest-subtraction merge on every run
      val chunks = items.zipWithIndex.groupBy(_._2 % nSplits)
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val heavy = exact.collect {
        case (k, c) if c * (m + 1) > n => k
      }.toSet
      merged.n == n &&
      merged.counts.size <= m &&
      heavy.subsetOf(merged.counts.keySet) &&
      merged.counts.forall { case (k, est) =>
        val t = exact.getOrElse(k, 0L)
        est >= 1L && est <= t && (t - est) * (m + 1) <= n
      }
    }

  property("weighted prefix-filter join is lossless vs the exact " +
    "in-memory weighted-Jaccard scan") =
    forAll(
      Gen.listOfN(8, Gen.nonEmptyListOf(Gen.choose(0, 9))),
      Gen.oneOf((1L, 3L), (1L, 2L), (7L, 10L))) { (rawSets, t) =>
      val s = sq
      import s.implicits._
      val (tn, td) = t
      val docs = rawSets.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.map(x => s"t$x").distinct) }
      val df = docs.toDF("doc_id", "s").repartition(3)
      val got = Dedup.weightedPrefixFilteredPairs(df, "doc_id", "s", tn, td)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      // exact reference with the operator's weight definition
      val n = docs.count(_._2.nonEmpty).toLong
      val dfreq = docs.flatMap(_._2.distinct).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      def iw(tok: String): Long =
        math.min(math.floor(1000000.0 * n / dfreq(tok)).toLong,
          TextAnalysis.RarityCap)
      def w(ts: Seq[String]): Long = ts.map(iw).sum
      val want = (for {
        (a, sa) <- docs; (b, sb) <- docs
        if a < b && sa.nonEmpty && sb.nonEmpty
        i = w(sa.intersect(sb))
        if i * (td + tn) >= tn * (w(sa) + w(sb))
      } yield (a, b)).toSet
      got == want
    }

  property("packSequences: spans partition every doc's tokens, fill " +
    "every sequence except the last exactly, and stay in-bounds") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 30L)),
      Gen.choose(1L, 16L)) { (toks, seqLen) =>
      val s = spark
      import s.implicits._
      val df = toks.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("doc_id", "n_tok")
      val out = graft.operators.Curation
        .packSequences(df, "doc_id", col("n_tok"), seqLen, salt = "p")
        .select("seq_id", "doc_id", "offset_in_seq", "tokens_in_seq")
        .as[(Long, Long, Long, Long)].collect()
      val total = toks.filter(_ > 0).sum
      val perDoc = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
      val perSeq = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
      val lastSeq = if (total == 0) -1L else (total - 1) / seqLen
      (total == 0 && out.isEmpty) || (
        // every positive-token doc fully covered, zero-token docs absent
        toks.zipWithIndex.forall { case (n, i) =>
          if (n > 0) perDoc.get(i.toLong).contains(n)
          else !perDoc.contains(i.toLong)
        } &&
        // sequences 0..last-1 full, last holds the remainder
        perSeq.keySet == (0L to lastSeq).toSet &&
        perSeq.forall { case (sq, n) =>
          if (sq < lastSeq) n == seqLen
          else n == total - lastSeq * seqLen
        } &&
        // span bounds: inside the sequence, nonempty
        out.forall { case (_, _, off, n) =>
          off >= 0 && n >= 1 && off + n <= seqLen
        })
    }

  property("packSequences delta-build equals the in-memory tape " +
    "reference under append-at-end ordering") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 20L), Gen.oneOf(false, true))),
      Gen.choose(2L, 8L)) { (docs, seqLen) =>
      val s = spark
      import s.implicits._
      def md5hex(x: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val rows = docs.zipWithIndex
        .map { case ((n, isNew), i) => (i.toLong, n, isNew) }
      def segment(isNew: Boolean) = rows.filter(_._3 == isNew)
        .map { case (id, n, _) => (md5hex(s"p|$id") + s"|$id", id, n) }
        .sortBy(_._1)
      // in-memory tape: old segment then new segment, contiguous spans
      var pos = 0L
      val expect = (segment(false) ++ segment(true)).flatMap {
        case (_, id, n) =>
          val start = pos; pos += n
          (start / seqLen to (pos - 1) / seqLen).map { seq =>
            (seq, id, math.max(start - seq * seqLen, 0L),
              math.min(pos, (seq + 1) * seqLen) -
                math.max(start, seq * seqLen))
          }
      }.toSet
      val df = rows.toDF("doc_id", "n_tok", "is_new")
      val oldTotal = rows.filter(!_._3).map(_._2).sum
      val got = graft.operators.Curation
        .packSequences(df.filter(!col("is_new")), "doc_id", col("n_tok"),
          seqLen, salt = "p")
        .unionByName(graft.operators.Curation
          .packSequences(df.filter(col("is_new")), "doc_id", col("n_tok"),
            seqLen, salt = "p", tapeOffset = oldTotal))
        .select("seq_id", "doc_id", "offset_in_seq", "tokens_in_seq")
        .as[(Long, Long, Long, Long)].collect().toSet
      got == expect
    }

  property("largestRemainderQuota: quotas sum to the budget exactly and " +
    "each satisfies the Hamilton quota rule (floor ≤ quota ≤ ceil)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 5000L)),
      Gen.choose(1L, 2000L)) { (weights, seats) =>
      val s = spark
      import s.implicits._
      val df = weights.zipWithIndex
        .map { case (w, i) => (s"g$i", w) }.toDF("src", "w")
      val got = graft.operators.Curation
        .largestRemainderQuota(df, col("src"), col("w"), seats)
        .select("group", "weight", "quota")
        .as[(String, Long, Long)].collect()
      val totalW = weights.sum
      got.map(_._3).sum == seats && got.length == weights.size &&
        got.forall { case (_, w, q) =>
          val lo = seats * w / totalW
          val hi = if (seats * w % totalW == 0) lo else lo + 1
          q >= lo && q <= hi
        }
    }

  property("rocAucPpm matches the pair-counting reference and respects " +
      "label inversion") =
    forAll(Gen.listOfN(30, Gen.zip(Gen.oneOf(true, false),
        Gen.choose(0L, 8L)))) { rows =>
      val s = sq; import s.implicits._
      import graft.operators.Eval
      val pos = rows.filter(_._1).map(_._2)
      val neg = rows.filterNot(_._1).map(_._2)
      (pos.isEmpty || neg.isEmpty) || {
        val df = rows.map { case (y, x) => ("g", y, x) }.toDF("g", "y", "x")
        val auc = Eval.rocAucPpm(df, col("g"), col("y"), col("x"))
          .collect().head.getLong(3)
        val inv = Eval.rocAucPpm(df, col("g"), !col("y"), col("x"))
          .collect().head.getLong(3)
        val credit2 = (for (p <- pos; n <- neg)
          yield if (p > n) 2L else if (p == n) 1L else 0L).sum
        val want = credit2 * 1000000L / (2L * pos.size * neg.size)
        // inversion: pair credit complements, up to the shared div floors
        auc == want && auc >= 0L && auc <= 1000000L &&
          math.abs((auc + inv) - 1000000L) <= 1L
      }
    }

  property("cusum equals the sequential recurrence and alarms are " +
      "monotone in the threshold") =
    forAll(Gen.listOfN(25, Gen.choose(0L, 9L)), Gen.choose(0L, 2L),
        Gen.choose(1L, 6L)) { (xs, k, h) =>
      val s = sq; import s.implicits._
      import graft.operators.EventTime
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
        .toDF("key", "t", "x")
      val out = EventTime.cusum(df, col("key"), col("t"), col("x"), k, h)
        .orderBy("t").collect()
        .map(r => (r.getLong(4), r.getBoolean(5)))
      val n = xs.size.toLong
      val total = xs.sum
      var acc = 0L
      val ref = xs.map { x =>
        acc = math.max(0L, acc + (n * x - total - n * k)); acc }
      out.map(_._1).toSeq == ref &&
        out.forall { case (sv, a) => sv >= 0L && a == (sv >= h * n) }
    }

  property("footruleAgreementPpm: 1e6 on identical order, 0 on exact " +
      "reversal, bounded in between") =
    forAll(Gen.choose(2, 20)) { n =>
      val s = sq; import s.implicits._
      import graft.operators.Eval
      // distinct values 1..n: v = u gives identity; v = -u gives reversal
      val df = (1 to n).map(i => ("g", i.toLong, i.toLong, -i.toLong))
        .toDF("g", "u", "same", "rev")
      def agree(c: String) = Eval.footruleAgreementPpm(df, col("g"),
        col("u"), col(c)).collect().head.getLong(3)
      val id = agree("same"); val rv = agree("rev")
      id == 1000000L && rv == 0L
    }

  property("overlapChunks covers every character exactly once per " +
      "covering chunk set, tail included") =
    forAll(Gen.choose(1, 400), Gen.choose(1, 50), Gen.choose(1, 50)) {
      (len, size0, stride0) =>
      val s = sq; import s.implicits._
      import graft.operators.Curation
      val size = math.max(size0, stride0); val stride = math.min(size0, stride0)
      val text = ("ab" * 200).take(len)
      val chunks = Curation.overlapChunks(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
          size, stride)
        .select("pos", "chunk").as[(Long, String)].collect().sortBy(_._1)
      val covered = chunks.flatMap { case (p, c) =>
        (p until p + c.length) }.toSet
      // total coverage, chunk content matches the source span, and only
      // the final chunk may run short
      covered == (1L to len.toLong).toSet &&
        chunks.forall { case (p, c) =>
          c == text.substring((p - 1).toInt,
            math.min(len, p - 1 + size).toInt) } &&
        chunks.init.forall(_._2.length == size)
    }

  property("CountMin estimate >= exact for every key, under any " +
      "partitioning") =
    forAll(Gen.listOfN(200, Gen.choose(0, 25)), Gen.choose(1, 6)) {
      (keys, parts) =>
      val s = sq; import s.implicits._
      import graft.functions.{CountMin, CountMinAggregator}
      val items = keys.map(k => s"k$k")
      val sk = items.toDF("t").repartition(parts).as[String]
        .groupByKey(_ => 0)
        .agg(new CountMinAggregator(3, 64).toColumn.name("sk"))
        .collect().head._2
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (t, c) =>
        CountMin.estimate(sk.table, 3, 64, t) >= c } && sk.n == items.size
    }

  property("retractCcNodes == full CC rebuild over the remaining graph, " +
      "on random graphs and random takedowns") =
    forAll(Gen.listOf(Gen.zip(Gen.choose(1L, 14L), Gen.choose(1L, 14L))),
      Gen.listOf(Gen.choose(1L, 14L))) { (rawEdges, removedRaw) =>
      val s = sq; import s.implicits._
      val edges = rawEdges.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      (edges.isEmpty) || {
        val e = edges.toDF("a", "b")
        val base = Dedup.connectedComponentsStar(e, "a", "b")
        val removed = removedRaw.distinct
        val got = Dedup.retractCcNodes(base, e, "a", "b",
            removed.toDF("id"), "id")
          .as[(Long, Long)].collect().toMap
        // reference: CC over surviving edges, union-find in memory;
        // surviving endpoints isolated by the deletion self-label
        val keptEdges = edges.filterNot { case (a, b) =>
          removed.contains(a) || removed.contains(b) }
        val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
          .filterNot(removed.contains)
        val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        keptEdges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = nodes.map(n => n -> find(n)).toMap
        got == want
      }
    }

  property("retrieval index: retract . append == identity, retracting " +
      "absent ids is a no-op") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 12L),
        Gen.nonEmptyListOf(Gen.oneOf("w1", "w2", "w3", "w4", "w5")))),
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(101L, 108L),
        Gen.listOf(Gen.oneOf("w1", "w2", "w6"))))) { (baseRaw, deltaRaw) =>
      import graft.operators.Retrieval
      val s = sq; import s.implicits._
      // distinct ids; delta id range disjoint from base by construction
      val base = baseRaw.distinctBy(_._1).toDF("doc_id", "tok")
      val delta = deltaRaw.distinctBy(_._1).toDF("doc_id", "tok")
      val idx = Retrieval.buildIndex(base, "doc_id", "tok")
      // the full observable surface of an index (postings via the q132
      // surface; terms/docs/stats tag-unioned into one canonical set so
      // the whole check is two collects)
      def surface(ix: Retrieval.RetrievalIndex): (Set[String], Set[String]) = (
        Retrieval.invertedIndexFromIndex(ix)
          .select(concat_ws("|", col("token"), col("doc_freq"),
            col("n_postings"), col("postings")))
          .as[String].collect().toSet,
        ix.terms.select(concat_ws("|", lit("t"), col("term"), col("df"))
            .as("row"))
          .unionByName(ix.docs.select(
            concat_ws("|", lit("d"), col("doc_id"), col("dl")).as("row")))
          .unionByName(ix.stats.select(
            concat_ws("|", lit("s"), col("s_total"), col("n_docs"))
              .as("row")))
          .as[String].collect().toSet)
      val appended = Retrieval.applyIndexDelta(idx, delta, "doc_id", "tok")
      val roundTrip = Retrieval.retractDocs(appended,
        delta.select("doc_id"), "doc_id")
      val absent = Retrieval.retractDocs(idx,
        Seq(990L, 991L).toDF("doc_id"), "doc_id")
      surface(roundTrip) == surface(idx) && surface(absent) == surface(idx)
    }

  property("queryLikelihoodFromIndex == the Dirichlet model computed " +
      "in memory, on random corpora") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 10L),
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))))) { corpusRaw =>
      import graft.operators.Retrieval
      val s = sq; import s.implicits._
      val corpus = corpusRaw.distinctBy(_._1)
      val docs = corpus.toDF("doc_id", "tok")
      val idx = Retrieval.buildIndex(docs, "doc_id", "tok")
      val mu = 7L // small mu so smoothing and tf both matter
      val got = Retrieval.queryLikelihoodFromIndex(idx, 2, mu, 100)
        .select("doc_id", "rank", "score")
        .as[(Long, Long, Double)].collect().toSet
      // in-memory reference: same term selection, same exact rationals,
      // same rounding and product order
      val nonEmpty = corpus.filter(_._2.nonEmpty)
      val sTotal = corpus.map(_._2.size.toLong).sum
      val want: Set[(Long, Long, Double)] =
        if (nonEmpty.isEmpty || sTotal == 0) Set.empty
        else {
          val cnt = nonEmpty.flatMap(_._2).groupBy(identity)
            .map { case (t, xs) => t -> xs.size.toLong }
          val qts = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(2)
          if (qts.size < 2) Set.empty // score needs both pivots non-null
          else {
            def rnd(x: Double, p: Int) = BigDecimal(x)
              .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
            val scored = nonEmpty.map { case (id, toks) =>
              val dl = toks.size.toLong
              val vs = qts.map { case (t, cf) =>
                val tf = toks.count(_ == t).toLong
                rnd(((tf * sTotal + mu * cf) * 1000L).toDouble /
                  ((dl + mu) * sTotal).toDouble, 9)
              }
              (id, rnd(vs.reduceLeft(_ * _), 6))
            }
            scored.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
              .map { case ((id, sc), i) => (id, i + 1L, sc) }.toSet
          }
        }
      got == want
    }

  property("snippetsFromIndex picks the max-occurrence earliest window, " +
      "vs brute force on random token arrays") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 8L),
      Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z"))))) { corpusRaw =>
      import graft.operators.Retrieval
      val s = sq; import s.implicits._
      val corpus = corpusRaw.distinctBy(_._1)
      val docs = corpus.toDF("doc_id", "tok")
      val idx = Retrieval.buildIndex(docs, "doc_id", "tok")
      val qterms = Retrieval.topTermsFromIndex(idx, 1)
      val win = 3
      val got = Retrieval.snippetsFromIndex(idx, qterms, k = 100, win)
        .select("term", "doc_id", "window_start", "n_hits")
        .as[(String, Long, Long, Long)].collect().toSet
      val q = qterms.as[String].collect().head
      // brute force: for the ranked docs (any doc containing q — k covers
      // all), the window [p, p+win) over q's positions with most hits,
      // earliest on ties
      val want = corpus.flatMap { case (id, toks) =>
        val ps = toks.zipWithIndex.collect { case (t, i) if t == q =>
          i.toLong }
        if (ps.isEmpty) None
        else {
          val best = ps.map(p =>
              (p, ps.count(o => o >= p && o < p + win).toLong))
            .maxBy { case (p, n) => (n, -p) }
          Some((q, id, best._1, best._2))
        }
      }.toSet
      got == want
    }

  property("retractFromPack == full repack over the remaining corpus, " +
      "absent ids retract nothing") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 30L), Gen.choose(0L, 20L))),
      Gen.listOf(Gen.choose(1L, 30L))) { (corpusRaw, delRaw) =>
      import graft.operators.Curation
      val s = sq; import s.implicits._
      val corpus = corpusRaw.distinctBy(_._1).toDF("doc_id", "n_tok")
      // 990 is never in the corpus — retracting it must change nothing
      val del = (delRaw :+ 990L).distinct.toDF("doc_id")
      // seqLen 7 so docs straddle sequence boundaries constantly
      val manifest = Curation.packSequences(corpus, "doc_id",
        col("n_tok"), 7L, "p")
      def surface(df: org.apache.spark.sql.DataFrame) =
        df.select("seq_id", "doc_id", "offset_in_seq", "tokens_in_seq")
          .as[(Long, Long, Long, Long)].collect().toSet
      val got = surface(Curation.retractFromPack(manifest, del, 7L))
      val want = surface(Curation.packSequences(
        corpus.join(del, Seq("doc_id"), "left_anti"), "doc_id",
        col("n_tok"), 7L, "p"))
      got == want
    }

  property("pq index: retract . append == identity, retracting absent ids " +
      "is a no-op, codebook frozen throughout") =
    forAll(
      Gen.listOfN(4, Gen.listOfN(4, Gen.choose(-5, 5))),
      Gen.listOfN(3, Gen.listOfN(4, Gen.choose(-5, 5)))) {
      (baseRaw, deltaRaw) =>
      import graft.operators.Similarity
      val s = sq; import s.implicits._
      graft.functions.GraftFunctions.register(s) // native pq kernels
      def prep(raw: List[List[Int]], base: Long) =
        raw.zipWithIndex
          .map { case (v, i) => (base + i, v.map(_.toDouble)) }
          .toDF("vec_id", "vec")
          .withColumn("nrm", Similarity.norm(col("vec")))
      val baseDf = prep(baseRaw, 1L)
      val delta = prep(deltaRaw, 101L)
      val idx = Similarity.buildPqIndex(baseDf, 2, 2, 4)
      // the full observable surface: every code row with its vector and
      // codes, plus the codebook rows (which must never move)
      def surface(ix: Similarity.PqIndex): Set[String] =
        ix.codes.select(concat_ws("|", col("vec_id"),
            col("codes").cast("string"), col("vec").cast("string"),
            col("nrm")).as("row"))
          .unionByName(ix.codebook.select(concat_ws("|", lit("cb"),
            col("m"), col("c"), col("cw").cast("string")).as("row")))
          .as[String].collect().toSet
      val appended = Similarity.applyPqDelta(idx, delta)
      val roundTrip = Similarity.retractFromPqIndex(appended,
        delta.select("vec_id"))
      val absent = Similarity.retractFromPqIndex(idx,
        Seq(990L, 991L).toDF("vec_id"))
      surface(roundTrip) == surface(idx) && surface(absent) == surface(idx)
    }

  // The NB count table is ADDITIVE: counts(a) ⊕ counts(b) == counts(a∪b)
  // and retraction is the same fold with negated counts — the q285
  // algebra carried to the classifier's whole model artifact (doc
  // priors ride h = -1, so the property covers them too).
  property("nbCounts additive; retract == negated fold (q285 algebra)") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(4,
        Gen.oneOf("aa", "bb", "cc", "dd", "ee"))),
      Gen.nonEmptyListOf(Gen.listOfN(4,
        Gen.oneOf("aa", "bb", "cc", "ff")))) { (aDocs, bDocs) =>
      import graft.operators.Eval
      val s = sq; import s.implicits._
      def df(docs: List[List[String]], base: Long) =
        docs.zipWithIndex.map { case (t, i) =>
          (base + i, (base + i) % 2 == 0, t) }.toDF("doc_id", "y", "tok")
      val a = df(aDocs, 0L)
      val b = df(bDocs, 1000L)
      def cnt(d: org.apache.spark.sql.DataFrame) =
        Eval.nbCounts(d, "doc_id", "tok", col("y"), 8)
      def set(d: org.apache.spark.sql.DataFrame) =
        d.as[(Boolean, Long, Long)].collect().toSet
      val folded = Eval.nbCombineCounts(cnt(a), cnt(b))
      val full = cnt(a.unionByName(b))
      val retracted = Eval.nbCombineCounts(folded,
        cnt(b).withColumn("cnt", -col("cnt")))
      set(folded) == set(full) && set(retracted) == set(cnt(a))
    }

  // Same algebra on the bigram-LM table (round 12, the persisted q309
  // artifact): append = fold, retract ∘ append == identity via the
  // negated fold (context marginals ride h2 = -1 and fold identically).
  property("bigramLmCounts additive; retract == negated fold") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(5,
        Gen.oneOf("aa", "bb", "cc", "dd"))),
      Gen.nonEmptyListOf(Gen.listOfN(5,
        Gen.oneOf("aa", "bb", "cc", "ee")))) { (aDocs, bDocs) =>
      import graft.operators.Eval
      val s = sq; import s.implicits._
      def df(docs: List[List[String]], base: Long) =
        docs.zipWithIndex.map { case (t, i) => (base + i, t) }
          .toDF("doc_id", "tok")
      val a = df(aDocs, 0L)
      val b = df(bDocs, 1000L)
      def cnt(d: org.apache.spark.sql.DataFrame) =
        Eval.bigramLmCounts(d, "doc_id", "tok", 16)
      def set(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long, Long)].collect().toSet
      val folded = Eval.bigramLmCombineCounts(cnt(a), cnt(b))
      val full = cnt(a.unionByName(b))
      val retracted = Eval.bigramLmCombineCounts(folded,
        Eval.negateCounts(cnt(b)))
      set(folded) == set(full) && set(retracted) == set(cnt(a))
    }

  // The probe-radius leg (round 12): at every radius, the multi-probe
  // candidate set must equal the brute-force "some band within Hamming
  // <= radius" pair set — the probe-mask explode + equi-join is an
  // implementation of that definition, not an approximation of it.
  property("multiProbeCandidatePairs == brute-force band Hamming <= radius") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(2, Gen.choose(0L, 31L))),
      Gen.choose(1, 3)) { (sigs, radius) =>
      val s = sq; import s.implicits._
      val docs = sigs.zipWithIndex.map { case (bands, i) =>
        (i.toLong, bands) }
      val df = docs.toDF("doc_id", "bands")
      val got = Dedup.multiProbeCandidatePairs(df, "doc_id", "bands",
          bits = 5, radius = radius)
        .as[(Long, Long)].collect().toSet
      val expect = (for {
        (a, ba) <- docs; (b, bb) <- docs if a < b
        if ba.zip(bb).exists { case (x, y) =>
          java.lang.Long.bitCount(x ^ y) <= radius }
      } yield (a, b)).toSet
      got == expect
    }

  // The maintained prefilter's gram-count table (q314): same additive
  // algebra as the NB/bigram tables — append = fold, retract == negated
  // fold, bit-for-bit against a rebuild from the remaining docs.
  property("dupGramCounts additive; retract == negated fold") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(6, Gen.oneOf('a', 'b'))
        .map(_.mkString)),
      Gen.nonEmptyListOf(Gen.listOfN(6, Gen.oneOf('a', 'c'))
        .map(_.mkString))) { (aTexts, bTexts) =>
      val s = sq; import s.implicits._
      def df(ts: List[String], base: Long) =
        ts.zipWithIndex.map { case (t, i) => (base + i, t) }
          .toDF("doc_id", "text")
      val a = df(aTexts, 0L)
      val b = df(bTexts, 1000L)
      def cnt(d: org.apache.spark.sql.DataFrame) =
        Dedup.dupGramCounts(d, "doc_id", "text", 3)
      def set(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long)].collect().toSet
      val folded = Dedup.combineGramCounts(cnt(a), cnt(b))
      val full = cnt(a.unionByName(b))
      val retracted = Dedup.combineGramCounts(folded,
        cnt(b).withColumn("cnt", -col("cnt")))
      set(folded) == set(full) && set(retracted) == set(cnt(a))
    }

  // Token-granularity marks (q312): same definition as the char-level
  // property, with the token as the unit — every position whose
  // minLen-token run occurs >= 2 times anywhere (self-overlaps
  // included), brute-forced in memory over small repeated vocabularies.
  property("exactSubstrMarksTokens == brute-force duplicated token runs") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 8).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")))),
      Gen.choose(1, 3)) { (docs, minLen) =>
      val s = sq; import s.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "tok")
      val got = Dedup.exactSubstrMarksTokens(df, "doc_id", "tok", minLen)
        .as[(Long, Long)].collect().toSet
      val runs = for {
        (t, i) <- docs.zipWithIndex
        p <- 0 to t.length - minLen
      } yield ((i.toLong, p.toLong), t.slice(p, p + minLen))
      val counts = runs.groupBy(_._2).view.mapValues(_.size).toMap
      val expect = runs.collect {
        case (pos, run) if counts(run) >= 2 => pos
      }.toSet
      got == expect
    }

  // Small alphabet + repeated docs force heavy suffix ties and shared
  // prefixes — the regimes where prefix doubling can go wrong. Reference
  // rank: 1 + index of the FIRST occurrence of the suffix string in the
  // (suffix, id, pos)-sorted order (equal suffixes share a rank), which
  // is exactly suffixRanks' min-sequence contract.
  property("suffixRanks matches the in-memory suffix sort (ties shared)") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(2, Gen.oneOf('a', 'b'))
        .flatMap(pad => Gen.choose(0, 24).map(n =>
          (pad.mkString * 13).take(n))))) { texts =>
      val s = sq; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.suffixRanks(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Long)].collect()
        .map { case (id, pos, r) => (id, pos) -> r }.toMap
      val suffixes = docs.flatMap { case (id, t) =>
        (0 until t.length).map(p => (t.substring(p), id, p.toLong)) }
        .sortBy(identity)
      val firstRank = suffixes.zipWithIndex
        .groupBy(_._1._1).map { case (suf, xs) =>
          suf -> (xs.map(_._2).min + 1L) }
      val want = suffixes.map { case (suf, id, pos) =>
        (id, pos) -> firstRank(suf) }.toMap
      got == want
    }

  // Adjacent-suffix LCP from the rank-table descent == the in-memory
  // adjacent LCP over the (suffix, id, pos)-sorted order — including
  // fully-equal suffixes (lcp = remaining length) and partial advances
  // at truncated levels.
  property("lcpAdjacentPairs == in-memory adjacent-suffix LCP") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(2, Gen.oneOf('a', 'b'))
        .flatMap(pad => Gen.choose(0, 24).map(n =>
          (pad.mkString * 13).take(n))))) { texts =>
      val s = sq; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.lcpAdjacentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLcp = 1)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val suffixes = docs.flatMap { case (id, t) =>
        (0 until t.length).map(p => (t.substring(p), id, p.toLong)) }
        .sortBy(identity)
      val want = suffixes.sliding(2).collect {
        case Seq((sa, ia, pa), (sb, ib, pb)) =>
          val lcp = sa.zip(sb).takeWhile { case (x, y) => x == y }.size.toLong
          (ia, pa, ib, pb, lcp)
      }.filter(_._5 >= 1).toSet
      got == want
    }

  // Cross-corpus decontamination marks == the brute-force cross gram
  // join (q304's semantics): a test position marks iff its gram exists
  // anywhere in the bench side — never from test-side-only duplicates.
  property("crossCorpusSubstrMarks == brute-force cross-side gram hits") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(3, Gen.oneOf('a', 'b'))
        .flatMap(pad => Gen.choose(0, 24).map(n =>
          (pad.mkString * 9).take(n)))),
      Gen.nonEmptyListOf(Gen.listOfN(3, Gen.oneOf('a', 'b'))
        .flatMap(pad => Gen.choose(0, 24).map(n =>
          (pad.mkString * 9).take(n)))),
      Gen.choose(2, 5)) { (testTexts, benchTexts, minLen) =>
      val s = sq; import s.implicits._
      val test = testTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val bench = benchTexts.zipWithIndex.map { case (t, i) =>
        (1000L + i, t) }
      val got = Dedup.crossCorpusSubstrMarks(test.toDF("doc_id", "text"),
          bench.toDF("doc_id", "text"), "doc_id", "text", minLen)
        .as[(Long, Long)].collect().toSet
      val benchGrams = bench.flatMap { case (_, t) =>
        (0 to t.length - minLen).map(p => t.substring(p, p + minLen)) }.toSet
      val want = test.flatMap { case (id, t) =>
        (0 to t.length - minLen).collect {
          case p if benchGrams(t.substring(p, p + minLen)) => (id, p.toLong)
        } }.toSet
      got == want
    }

  // Removal reconstruction: cutting the union of duplicated >=minLen
  // intervals must equal the in-memory cut, byte for byte (q303's
  // semantics — covers island merging, touching intervals, fully-covered
  // docs, and verbatim pass-through).
  property("exactSubstrRemove rebuilds exactly the uncovered bytes") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(3, Gen.oneOf('a', 'b'))
        .flatMap(pad => Gen.choose(0, 30).map(n =>
          (pad.mkString * 11).take(n)))),
      Gen.choose(2, 6)) { (texts, minLen) =>
      val s = sq; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.exactSubstrRemove(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen)
        .as[(Long, String, Long)].collect()
        .map { case (id, ct, rm) => id -> (ct, rm) }.toMap
      val grams = docs.flatMap { case (id, t) =>
        (0 to t.length - minLen).map(p =>
          (t.substring(p, p + minLen), id, p)) }
      val dup = grams.groupBy(_._1).filter(_._2.size >= 2).keySet
      val want = docs.map { case (id, t) =>
        val covered = Array.fill(t.length)(false)
        grams.foreach { case (g, gid, p) =>
          if (gid == id && dup(g))
            (p until p + minLen).foreach(covered(_) = true) }
        val kept = t.zipWithIndex.collect {
          case (c, i) if !covered(i) => c }.mkString
        id -> (kept, covered.count(identity).toLong)
      }.toMap
      got == want
    }

  // ExactSubstr marks against the brute-force gram join (the q298
  // semantics at arbitrary minLen on adversarial strings).
  property("exactSubstrMarks == brute-force duplicated-gram positions") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(3, Gen.oneOf('a', 'b', 'c'))
        .flatMap(pad => Gen.choose(0, 30).map(n =>
          (pad.mkString * 11).take(n)))),
      Gen.choose(2, 7)) { (texts, minLen) =>
      val s = sq; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.exactSubstrMarks(docs.toDF("doc_id", "text"),
          "doc_id", "text", minLen)
        .as[(Long, Long)].collect().toSet
      val grams = docs.flatMap { case (id, t) =>
        (0 to t.length - minLen).map(p =>
          (t.substring(p, p + minLen), id, p.toLong)) }
      val dup = grams.groupBy(_._1).filter(_._2.size >= 2).keySet
      val want = grams.collect {
        case (g, id, p) if dup(g) => (id, p) }.toSet
      got == want
    }

  // The incremental removal's maintained artifact (q315): doc-level
  // gram postings under the same additive algebra as the count table —
  // append = fold, retract == negated fold, bit-for-bit against a
  // rebuild from the remaining docs; and sum(n) GROUP BY g reproduces
  // dupGramCounts exactly (one artifact serves both reads).
  property("gramPostings additive; retract == negated fold") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(6, Gen.oneOf('a', 'b'))
        .map(_.mkString)),
      Gen.nonEmptyListOf(Gen.listOfN(6, Gen.oneOf('a', 'c'))
        .map(_.mkString))) { (aTexts, bTexts) =>
      val s = sq; import s.implicits._
      def df(ts: List[String], base: Long) =
        ts.zipWithIndex.map { case (t, i) => (base + i, t) }
          .toDF("doc_id", "text")
      val a = df(aTexts, 0L)
      val b = df(bTexts, 1000L)
      def post(d: org.apache.spark.sql.DataFrame) =
        Dedup.gramPostings(d, "doc_id", "text", 3)
      def set(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Long, Long)].collect().toSet
      val folded = Dedup.combineGramPostings(post(a), post(b))
      val full = post(a.unionByName(b))
      val retracted = Dedup.combineGramPostings(folded,
        post(b).withColumn("n", -col("n")))
      val countsFromPostings = full.groupBy(col("g"))
        .agg(sum(col("n")).as("cnt")).as[(Long, Long)].collect().toSet
      val counts = Dedup.dupGramCounts(a.unionByName(b), "doc_id",
        "text", 3).as[(Long, Long)].collect().toSet
      set(folded) == set(full) && set(retracted) == set(post(a)) &&
        countsFromPostings == counts
    }

  // The incremental removal itself (q315): every emitted row equals the
  // FULL-corpus removal's row for that doc, and the batch is fully
  // covered. Small alphabets force cross-doc AND within-doc duplicated
  // spans, old-old duplications the batch must not disturb, and
  // batch-created 1 -> 2 transitions on old docs.
  property("exactSubstrRemoveIncremental rows == full removal; batch covered") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(2, Gen.oneOf('a', 'b'))
        .flatMap(pad => Gen.choose(0, 16).map(n =>
          (pad.mkString * 9).take(n))))) { texts =>
      val s = sq; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val newIds = docs.filter(col("doc_id") % 2 === 1).select("doc_id")
      val postings = Dedup.combineGramPostings(
        Dedup.gramPostings(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", 3),
        Dedup.gramPostings(docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", 3))
      val inc = Dedup.exactSubstrRemoveIncremental(docs, "doc_id",
          "text", 3, postings, newIds)
        .as[(Long, String, Long)].collect()
        .map { case (id, ct, rc) => id -> ((ct, rc)) }.toMap
      val full = Dedup.exactSubstrRemove(docs, "doc_id", "text", 3)
        .as[(Long, String, Long)].collect()
        .map { case (id, ct, rc) => id -> ((ct, rc)) }.toMap
      val batch = newIds.as[Long].collect().toSet
      inc.forall { case (id, row) => full(id) == row } &&
        batch.subsetOf(inc.keySet)
    }

  // The unified dial (round 13): defined at EVERY n (log-uniform up to
  // 2^48 — no exception anywhere), modeled recall at the returned
  // geometry >= the 0.94 design target on both sides of the 24-bit cap,
  // radius exactly tracks the cap, the radius-1 regime IS
  // dialedBandGeometry (so the pinned q145/q250/q261 geometries can't
  // drift), and band width is monotone in n (the occupancy rule never
  // un-widens).
  property("dialedGeometry: recall held at every n; radius tracks the cap") =
    forAll(Gen.choose(0, 47).flatMap(e =>
        Gen.choose(1L << e, 2L << e)),
      Gen.choose(0, 47).flatMap(e =>
        Gen.choose(1L << e, 2L << e))) { (nA, nB) =>
      val (n1, n2) = (math.min(nA, nB), math.max(nA, nB))
      val p = 1.0 - math.acos(0.45) / math.Pi
      def chs(nn: Int, k: Int): Double =
        (0 until k).map(i => (nn - i).toDouble / (i + 1)).product
      def recall(bits: Int, bands: Int, radius: Int): Double = {
        val c = (0 to radius).map(i =>
          chs(bits, i) * math.pow(p, bits - i) * math.pow(1.0 - p, i)).sum
        1.0 - math.pow(1.0 - c, bands)
      }
      val (bits1, bands1, r1) = Similarity.dialedGeometry(n1)
      val (bits2, bands2, r2) = Similarity.dialedGeometry(n2)
      val occ1 = math.max(8,
        math.ceil(math.log(n1 / 8.0) / math.log(2.0)).toInt)
      val legacyOk = occ1 > 24 || {
        val (lb, lbits) = Similarity.dialedBandGeometry(n1)
        bits1 == lbits && bands1 == lb
      }
      recall(bits1, bands1, r1) >= 0.94 &&
        recall(bits2, bands2, r2) >= 0.94 &&
        (r1 == 1) == (occ1 <= 24) && legacyOk && bits1 <= bits2
    }
}
