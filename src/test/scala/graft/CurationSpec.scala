package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.Tables

/** Invariants of the curation family that the per-row oracles can't
  * express: split stability under corpus growth, packing capacity bounds,
  * sample determinism.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("noveltyScores: later doc sees earlier grams, first doc all-novel, " +
      "duplicate grams inside one doc count once") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: "a b c", "b c d" — all novel
      (2L, "a b c x a b c x"),// distinct grams: abc(seen), bcx, cxa, xab
      (3L, "b c d"))          // one gram, seen (doc 1 introduced it)
      .toDF("doc_id", "text")
    val got = Curation.noveltyScores(docs, "doc_id", "text", 3)
      .select("doc_id", "n_grams", "n_seen", "seen_ppm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 0L, 0L)))
    assert(got(2L) == ((4L, 1L, 250000L)), s"got ${got(2L)}")
    assert(got(3L) == ((1L, 1L, 1000000L)))
  }

  test("hashSplit is stable under corpus growth and ~matches requested rates") {
    val docs = Tables.documents(spark, dir)
    val full = Curation.hashSplit(docs, "doc_id",
      Seq(("train", 90), ("val", 5), ("test", 5)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // adding data must NOT move existing rows between splits: the split of
    // a doc in a half corpus equals its split in the full corpus
    val half = Curation.hashSplit(docs.filter(col("doc_id") % 2 === 0), "doc_id",
      Seq(("train", 90), ("val", 5), ("test", 5)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, s) => full(id) == s })
    // rates land near the request (hash noise at n=500: generous margins)
    val n = full.size.toDouble
    val frac = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.84 && frac("train") < 0.96, s"train ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) < 0.10 && frac.getOrElse("test", 0.0) < 0.10)
  }

  test("hashSample keeps a stable subset at the requested rate") {
    val docs = Tables.documents(spark, dir)
    val s10 = Curation.hashSample(docs, "doc_id", 10, 100)
      .select("doc_id").as[Long].collect().toSet
    val s20 = Curation.hashSample(docs, "doc_id", 20, 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s20), "raising the rate must only ADD rows")
    val n = docs.count().toDouble
    assert(s10.size / n > 0.05 && s10.size / n < 0.16, s"10% got ${s10.size / n}")
  }

  test("mixtureWeights: sqrt temperature weights relative to largest source") {
    val df = Seq(
      ("A", "w x y z"), ("A", "a b c d"), ("A", "e f g h"), ("A", "i j k l"),
      ("B", "m n o p")).toDF("source", "text")
      .withColumn("tok", graft.operators.Dedup.tokens(col("text")))
    val out = Curation.mixtureWeights(df, "source", "tok")
      .as[(String, Long, Long, Double)].collect().toSet
    // A: 16 tokens -> sqrt(16)/sqrt(16) = 1; B: 4 -> sqrt(4)/sqrt(16) = 0.5
    assert(out == Set(("A", 4L, 16L, 1.0), ("B", 1L, 4L, 0.5)), s"got $out")
  }

  test("balancedRepeat keeps NULL-keyed rows (rep=1) and balances the rest") {
    val df = Seq(
      (1L, Some("en")), (2L, Some("en")), (3L, Some("en")), (4L, Some("en")),
      (5L, Some("de")), (6L, None)).toDF("id", "lang")
    val out = Curation.balancedRepeat(df, "lang", 4)
      .select("id", "rep_idx").as[(Long, Long)].collect().toSeq
    val byId = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byId(6L) == 1, "NULL-keyed row must survive exactly once")
    assert(byId(5L) == 4, s"de (1 of max 4) should repeat 4x, got ${byId(5L)}")
    assert(Seq(1L, 2L, 3L, 4L).forall(byId(_) == 1), "largest group stays 1x")
  }

  // The synthetic corpus contains no emails, digit runs, control chars,
  // uppercase, or whitespace runs — q69's oracle only proves the identity
  // path there, so the actual transformations are pinned here.
  test("normalize and redactPii handle the cases the fixtures lack") {
    val df = Seq(
      (1L, "  Hello\tWORLD  mixed   Case "),
      (2L, "contact me at john.doe+spam@example.co.uk or 12345678901"),
      (3L, "short 1234567 stays")) // 7 digits: below the 8+ run threshold
      .toDF("id", "text")
    val out = df.select(col("id"),
      graft.operators.TextAnalysis.normalize(col("text")).as("n"),
      graft.operators.TextAnalysis.redactPii(col("text")).as("r"))
      .as[(Long, String, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L)._1 == "hello world mixed case", s"got '${out(1L)._1}'")
    assert(out(2L)._2 == "contact me at <EMAIL> or <NUM>", s"got '${out(2L)._2}'")
    assert(out(3L)._2 == "short 1234567 stays")
  }

  test("packBins: bins fill to capacity and overflow by at most one item") {
    val capacity = 4096L
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(graft.operators.Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
    val packed = Curation.packBins(toks, Seq(col("source")), col("doc_id"),
      col("n_tokens"), capacity)
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tokens")).as("fill"), max(col("n_tokens")).as("max_item"),
        count(lit(1)).as("n_docs"))
      .as[(String, Int, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    val byGroup = packed.groupBy(_._1)
    byGroup.foreach { case (_, bins) =>
      val lastBin = bins.map(_._2).max
      bins.foreach { case (_, bin, fill, maxItem, _) =>
        // closed bins reached capacity before their last item landed
        if (bin < lastBin) assert(fill >= capacity,
          s"closed bin $bin underfull: $fill")
        assert(fill < capacity + maxItem || fill == maxItem,
          s"bin $bin overflows by more than one item: $fill (max item $maxItem)")
      }
    }
    // bins are contiguous 0..last within each group
    byGroup.foreach { case (src, bins) =>
      val ids = bins.map(_._2).sorted.toSeq
      assert(ids == (0 to ids.max).toSeq, s"$src bins not contiguous: $ids")
    }
  }

  // The bloom prefilter may only PRUNE: identical output to the exact
  // path on real data, a might_contain filter in the physical plan ahead
  // of the confirm join, and a measurably smaller gram stream entering it.
  test("contaminatedDocsBloom: exact-identical output, measurable pruning") {
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("n_shared").cast("long"))
        .as[(Long, Long)].collect().toSet
    val exact = rows(Curation.contaminatedDocs(docs, bench, "doc_id", "text", 8))
    val bloomed = Curation.contaminatedDocsBloom(docs, bench, "doc_id", "text", 8)
    assert(rows(bloomed) == exact)
    assert(exact.nonEmpty, "fixture has no contamination - test is vacuous")
    // plan pin: the probe really is in the plan (not optimized away)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")

    // pruning measurement: corpus grams surviving the sketch vs all grams
    def grams(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("_tok", Dedup.tokens(col("text")))
        .select(explode(Dedup.shingles(col("_tok"), 8)).as("_g"))
        .select(md5(col("_g")).as("gram_h"))
    val sketch = grams(bench).distinct()
      .agg(call_function("graft_bloom_agg", xxhash64(col("gram_h")),
        lit(1L << 20), lit(1L << 23))).head().getAs[Array[Byte]](0)
    val total = grams(docs).count()
    val surviving = grams(docs)
      .filter(call_function("graft_might_contain", lit(sketch),
        xxhash64(col("gram_h")))).count()
    assert(surviving < total / 2,
      s"bloom passed $surviving of $total grams - no real pruning")
  }

  // Span surgery on a constructed fixture: exactly the benchmark-shared
  // run is cut (both flanks survive), clean docs pass through with
  // n_removed = 0, and a pure benchmark copy vanishes entirely.
  test("spanDecontaminate: cuts exactly the shared span, keeps the flanks") {
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val corpus = Seq(
      (1L, s"left flank words here $quote right flank words there"),
      (2L, "completely clean document with no benchmark overlap at all"),
      (3L, quote)) // pure benchmark copy -> vanishes
      .toDF("doc_id", "text")
    val bench = Seq((97L, s"benchmark context $quote more benchmark"))
      .toDF("doc_id", "text")
    val out = Curation.spanDecontaminate(corpus, bench, "doc_id", "text", 8)
      .select("doc_id", "clean_text", "n_kept", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set(1L, 2L), s"got ${out.keySet}")
    assert(out(1L) == (("left flank words here right flank words there", 8L, 10L)),
      s"got ${out(1L)}")
    assert(out(2L)._1.startsWith("completely clean") && out(2L)._3 == 0L)
  }

  test("weightedSample equals an exact BigInt reference at any " +
      "parallelism, and k >= n returns everything") {
    val df = (1L to 200L).map(i => (i, 1L + i % 17)).toDF("id", "w")
    // exact reference: same md5 draw, ratios compared as BigInt fractions
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(s"ws|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = (1L to 200L).map(i => (i, h(i), 1L + i % 17))
      .sortBy { case (id, hv, w) => (BigDecimal(BigInt(hv)) / BigDecimal(w), id) }
      .take(20).map(t => (t._1, t._2, t._3)).toSet
    for (parts <- Seq(1, 7)) {
      val got = Curation.weightedSample(df.repartition(parts), "id",
          col("w"), k = 20, salt = "ws")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"parts=$parts: got $got want $want")
    }
    val all = Curation.weightedSample(df, "id", col("w"), k = 500, salt = "ws")
    assert(all.count() == 200)
  }

  test("weightedSamplePerGroup: each group independently equals the " +
      "single-group sampler run on that group alone") {
    val df = (1L to 120L).map(i => (s"g${i % 3}", i, 1L + i % 11))
      .toDF("grp", "id", "w")
    val per = Curation.weightedSamplePerGroup(df.repartition(5), "grp",
        "id", col("w"), k = 7, salt = "ws")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(r => (r._2, r._3, r._4)).toSet }
    assert(per.keySet == Set("g0", "g1", "g2"))
    for (g <- per.keys) {
      val solo = Curation.weightedSample(df.filter(col("grp") === g), "id",
          col("w"), k = 7, salt = "ws")
        .as[(Long, Long, Long)].collect().toSet
      assert(per(g) == solo, s"group $g diverged: ${per(g)} vs $solo")
    }
  }

  test("weightedSample fails loudly on non-positive weights") {
    val df = Seq((1L, 3L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Curation.weightedSample(df, "id", col("w"), k = 2, salt = "ws").collect()
    }
    assert(e.getMessage != null)
  }

  test("contaminatedDocsBloom: empty benchmark yields empty result") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val out = Curation.contaminatedDocsBloom(docs,
      docs.filter(col("doc_id") < 0), "doc_id", "text", 8)
    assert(out.columns.toSeq == Seq("doc_id", "n_shared"))
    assert(out.count() == 0)
  }

  test("quotaSample realizes the apportionment exactly: seats rows " +
    "total, per-group count == quota, deterministic across partitioning") {
    import spark.implicits._
    // 3 groups with 10/6/4 docs; 10 seats → quotas 5/3/2
    val docs = ((1 to 10).map(i => ("a", i.toLong)) ++
      (11 to 16).map(i => ("b", i.toLong)) ++
      (17 to 20).map(i => ("c", i.toLong))).toDF("src", "id")
    val out = Curation.quotaSample(docs, col("src"), "id",
      seats = 10L, salt = "t")
      .select("group", "id", "rnk", "quota")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 10, s"must realize exactly 10 rows, got ${out.length}")
    val perGroup = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perGroup == Map("a" -> 5, "b" -> 3, "c" -> 2), s"got $perGroup")
    assert(out.forall { case (_, _, rnk, quota) => rnk >= 1 && rnk <= quota })
    val again = Curation.quotaSample(docs.repartition(7), col("src"), "id",
      seats = 10L, salt = "t")
      .select("group", "id", "rnk", "quota")
      .as[(String, Long, Long, Long)].collect()
    assert(again.toSet == out.toSet,
      "the realized sample must not depend on partitioning")
  }

  test("overlapChunks: coverage, overlap, tail behavior, and identity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 306),   // 3 chunks: 0,100,200; last len 106
      (2L, "b" * 200),   // exactly size: 1 chunk
      (3L, "c" * 48),    // short: 1 chunk of 48
      (4L, "d" * 201)    // 2 chunks; tail covered by chunk at 100
    ).toDF("doc_id", "text")
    val out = graft.operators.Curation
      .overlapChunks(docs, "doc_id", "text", size = 200, stride = 100)
      .select("doc_id", "chunk_idx", "pos", "chunk_len")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out(1L).map(c => (c._3, c._4)).toSeq ==
      Seq((1L, 200L), (101L, 200L), (201L, 106L)))
    assert(out(2L).map(c => (c._3, c._4)).toSeq == Seq((1L, 200L)))
    assert(out(3L).map(c => (c._3, c._4)).toSeq == Seq((1L, 48L)))
    assert(out(4L).map(c => (c._3, c._4)).toSeq ==
      Seq((1L, 200L), (101L, 101L)))
    // coverage: every character position of every doc is inside a chunk
    for ((id, chunks) <- out; len = Map(1L -> 306L, 2L -> 200L,
        3L -> 48L, 4L -> 201L)(id)) {
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4))
      assert(covered.toSet == (1L to len).toSet, s"doc $id coverage")
    }
  }

  test("dsirImportance hand case: pure-target bigram scores 2e6, " +
      "pure-raw-exclusive scores 0") {
    // tc(alpha beta)=2 rc=2, tc(gamma delta)=0 rc=2, TT=2 RT=4:
    // ratio(ab) = (2e9 div 2)*1e6 div (2e9 div 4) = 2e6; ratio(gd) = 0
    val docs = Seq(
      (1L, true, Seq("alpha", "beta")), (2L, true, Seq("alpha", "beta")),
      (3L, false, Seq("gamma", "delta")), (4L, false, Seq("gamma", "delta")))
      .toDF("doc_id", "tgt", "tok")
    val got = Curation.dsirImportance(docs, "doc_id", "tok", col("tgt"), 128)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 2000000L)) && got(2L) == ((1L, 2000000L)))
    assert(got(3L) == ((1L, 0L)) && got(4L) == ((1L, 0L)))
  }

  test("dsirImportance is invariant under uniform corpus duplication " +
      "(rates cancel exactly, including truncation)") {
    val docs = Tables.documents(spark, dir).limit(120)
      .withColumn("tok", graft.operators.Dedup.tokens(col("text")))
      .select(col("doc_id"), col("lang"), col("tok"))
    val base = Curation.dsirImportance(docs, "doc_id", "tok",
        col("lang") === "en", 128)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    val dup = Curation.dsirImportance(doubled, "doc_id", "tok",
        col("lang") === "en", 128)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(base.forall { case (id, s) => dup(id) == s && dup(id + 100000L) == s },
      "doubling every doc must not move any score by even 1 ppm")
  }

  test("dsirImportance shifts the selection toward the target domain " +
      "on the real corpus") {
    val docs = Tables.documents(spark, dir)
      .withColumn("tok", graft.operators.Dedup.tokens(col("text")))
    val scored = Curation.dsirImportance(docs, "doc_id", "tok",
        col("lang") === "en", 128)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
    val top = scored.orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(100).collect()
    val enTop = top.count(_.getAs[String]("lang") == "en")
    val enAll = docs.filter(col("lang") === "en").count()
    val frac = docs.count()
    // en is ~1/5 of the corpus; the top-100 selection must be en-heavier
    assert(enTop * frac > 100L * enAll * 3 / 2,
      s"top-100 en share ($enTop/100) must beat the corpus share " +
        s"($enAll/$frac) by >= 1.5x")
  }

  test("epoch schedule never exceeds its budget and caps at 4 epochs") {
    val out = graft.SparkEntry.queries("q283_epoch_schedule")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (toks, epochs, rem, ptoks, sched) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6), r.getLong(7))
      assert(epochs <= 4L && epochs >= 0L)
      assert(sched == epochs * toks + ptoks)
      assert(sched <= 5000L, s"schedule $sched exceeds the 5000 budget")
      assert(ptoks <= rem, "partial epoch must fit the remainder")
    }
  }

  test("dsirRates: retract o append == identity (the fold is a group)") {
    val docs = Tables.documents(spark, dir).limit(150)
      .withColumn("tok", graft.operators.Dedup.tokens(col("text")))
    val old = docs.filter(col("doc_id") % 10 =!= 7)
    val delta = docs.filter(col("doc_id") % 10 === 7)
    val tgt = col("lang") === "en"
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val full = Curation.dsirCombineRates(
      Curation.dsirRates(old, "doc_id", "tok", tgt, 128),
      Curation.dsirRates(delta, "doc_id", "tok", tgt, 128))
    // subtracting the delta's counts must land exactly on rates(old)
    val negated = Curation.dsirRates(delta, "doc_id", "tok", tgt, 128)
      .select(col("bucket"), (-col("rc")).as("rc"), (-col("tc")).as("tc"))
    val back = Curation.dsirCombineRates(full, negated)
    assert(m(back) == m(Curation.dsirRates(old, "doc_id", "tok", tgt, 128)))
    assert(m(full) == m(Curation.dsirRates(docs, "doc_id", "tok", tgt, 128)))
  }

  test("rendezvousShard: adding a shard only STEALS keys — no key moves " +
      "between surviving shards, and the stolen share is ~1/K+1") {
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
    val before = Curation.rendezvousShard(ids, "doc_id",
      Seq("A", "B", "C", "D"))
      .select(col("doc_id"), col("shard").as("o"))
    val after = Curation.rendezvousShard(ids, "doc_id",
      Seq("A", "B", "C", "D", "E"))
      .select(col("doc_id"), col("shard").as("n"))
    val moved = before.join(after, Seq("doc_id"))
      .filter(col("o") =!= col("n"))
    assert(moved.filter(col("n") =!= "E").count() == 0L,
      "a surviving shard must never gain a key on expansion")
    val total = ids.count()
    val m = moved.count()
    assert(m * 10 > total && m * 3 < total,
      s"stolen share $m/$total should be near 1/5")
    // determinism: the assignment is a pure function of the key
    val again = Curation.rendezvousShard(ids, "doc_id",
      Seq("A", "B", "C", "D")).select(col("doc_id"), col("shard").as("o2"))
    assert(before.join(again, Seq("doc_id"))
      .filter(col("o") =!= col("o2")).count() == 0L)
  }

  test("selection capstone: every pick passes all three gates and is a " +
      "true per-source DSIR top-5 among the survivors") {
    val out = graft.SparkEntry.queries("q290_selection_capstone")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) >= 400000L, "ttr gate leaked")
      assert(r.getLong(5) <= 200000L, "dup-share gate leaked")
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 5L)
    }
    // the 80%-rule disparate-impact read off q289: min/max selection rate
    val fair = graft.SparkEntry.queries("q289_filter_fairness")(spark, dir)
      .collect().map(_.getLong(3))
    assert(fair.nonEmpty && fair.min > 0L,
      "a language with zero selection rate would fail any fairness rule")
  }

  test("waterFill hand cases: level binds, full-coverage sentinel, " +
      "integer remainder reported") {
    import spark.implicits._
    def run(b: Long) = Curation.waterFill(
      Seq(("a", 1L), ("b", 5L), ("c", 10L)).toDF("src", "supply"),
      "src", "supply", b)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4))).toMap
    // budget 9: level (9-1)/2 = 4 -> alloc [1,4,4], remainder 0
    val m9 = run(9L)
    assert(m9("a") == ((1L, 1L, Some(4L), 0L)))
    assert(m9("b") == ((5L, 4L, Some(4L), 0L)))
    assert(m9("c") == ((10L, 4L, Some(4L), 0L)))
    // budget 20 covers every supply: no cap binds, level NULL, rem 4
    val m20 = run(20L)
    assert(m20.values.forall(v => v._1 == v._2 && v._3.isEmpty && v._4 == 4L))
    // budget 10: level 4 again but one unit left over — REPORTED
    val m10 = run(10L)
    assert(m10("b") == ((5L, 4L, Some(4L), 1L)))
    assert(m10.values.map(_._2).sum + 1L == 10L)
  }

  test("source gini: equal masses -> 0, [1,2,3] -> 2/9") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def gini(xs: Seq[Long]): Long = {
      val t = xs.zipWithIndex.map { case (x, i) => (s"s$i", x) }
        .toDF("source", "x")
      val w = Window.orderBy(col("x").asc, col("source").asc)
      t.withColumn("i", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("i") * col("x")).as("six"))
        .select(graft.operators.Eval.stagedPpmDiv(
          lit(2L) * col("six") - (col("n") + 1) * col("s"),
          col("n") * col("s")))
        .collect().head.getLong(0)
    }
    assert(gini(Seq(7L, 7L, 7L, 7L)) == 0L)
    assert(gini(Seq(1L, 2L, 3L)) == 222222L)
    assert(gini(Seq(1L, 1L, 1L, 97L)) > 700000L, "one dominant source")
  }
}
