package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** BPE trainer checks: a hand-computed corpus, an independent in-memory
  * reference trainer run against the real corpus (the oracle stand-in for
  * the iterative rewrite no single SQL query can express), and segmenter
  * consistency.
  */
class TextSpec extends SparkSpec {

  import spark.implicits._

  test("q189 corpus encode: Spark bpeSegment == independent in-memory " +
      "rewrite chain for every distinct word of the real corpus") {
    val t = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tok", Dedup.tokens(col("text")))
    val merges = TextAnalysis.bpeMerges(t, "tok", 12)
      .orderBy(col("iteration"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val got = t.select(explode(col("tok")).as("word")).distinct()
      .withColumn("syms", TextAnalysis.bpeSegment("word", merges))
      .select(col("word"), concat_ws("|", col("syms")))
      .as[(String, String)].collect().toMap
    // the same rewrite the trainer spec uses, replayed per word
    def rewrite(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var last: Option[String] = None
      syms.foreach { x =>
        if (last.contains(a) && x == b) { last = Some(a + b) }
        else { last.foreach(out += _); last = Some(x) }
      }
      last.foreach(out += _)
      out.result()
    }
    got.keys.foreach { w =>
      val ref = merges.foldLeft(w.map(_.toString).toVector) {
        case (s, (a, b)) => rewrite(s, a, b)
      }
      assert(got(w) == ref.mkString("|"),
        s"word '$w': spark=${got(w)} ref=${ref.mkString("|")}")
    }
  }

  test("proximityPairs matches brute force on the real corpus (bin-join " +
      "losslessness) and on a window-boundary fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextAnalysis.proximityPairs(docs, "doc_id", "text",
        "hash", "data", window = 5)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expect = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().flatMap { case (id, text) =>
        val tok = text.trim.split("\\s+").filter(_.nonEmpty)
        val pa = tok.zipWithIndex.collect { case ("hash", i) => i.toLong }
        val pb = tok.zipWithIndex.collect { case ("data", i) => i.toLong }
        val pairs = for (a <- pa; b <- pb if math.abs(a - b) <= 5)
          yield math.abs(a - b)
        if (pairs.isEmpty) None
        else Some(id -> ((pairs.length.toLong, pairs.min)))
      }.toMap
    assert(got == expect)
    assert(got.nonEmpty, "fixture terms produced no matches — pick new terms")
    // boundary: distance EXACTLY window qualifies, window+1 does not
    val edge = Seq((1L, "hash x x x x data"), (2L, "hash x x x x x data"))
      .toDF("doc_id", "text")
    val e = TextAnalysis.proximityPairs(edge, "doc_id", "text",
        "hash", "data", window = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(e == Map(1L -> ((1L, 5L))))
  }

  /** Independent reference BPE trainer (plain Scala, no Spark): classic
    * Sennrich counting — pair frequencies weighted by word frequency,
    * overlapping occurrences counted, merges applied greedily
    * left-to-right, ties broken (count desc, a asc, b asc).
    */
  private def refBpe(words: Map[String, Long],
      n: Int): Seq[(Long, String, String, Long)] = {
    def rewrite(syms: Vector[String], a: String,
        b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var last: Option[String] = None
      syms.foreach { x =>
        if (last.contains(a) && x == b) { last = Some(a + b) }
        else { last.foreach(out += _); last = Some(x) }
      }
      last.foreach(out += _)
      out.result()
    }
    var vocab = words.toVector.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((i + 1L, a, b, c))
        vocab = vocab.map { case (syms, f) => (rewrite(syms, a, b), f) }
      }
      i += 1
    }
    merges.result()
  }

  /** In-memory mirror of [[TextAnalysis.bpeMergesBatched]]: same candidate
    * ordering and window (batchSize·4), same symbol-disjointness
    * acceptance, same chained left-to-right rewrite per round.
    */
  private def refBpeBatched(words: Map[String, Long], n: Int,
      batchSize: Int): Seq[(Long, String, String, Long)] = {
    val window = batchSize * 4
    def rewrite(syms: Vector[String], a: String,
        b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var last: Option[String] = None
      syms.foreach { x =>
        if (last.contains(a) && x == b) { last = Some(a + b) }
        else { last.foreach(out += _); last = Some(x) }
      }
      last.foreach(out += _)
      out.result()
    }
    var vocab = words.toVector.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val top = counts.toVector
          .sortBy { case ((a, b), c) => (-c, a, b) }.take(window)
        val want = math.min(batchSize, n - i)
        val used = scala.collection.mutable.Set.empty[String]
        val batch = Vector.newBuilder[(String, String, Long)]
        var taken = 0
        val it = top.iterator
        while (taken < want && it.hasNext) {
          val ((a, b), c) = it.next()
          if (!used(a) && !used(b) && !used(a + b)) {
            batch += ((a, b, c)); used += a; used += b; used += (a + b)
            taken += 1
          }
        }
        val accepted = batch.result()
        accepted.zipWithIndex.foreach { case ((a, b, c), j) =>
          merges += ((i + j + 1L, a, b, c))
        }
        vocab = vocab.map { case (syms, f) =>
          (accepted.foldLeft(syms) { case (s, (a, b, _)) =>
            rewrite(s, a, b) }, f)
        }
        i += accepted.size
      }
    }
    merges.result()
  }

  test("bpeMergesBatched == in-memory batched reference at 120 merges, " +
      "batch 8 (one driver round trip per ~8 merges)") {
    // the corpus's closed word vocabulary fully fuses after 89 merges, so
    // train char-level over whole documents (each doc one long "word",
    // tokens joined by "_") — the merge space is then effectively
    // unbounded and 120 merges genuinely exercises the batching
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tok",
        array(concat_ws("_", Dedup.tokens(col("text")))))
    val words = toks.select(explode(col("tok")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpeBatched(words, 120, 8)
    val got = TextAnalysis.bpeMergesBatched(toks, "tok", 120, 8)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got.size >= 100, s"corpus exhausted at ${got.size} merges")
    assert(got == want,
      s"first divergence: ${got.zip(want).indexWhere(p => p._1 != p._2)}")
    // batched-greedy vs fully-sequential: a DIFFERENT documented order —
    // measure the agreement rather than pretend equality (the first
    // merges of any corpus are the high-count ones where the orders
    // coincide; divergence creeps in from batch-created pairs)
    val seq = refBpe(words, 120).map(m => (m._2, m._3)).toSet
    val agree = got.map(m => (m._2, m._3)).toSet
    info(f"batched/sequential merge-set agreement: " +
      f"${(seq & agree).size.toDouble / seq.size}%.3f at 120 merges")
  }

  test("bpeMergesBatched with batchSize=1 degenerates to bpeMerges exactly") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tok", Dedup.tokens(col("text")))
    val got = TextAnalysis.bpeMergesBatched(toks, "tok", 12, 1)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val want = TextAnalysis.bpeMerges(toks, "tok", 12)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("bpeMerges: hand-computed merges, overlap counting, early exhaustion") {
    // vocab {aaab: 2, ab: 1}:
    //   round 1: (a,a) appears twice per aaab (overlap counted) -> cnt 4
    //   round 2: (a,b) in [aa,a,b]x2 and [a,b] -> cnt 3
    //   round 3: (aa,ab) -> cnt 2; then no pairs remain -> stops at 3 rows
    val docs = Seq(Seq("aaab", "aaab", "ab")).toDF("tok")
    val got = TextAnalysis.bpeMerges(docs, "tok", 10)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)),
      s"got ${got.toSeq}")
  }

  test("bpeMerges matches the independent reference trainer on the corpus") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tok", Dedup.tokens(col("text")))
    val words = toks.select(explode(col("tok")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(words, 12)
    val got = TextAnalysis.bpeMerges(toks, "tok", 12)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"spark=$got\nref=$want")
  }

  test("bpeSegment replays training merges: trained words re-fuse, rest split") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = Seq("aaab", "ab", "ba", "xaab")
      .toDF("w")
      .select(col("w"), TextAnalysis.bpeSegment("w", merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("aaab") == List("aaab"))      // full merge chain applies
    assert(out("ab") == List("ab"))          // round-2 merge applies
    assert(out("ba") == List("b", "a"))      // no merge matches
    assert(out("xaab") == List("x", "aa", "b")) // (a,a) fuses; "aab" != ab
  }

  // BM25 behavioral pins on a hand-built corpus: term frequency raises
  // the score, document length lowers it, and a rarer term out-scores a
  // common one in the same document (idf ordering).
  test("bm25TopDocs: tf monotone, length-normalized, idf-ordered") {
    val docs = Seq(
      (1L, "a a b c"),            // tf(a)=2, dl=4
      (2L, "a b c d"),            // tf(a)=1, dl=4
      (3L, "a x y z w v u t s r q p"), // tf(a)=1, dl=12
      (4L, "b c d e"))            // no 'a'; makes df(a)=3 of 4
      .toDF("doc_id", "text")
      .withColumn("tok", Dedup.tokens(col("text")))
    val qterms = Seq("a", "x").toDF("term") // x is a hapax: rarer than a
    val out = TextAnalysis.bm25TopDocs(docs, "doc_id", "tok", qterms, 10)
      .select("term", "doc_id", "score").as[(String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 1L)) > out(("a", 2L)), "higher tf must score higher")
    assert(out(("a", 2L)) > out(("a", 3L)), "longer doc must score lower")
    assert(out(("x", 3L)) > out(("a", 3L)),
      "rarer term must out-score common term in the same doc")
    assert(!out.contains(("a", 4L)), "doc without the term must not appear")
  }

  test("phraseSearch: adjacency exact, boundaries, repeats, no partials") {
    val docs = Seq(
      (1L, "hash join hash join"),    // 2 occurrences
      (2L, "fast  hash   join scan"), // whitespace runs still adjacent
      (3L, "hash joins"),             // partial word must not match
      (4L, "join hash"),              // wrong order
      (5L, "hash join"),              // whole doc is the phrase
      (6L, "  hash join  "),          // leading/trailing whitespace
      (7L, "hash x join"),            // gap breaks adjacency
      (8L, "")).toDF("doc_id", "text")
    val got = TextAnalysis
      .phraseSearch(docs, "doc_id", "text", Seq("hash", "join"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 5L -> 1L, 6L -> 1L))

    // repeated-word phrase: "join join" in "join join join" occurs at
    // positions (0,1) and (1,2) — the anchor intersection must find both
    val rep = TextAnalysis.phraseSearch(
      Seq((1L, "join join join")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("join", "join"))
      .as[(Long, Long)].collect().toMap
    assert(rep == Map(1L -> 2L))

    // single-term phrase degenerates to plain term occurrence counting
    val single = TextAnalysis.phraseSearch(docs, "doc_id", "text",
      Seq("hash"))
      .as[(Long, Long)].collect().toMap
    assert(single == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 7L -> 1L))
  }

  test("booleanRetrieval: AND semantics, occurrence totals, duplicates") {
    val docs = Seq(
      (1L, "hash join scan"),        // all three, 3 hits
      (2L, "hash hash join scan x"), // duplicate term still one distinct
      (3L, "hash join"),             // missing 'scan'
      (4L, "scan scan scan"),        // only one term
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.booleanRetrieval(docs, "doc_id", "text",
      Seq("hash", "join", "scan"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 4L))
    intercept[IllegalArgumentException] {
      TextAnalysis.booleanRetrieval(docs, "doc_id", "text",
        Seq("hash", "hash"))
    }
  }

  test("Misra-Gries confirmed heavy hitters equal the exact set at any " +
    "partitioning, with bounded candidate width") {
    // Zipf-ish: token t_i appears 600/i times for i in 1..40 → n = Σ …;
    // heavy set for φ=1/30 is whatever clears n/30, computed exactly below
    val items = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"t$i"))
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = exact.filter { case (_, c) => c * 30L > n }
    assert(want.nonEmpty && want.size < 10, s"fixture sanity: ${want.size}")
    for (parts <- Seq(1, 4, 13)) {
      val tk = items.toDF("token").repartition(parts)
      val mg = new graft.functions.MisraGriesAggregator(29)
      val summary = tk.as[String].groupByKey(_ => 0)
        .agg(mg.toColumn.name("mg")).toDF("g", "mg")
      val cand = summary.select(
        explode(map_keys(col("mg.counts"))).as("token"),
        col("mg.n").as("total"))
      assert(cand.count() <= 29, "summary must never exceed m counters")
      val got = tk.join(broadcast(cand), Seq("token"))
        .groupBy(col("token"), col("total"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") * lit(30L) > col("total"))
        .select(col("token"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("CountMin sketch never undercounts and is partition-invariant") {
    import spark.implicits._
    import graft.functions.{CountMin, CountMinAggregator}
    val rnd = new scala.util.Random(13)
    val items = (1 to 3000).map(_ => s"tok${rnd.nextInt(80)}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def sketch(parts: Int) = items.toDF("t").repartition(parts)
      .as[String].groupByKey(_ => 0)
      .agg(new CountMinAggregator(4, 256).toColumn.name("sk"))
      .collect().head._2
    val sk = sketch(1)
    // one-sided error: estimate >= exact for EVERY key
    exact.foreach { case (t, n) =>
      assert(CountMin.estimate(sk.table, 4, 256, t) >= n, t) }
    assert(sk.n == 3000L)
    // pointwise-add merge: the grid is bit-identical under any partitioning
    val sk7 = sketch(7)
    assert(java.util.Arrays.equals(sk.table, sk7.table) && sk7.n == sk.n,
      "CMS must be partition-invariant, unlike MG")
    // threshold prefilter keeps every true heavy hitter
    val thresh = 50L
    val heavy = exact.filter(_._2 >= thresh).keySet
    val kept = exact.keySet.filter(t =>
      CountMin.estimate(sk.table, 4, 256, t) >= thresh)
    assert(heavy.subsetOf(kept), "no false negatives")
  }

  test("ERR arithmetic: lcm(1..10)*2^10 scaling is exact for hand cases") {
    // relevant at ranks 1 and 3: ERR = 1/2 + (1/3)(1/4) = 7/12
    val num = 2580480L / (1L * 2L) + 2580480L / (3L * 4L)
    assert(num == 1505280L)
    assert(num * 1000000L / 2580480L == 583333L)
    // all-10-relevant: ERR = sum 1/(i*2^i) -> the ln(2) series prefix
    val full = (1 to 10).map(i => 2580480L / (i.toLong * (1L << i))).sum
    assert(full == 1788440L) // matches q243's observed err_num
    assert((1 to 10).forall(i => 2580480L % (i.toLong * (1L << i)) == 0L),
      "every cascade term must divide the scaling constant exactly")
  }

  test("clusterTermLift hand case: over-represented terms rank first, " +
      "minCount suppresses rare terms") {
    // cluster 10 tokens {x,x,x,y}, cluster 20 {y,y,y,z}; corpus
    // x:3 y:4 z:1 of 8. lift(10,x) = (3e9 div 4)*1e6 div (3e9 div 8)
    // = 2e6; lift(10,y) = 5e5; lift(20,y) = 1.5e6; lift(20,z) = 2e6.
    val assign = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "cell")
    val docs = Seq(
      (1L, Seq("x", "x", "x", "y")), (2L, Seq("y", "y", "y", "z")))
      .toDF("doc_id", "tok")
    val got = TextAnalysis.clusterTermLift(assign, docs, "doc_id", "tok",
        "cell", topK = 2, minCount = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((10L, 1L)) == (("x", 3L, 2000000L)))
    assert(got((10L, 2L)) == (("y", 1L, 500000L)))
    assert(got((20L, 1L)) == (("z", 1L, 2000000L)))
    assert(got((20L, 2L)) == (("y", 3L, 1500000L)))
    // minCount = 3 drops the hapax terms entirely
    val pruned = TextAnalysis.clusterTermLift(assign, docs, "doc_id",
        "tok", "cell", topK = 2, minCount = 3L)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(pruned == Set((10L, "x"), (20L, "y")))
  }

  test("lexicalDiversity hand case: ttr/hapax/simpson exact, " +
      "single-token doc yields NULL simpson") {
    val docs = Seq((1L, Seq("a", "a", "b")), (2L, Seq("x")))
      .toDF("doc_id", "tok")
    val got = TextAnalysis.lexicalDiversity(docs, "doc_id", "tok")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) == ((3L, 2L, 1L)))
    assert(d1.getLong(4) == 666666L) // ttr 2/3
    assert(d1.getLong(5) == 500000L) // hapax 1/2
    assert(d1.getLong(6) == 333333L) // simpson 2/6
    val d2 = got(2L)
    assert(d2.getLong(4) == 1000000L && d2.getLong(5) == 1000000L)
    assert(d2.isNullAt(6), "simpson is 0/0 on a single token")
  }
}
