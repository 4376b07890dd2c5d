package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.model.{Priority, Status}
import graft.operators.{AsofJoin, Dedup, IngestOps, Similarity, TextAnalysis}

/** Reference-semantics unit tests (fixtures from FIXTURES.md §A — the
  * reference's own test payloads, `/root/reference/tests/api.test.js`).
  */
class IngestOpsSpec extends SparkSpec {
  import spark.implicits._

  private def req(id: String, ids: Seq[Long], pri: String, created: String) =
    (id, ids, pri, ts(created))

  private def requestsDf(rows: (String, Seq[Long], String, java.sql.Timestamp)*) =
    rows.toSeq.toDF("ingestion_id", "ids", "priority", "created_at")

  // ---- O5 batching (reference split assert tests/api.test.js:131-133)

  test("chunkArray splits 4 ids into [1,2,3],[4]") {
    val out = requestsDf(req("a", Seq(1L, 2L, 3L, 4L), "MEDIUM", "2024-01-01 00:00:00"))
      .select(IngestOps.chunkArray(col("ids"), 3).as("b"))
      .as[Seq[Seq[Long]]].head()
    assert(out == Seq(Seq(1L, 2L, 3L), Seq(4L)))
  }

  test("explodeBatches preserves order and short last batch") {
    val out = IngestOps.explodeBatches(
      requestsDf(req("a", (1L to 7L), "HIGH", "2024-01-01 00:00:00")), 3)
      .select("batch_idx", "ids").as[(Int, Seq[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, Seq(1L, 2L, 3L)), (1, Seq(4L, 5L, 6L)), (2, Seq(7L))))
  }

  test("chunk property: concat(batches) == ids, all full except last") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val n = rnd.nextInt(20) + 1
      val bs = rnd.nextInt(4) + 1
      val ids = Seq.fill(n)(rnd.nextLong().abs)
      val batches = requestsDf(req("x", ids, "LOW", "2024-01-01 00:00:00"))
        .select(IngestOps.chunkArray(col("ids"), bs).as("b"))
        .as[Seq[Seq[Long]]].head()
      assert(batches.flatten == ids)
      assert(batches.init.forall(_.size == bs))
      assert(batches.last.size <= bs && batches.last.nonEmpty)
    }
  }

  // ---- O2 validation (tests/api.test.js:31-99)

  test("validation rejects null/empty ids and bad priority, normalizes case") {
    val df = requestsDf(
      req("ok", Seq(1L, 2L, 3L), "high", "2024-01-01 00:00:00"),
      req("no_ids", null, "HIGH", "2024-01-01 00:00:00"),
      req("empty_ids", Seq(), "HIGH", "2024-01-01 00:00:00"),
      req("bad_pri", Seq(1L), "URGENT", "2024-01-01 00:00:00"),
      req("null_pri", Seq(1L), null, "2024-01-01 00:00:00"))
    val valid = IngestOps.validRequests(df).select("ingestion_id", "priority")
      .as[(String, String)].collect().toMap
    assert(valid == Map("ok" -> "HIGH"))
    val rejected = IngestOps.rejectedRequests(df)
      .select("ingestion_id", "error").as[(String, String)].collect().toMap
    assert(rejected.keySet == Set("no_ids", "empty_ids", "bad_pri", "null_pri"))
    assert(rejected("empty_ids").contains("ids"))
    assert(rejected("bad_pri").contains("priority"))
  }

  // ---- O7/O8 priority + FIFO (tests/api.test.js:194-294)

  test("dequeue: HIGH preempts earlier MEDIUM/LOW; FIFO within priority") {
    val jobs = requestsDf(
      req("low1", Seq(1L), "LOW", "2024-01-01 00:00:00"),
      req("med1", Seq(2L), "MEDIUM", "2024-01-01 00:00:01"),
      req("med2", Seq(3L), "MEDIUM", "2024-01-01 00:00:02"),
      req("high1", Seq(4L), "HIGH", "2024-01-01 00:00:03"))
    val order = IngestOps.priorityOrder(jobs, "priority", "created_at",
      col("ingestion_id")).select("ingestion_id").as[String].collect().toSeq
    assert(order == Seq("high1", "med1", "med2", "low1"))
    val top = IngestOps.dequeue(jobs, 1, "priority", "created_at",
      col("ingestion_id")).select("ingestion_id").as[String].head()
    assert(top == "high1")
  }

  test("globalSequence assigns contiguous ranks in sort order") {
    val jobs = requestsDf(
      req("b", Seq(1L), "LOW", "2024-01-01 00:00:00"),
      req("a", Seq(1L), "HIGH", "2024-01-01 00:00:05"),
      req("c", Seq(1L), "HIGH", "2024-01-01 00:00:01"))
    val seq = IngestOps.globalSequence(
      jobs.withColumn("rank", Priority.rank(col("priority"))),
      Seq(col("rank"), col("created_at"), col("ingestion_id")))
      .select("ingestion_id", "admission_seq").as[(String, Long)].collect().toMap
    assert(seq == Map("c" -> 1L, "a" -> 2L, "b" -> 3L))
  }

  // ---- O15 stale skip

  test("staleSkip drops batches that already started") {
    val pending = Seq(("a", 0), ("a", 1), ("b", 0)).toDF("ingestion_id", "batch_idx")
    val started = Seq(("a", 0)).toDF("ingestion_id", "batch_idx")
    val left = IngestOps.staleSkip(pending, started, Seq("ingestion_id", "batch_idx"))
      .as[(String, Int)].collect().toSet
    assert(left == Set(("a", 1), ("b", 0)))
  }

  // ---- O17 rollup lattice (ingestService.js:15-35 truth table)

  test("rollup truth table incl. failed and empty request") {
    val batches = Seq(
      ("all_yts", Status.YetToStart), ("all_yts", Status.YetToStart),
      ("all_done", Status.Completed), ("all_done", Status.Completed),
      ("mixed", Status.YetToStart), ("mixed", Status.Completed),
      ("with_failed", Status.Completed), ("with_failed", Status.Failed),
      ("with_triggered", Status.Triggered), ("with_triggered", Status.YetToStart)
    ).toDF("ingestion_id", "status")
    val requests = Seq("all_yts", "all_done", "mixed", "with_failed",
      "with_triggered", "empty").toDF("ingestion_id")
    val rolled = IngestOps.rollupAgainstRequests(requests, batches)
      .as[(String, String)].collect().toMap
    assert(rolled == Map(
      "all_yts" -> Status.YetToStart,
      "all_done" -> Status.Completed,
      "mixed" -> Status.Triggered,
      "with_failed" -> Status.Triggered,
      "with_triggered" -> Status.Triggered,
      "empty" -> Status.YetToStart))
  }

  // ---- as-of join edges the driver data cannot exercise

  test("asof join: no prior row -> null; boundary tie is inclusive") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00")),  // before any right row -> null
      (2L, "u1", ts("2024-01-02 00:00:00")),  // exactly at right ts -> match
      (3L, "u2", ts("2024-01-05 00:00:00"))   // no right rows for u2 -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts("2024-01-02 00:00:00"), 42L))
      .toDF("user_id", "rts", "payload")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "rts",
      Seq("payload")).select("event_id", "payload")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(42L), 3L -> None))
  }

  // ---- text/dedup edges the corpus cannot exercise

  test("punct ratio: punctuation counts, unicode letters do not") {
    val df = Seq(("clean text here", 1), ("!!! ??? ,,,", 2),
      ("Über die Brücke ist schön", 3), ("", 4))
      .toDF("text", "id").withColumn("tok", Dedup.tokens(col("text")))
    val ratios = df.select(col("id"),
      round(TextAnalysis.punctRatio(col("text")), 2).as("pr"))
      .as[(Int, Double)].collect().toMap
    assert(ratios(1) == 0.0 && ratios(2) > 0.5)
    assert(ratios(3) == 0.0, s"unicode letters misread as punct: ${ratios(3)}")
    assert(ratios(4) == 0.0)
    // empty text -> zero tokens (not a phantom "" token)
    assert(df.filter(col("id") === 4).select(size(col("tok")))
      .head().getInt(0) == 0)
  }

  test("repetitionStats: hand-computed gram fractions; short docs drop") {
    val df = Seq(
      (1L, "a b a b a"), // grams: "a b"x2, "b a"x2 -> all duplicated
      (2L, "x y z"),     // grams: "x y", "y z"     -> none duplicated
      (3L, "solo")       // < 2 tokens -> no grams -> absent
    ).toDF("doc_id", "text").withColumn("tok", Dedup.tokens(col("text")))
    val out = TextAnalysis.repetitionStats(df, "doc_id", "tok", 2)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((4L, 1.0, 0.5)),
      2L -> ((2L, 0.0, 0.5))), s"got $out")
    // trigram variant: "a b a b a" -> "a b a"x2, "b a b"x1
    val tri = TextAnalysis.repetitionStats(df, "doc_id", "tok", 3)
      .filter(col("doc_id") === 1L)
      .as[(Long, Long, Double, Double)].head()
    assert(tri == ((1L, 3L, 0.666667, 0.666667)), s"got $tri")
  }

  test("gopherFilter: each flag fails for its targeted doc; good doc keeps") {
    val good = "the quick brown fox jumps over one lazy dog near that red barn"
    val df = Seq(
      (1L, good),                        // 13 varied tokens + stopwords -> keep
      (2L, "too short"),                 // f_len false (2 tokens)
      (3L, "a b " * 6 + "a b"),          // 1-char words, all-dup bigrams
      (4L, good.replace("the ", "zz "))  // no stopword -> f_stop false
    ).toDF("doc_id", "text").withColumn("tok", Dedup.tokens(col("text")))
    val out = TextAnalysis.gopherFilter(df, "doc_id", "tok")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true, true)), s"${out(1L)}")
    assert(!out(2L)._2 && !out(2L)._7, s"short doc: ${out(2L)}")    // f_len
    assert(!out(3L)._3 && !out(3L)._5, s"repetitive: ${out(3L)}")   // f_wordlen, f_dup
    assert(!out(4L)._4 && !out(4L)._7, s"no stopword: ${out(4L)}")  // f_stop

    // no-gram docs pass the repetition flags VACUOUSLY: a clean 1-token
    // doc must be keepable when minTokens admits it
    val one = TextAnalysis.gopherFilter(
      Seq((9L, "the")).toDF("doc_id", "text")
        .withColumn("tok", Dedup.tokens(col("text"))),
      "doc_id", "tok", minTokens = 1L)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    assert(one == ((9L, true, true, true, true, true, true)), s"got $one")
  }

  test("statistical modeling: rarity, tfidf, bigram LM on a tiny corpus") {
    val df = Seq((1L, "a a b"), (2L, "b c"))
      .toDF("doc_id", "text").withColumn("tok", Dedup.tokens(col("text")))

    // N=5; freq a=2 b=2 c=1 -> scaled 2.5e6 / 2.5e6 / 5e6
    val rarity = TextAnalysis.rarityScore(df, "doc_id", "tok")
      .as[(Long, Long, Double)].collect().toSet
    assert(rarity == Set((1L, 3L, 2.5), (2L, 2L, 3.75)), s"got $rarity")

    // n_docs=2; idf a=2e6 b=1e6 c=2e6; scores (1,a)=4e6 (1,b)=1e6
    // (2,c)=2e6 (2,b)=1e6
    val tfidf = TextAnalysis.tfidfTopTerms(df, "doc_id", "tok", 2)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(tfidf == Set((1L, "a", 1L, 4000000L), (1L, "b", 2L, 1000000L),
      (2L, "c", 1L, 2000000L), (2L, "b", 2L, 1000000L)), s"got $tfidf")

    // bigrams (a,a)=1 (a,b)=1 (b,c)=1; prefix a=2 b=1
    val lm = TextAnalysis.bigramModel(df, "tok", 1)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(lm == Set(("a", "a", 1L, 2L, 500000L), ("a", "b", 1L, 2L, 500000L),
      ("b", "c", 1L, 1L, 1000000L)), s"got $lm")

    // minCount prunes BEFORE the prefix marginal (pruned-model convention)
    val pruned = TextAnalysis.bigramModel(
      Seq((3L, "x y x y x z")).toDF("doc_id", "text")
        .withColumn("tok", Dedup.tokens(col("text"))), "tok", 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // bigrams: (x,y)=2 (y,x)=2 (x,z)=1 -> (x,z) pruned, prefix x=2 not 3
    assert(pruned == Set(("x", "y", 2L, 2L, 1000000L),
      ("y", "x", 2L, 2L, 1000000L)), s"got $pruned")

    // apply side: doc1 (a,a)+(a,b) both cond 0.5 -> avg 0.5, full coverage;
    // doc2 (b,c) cond 1.0. Empty model -> all unknown, scores 0.
    val score = TextAnalysis.bigramScore(df, "doc_id", "tok",
      TextAnalysis.bigramModel(df, "tok", 1))
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(score == Set((1L, 2L, 2L, 1.0, 0.5), (2L, 1L, 1L, 1.0, 1.0)),
      s"got $score")
    val unknown = TextAnalysis.bigramScore(df, "doc_id", "tok",
      TextAnalysis.bigramModel(df, "tok", 99))
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(unknown == Set((1L, 2L, 0L, 0.0, 0.0), (2L, 1L, 0L, 0.0, 0.0)),
      s"got $unknown")
  }

  test("hashedFeatures: md5 recipe, multiset-invariant, bridges to cosine") {
    val df = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "gamma alpha beta alpha"), // same multiset, different order
      (3L, "delta epsilon zeta")
    ).toDF("doc_id", "text").withColumn("tok", Dedup.tokens(col("text")))
    val f = TextAnalysis.hashedFeatures(df, "doc_id", "tok", 16)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(f(1L) == f(2L), s"order must not matter: ${f(1L)} vs ${f(2L)}")
    // recompute doc 1's full sparse vector from the md5 recipe in plain
    // Scala (per-token bucket + sign, summed, zeros dropped)
    def bs(term: String): (Long, Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(0, 8), 16) % 16,
        if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L)
    }
    val expected = Seq("alpha", "beta", "gamma", "alpha").map(bs)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap
    assert(f(1L) == expected, s"got ${f(1L)}, want $expected")
    // dense assembly plugs into the Similarity stack
    def dense(id: Long) = Array.tabulate(16)(b => f(id).getOrElse(b.toLong, 0L).toDouble)
    val vecs = Seq((1L, dense(1L)), (3L, dense(3L))).toDF("vec_id", "embedding")
    val c = graft.operators.Similarity.prepared(vecs, "embedding")
    val self = c.as("a").crossJoin(c.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(graft.operators.Similarity.cosineWithNorms(col("a.vec"),
          col("b.vec"), col("a.nrm"), col("b.nrm")), 6).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(self((1L, 1L)) == 1.0)
    assert(self((1L, 3L)) < 1.0, s"disjoint docs must not be identical: $self")
  }

  test("funnel: order matters; an equal timestamp is not 'after'") {
    val ev = Seq(
      ("u1", "signup", ts("2024-01-01 00:00:00")),
      ("u1", "view", ts("2024-01-01 00:01:00")),
      ("u1", "click", ts("2024-01-01 00:02:00")),
      ("u2", "view", ts("2024-01-01 00:00:00")), // view BEFORE signup
      ("u2", "signup", ts("2024-01-01 00:01:00")),
      ("u3", "signup", ts("2024-01-01 00:00:00")),
      ("u3", "view", ts("2024-01-01 00:00:00")) // same instant: excluded
    ).toDF("user_id", "event_type", "ts")
    val out = graft.operators.EventTime
      .funnel(ev, "user_id", "event_type", "ts", Seq("signup", "view", "click"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "signup", 3L), (2L, "view", 1L), (3L, "click", 1L)),
      s"got $out")
  }

  test("funnel with conversion window: the window bounds each HOP, not " +
    "the whole journey; boundary is inclusive; greedy anchor is binding") {
    val ev = Seq(
      // u1 converts: each hop exactly at the 60s window edge (inclusive)
      ("u1", "signup", ts("2024-01-01 00:00:00")),
      ("u1", "view", ts("2024-01-01 00:01:00")),
      ("u1", "click", ts("2024-01-01 00:02:00")),
      // u2's view misses the 60s window by one second
      ("u2", "signup", ts("2024-01-01 00:00:00")),
      ("u2", "view", ts("2024-01-01 00:01:01")),
      ("u2", "click", ts("2024-01-01 00:01:30")),
      // u3: two views; the GREEDY anchor (first view, in-window) leaves
      // the click out of range even though view#2 would have caught it —
      // pins the documented earliest-qualifying semantics
      ("u3", "signup", ts("2024-01-01 00:00:00")),
      ("u3", "view", ts("2024-01-01 00:00:10")),
      ("u3", "view", ts("2024-01-01 00:00:50")),
      ("u3", "click", ts("2024-01-01 00:01:30"))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.operators.EventTime
      .funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "view", "click"), maxGapSec = Some(60L))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "signup", 3L), (2L, "view", 2L), (3L, "click", 1L)),
      s"got $out")
    // None reproduces the unbounded funnel exactly
    val unbounded = graft.operators.EventTime
      .funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "view", "click"), maxGapSec = None)
      .as[(Long, String, Long)].collect().toSet
    assert(unbounded ==
      Set((1L, "signup", 3L), (2L, "view", 3L), (3L, "click", 3L)))
  }

  test("langId votes for german markers; und on no hits") {
    val df = Seq(("der hund und die katze ist", 1), ("zzz qqq", 2))
      .toDF("text", "id").withColumn("tok", Dedup.tokens(col("text")))
    val out = df.select(col("id"), TextAnalysis.langId(col("tok")))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "de", 2 -> "und"))
  }

  test("asof forward: boundary tie inclusive; no later row -> null; null time -> null") {
    val left = Seq(
      (1L, "u1", Option(ts("2024-01-02 00:00:00"))), // == right ts -> match
      (2L, "u1", Option(ts("2024-01-03 00:00:00"))), // after all rights -> null
      (3L, "u1", Option.empty[java.sql.Timestamp])   // null time -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts("2024-01-02 00:00:00"), 42L),
      ("u1", ts("2024-01-01 00:00:00"), 7L))
      .toDF("user_id", "rts", "payload")
    val out = AsofJoin.forward(left, right, Seq("user_id"), "ts", "rts",
      Seq("payload")).select("event_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(42L), 2L -> None, 3L -> None))
  }

  test("asof rejects reserved and colliding column names") {
    val left = Seq((1L, "u", ts("2024-01-01 00:00:00")))
      .toDF("id", "user_id", "ts")
    val right = Seq(("u", ts("2024-01-01 00:00:00"), 1L))
      .toDF("user_id", "rts", "id")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right, Seq("user_id"), "ts", "rts", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left.withColumn("_t", lit(1)), right,
        Seq("user_id"), "ts", "rts", Seq("rts"))
    }
  }

  test("connectedComponents: chain, clique, pair -> min-id clusters") {
    // chain 1-2-3, clique 10-11-12 (all pairs), pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (21L, 20L)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(pairs, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents refuses to return wrong clusters past maxIter") {
    val chain = (1L to 12L).sliding(2).map(p => (p.head, p.last)).toSeq
      .toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, "src", "dst", maxIter = 3)
    }
    // and converges fine when given enough rounds
    val ok = Dedup.connectedComponents(chain, "src", "dst", maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L))
  }

  test("connectedComponentsStar: chain, clique, pair, self-loop -> " +
      "identical clusters to neighbor-min CC") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (21L, 20L), (30L, 30L)).toDF("src", "dst")
    val star = Dedup.connectedComponentsStar(pairs, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L))
  }

  test("connectedComponentsStar converges on a diameter-40 chain well " +
      "under the diameter (the O(log n) claim) and matches neighbor-min") {
    val chain = (1L to 41L).sliding(2).map(p => (p.head, p.last)).toSeq
      .toDF("src", "dst")
    // neighbor-min needs ~40 rounds for this graph; star needs O(log 41)
    val star = Dedup.connectedComponentsStar(chain, "src", "dst", maxIter = 8)
      .as[(Long, Long)].collect().toMap
    assert(star.keySet == (1L to 41L).toSet && star.values.toSet == Set(1L))
  }

  test("connectedComponentsStar equals connectedComponents on random " +
      "graphs at any parallelism") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 3).foreach { _ =>
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val df = edges.toDF("src", "dst").repartition(7)
      val a = Dedup.connectedComponents(df, "src", "dst", maxIter = 50)
        .as[(Long, Long)].collect().toMap
      val b = Dedup.connectedComponentsStar(df, "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(a == b)
    }
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"), Seq("x y z")))
      .toDF("s1", "s2", "s3")
    val Row(j1: Double, j2: Double) = df.select(
      Dedup.jaccard(col("s1"), col("s2")), Dedup.jaccard(col("s1"), col("s3"))).head()
    assert(j1 == 1.0 && j2 == 0.0)
  }

  test("cosine: identical=1, orthogonal=0") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 2.0)))
      .toDF("a", "b", "c")
    val Row(c1: Double, c2: Double) = df.select(
      round(Similarity.cosine(col("a"), col("b")), 9),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(c1 == 1.0 && c2 == 0.0)
  }
}
