package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Invariants for span-level exact dedup (q88). */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("applyCcDelta == full rebuild on random graphs under random " +
      "base/delta splits (components only merge, never split)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 30
      val edges = (1 to 45).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val (base, delta) = edges.partition(_ => rnd.nextBoolean())
      if (base.nonEmpty && delta.nonEmpty) {
        val baseCc = Dedup.connectedComponentsStar(
          base.toDF("a", "b"), "a", "b")
        val got = Dedup.applyCcDelta(baseCc, delta.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val want = Dedup.connectedComponentsStar(
          edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"trial $trial: delta result diverged from " +
          s"rebuild\nbase=$base\ndelta=$delta")
      }
    }
  }

  test("prefixFilteredPairs is lossless: equals the brute-force all-pairs " +
      "scan on the real corpus") {
    val sh = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("tok"), 3).as("shingles"))
    val fast = Dedup.prefixFilteredPairs(sh, "doc_id", "shingles", 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(brute.nonEmpty, "fixture must exercise the join")
    assert(fast == brute)
  }

  test("prefixFilteredPairs keeps boundary pairs the size filter could " +
      "wrongly prune") {
    import spark.implicits._
    // |x|=2, |y|=4, x ⊂ y: J = 2/4 = 0.5 exactly — sits ON the threshold
    // AND on the size bound |y| = |x|/t. Must survive.
    val in = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("z", "q"))).toDF("doc_id", "s")
    val out = Dedup.prefixFilteredPairs(in, "doc_id", "s", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 0.5)))
  }

  test("weightedPrefixFilteredPairs is lossless vs the brute-force " +
      "weighted scan on the real corpus, at two thresholds") {
    import spark.implicits._
    val sh = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("tok"), 3).as("shingles"))
    // brute force sharing the operator's exact weight definition
    val tok = sh.select(col("doc_id"),
      explode(array_distinct(col("shingles"))).as("tok"))
    val n = sh.count()
    val wt = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .select(col("tok"), least(floor(lit(1000000.0) * lit(n) / col("df")),
        lit(graft.operators.TextAnalysis.RarityCap)).cast("long").as("iw"))
    val tw = tok.join(wt, Seq("tok"))
    val tot = tw.groupBy(col("doc_id")).agg(sum(col("iw")).as("w"))
    val inter = tw.select(col("doc_id").as("doc_a"), col("tok"), col("iw"))
      .join(tw.select(col("doc_id").as("doc_b"), col("tok")),
        Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("iw")).as("i"))
      .join(tot.select(col("doc_id").as("doc_a"), col("w").as("wa")), Seq("doc_a"))
      .join(tot.select(col("doc_id").as("doc_b"), col("w").as("wb")), Seq("doc_b"))
    for ((tn, td) <- Seq((1L, 2L), (7L, 10L))) {
      val fast = Dedup.weightedPrefixFilteredPairs(sh, "doc_id", "shingles",
          tn, td)
        .select("doc_a", "doc_b", "inter_w", "union_w")
        .as[(Long, Long, Long, Long)].collect().toSet
      val brute = inter
        .filter(col("i") * lit(td + tn) >= lit(tn) * (col("wa") + col("wb")))
        .select(col("doc_a"), col("doc_b"), col("i"),
          (col("wa") + col("wb") - col("i")).as("u"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(fast == brute, s"t=$tn/$td mismatch")
      if (tn == 1L) assert(fast.nonEmpty, "fixture must exercise the join")
    }
  }

  test("weightedPrefixFilteredPairs: rare shared tokens outrank an equal " +
      "count of boilerplate shared tokens") {
    import spark.implicits._
    // docs 1,2 share two RARE tokens; docs 3,4 share the two BOILERPLATE
    // tokens present in every doc. Same overlap cardinality, different
    // weighted similarity.
    val in = Seq(
      (1L, Seq("rareA", "rareB", "common1", "common2")),
      (2L, Seq("rareA", "rareB", "x1", "x2")),
      (3L, Seq("common1", "common2", "y1", "y2")),
      (4L, Seq("common1", "common2", "z1", "z2")),
      (5L, Seq("common1", "common2", "w1", "w2")))
      .toDF("doc_id", "s")
    // weights: rare df=2 -> 2.5e6, common df=5 -> 1e6, unique df=1 -> 5e6.
    // J_w(1,2) = 5/17 ~ 0.29; J_w(3,4) = 2/22 ~ 0.09; t = 1/4 splits them.
    val out = Dedup.weightedPrefixFilteredPairs(in, "doc_id", "s", 1L, 4L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)), s"rare-overlap pair missing: $out")
    assert(!out.contains((3L, 4L)),
      s"boilerplate-only overlap must fall below the weighted threshold: $out")
  }

  test("containmentJoin is lossless and one-sided: subset pairs survive " +
      "that Jaccard's size bound would discard") {
    import spark.implicits._
    // doc 1 (3 tokens) wholly inside doc 2 (12 tokens): cont(1→2) = 1.0
    // but J = 3/12 = 0.25 — the pair q151@0.5 must NOT emit
    val in = Seq(
      (1L, Seq("q", "r", "s")),
      (2L, Seq("q", "r", "s", "d", "e", "f", "g", "h", "i", "j", "k", "l")),
      (3L, Seq("x", "y", "z"))).toDF("doc_id", "s")
    val out = Dedup.containmentJoin(in, "doc_id", "s", 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 1.0)))
    assert(Dedup.prefixFilteredPairs(in, "doc_id", "s", 0.5).count() == 0)
    // corpus-level losslessness vs brute force
    val sh = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("tok"), 3).as("shingles"))
    val fast = Dedup.containmentJoin(sh, "doc_id", "shingles", 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val brute = a.crossJoin(b).filter(col("doc_a") =!= col("doc_b"))
      .filter(Dedup.containment(col("sh_a"), col("sh_b")) >= 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(brute.nonEmpty, "fixture must exercise the join")
    assert(fast == brute)
  }

  test("spanDedup: all-unique corpus passes through unchanged") {
    val in = docs(
      1L -> "a b c d e f g h i j k l",
      2L -> "m n o p q r")
    val out = Dedup.spanDedup(in, "doc_id", "text", 10)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a b c d e f g h i j k l", 2L), (2L, "m n o p q r", 1L)))
  }

  test("spanDedup: duplicated span survives only in the earliest doc") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val in = docs(
      5L -> s"$span unique tail five",
      3L -> s"$span other tail three",
      9L -> "completely different words here")
    val out = Dedup.spanDedup(in, "doc_id", "text", 10).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 3 (smallest id) keeps the shared span; doc 5 keeps only its tail
    assert(out(3L) == s"$span other tail three")
    assert(out(5L) == "unique tail five")
    assert(out(9L) == "completely different words here")
  }

  test("spanDedup: doc whose every span is a duplicate vanishes") {
    val span = (1 to 10).map(i => s"x$i").mkString(" ")
    val in = docs(1L -> span, 2L -> span)
    val out = Dedup.spanDedup(in, "doc_id", "text", 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("spanDedup: empty and whitespace-only docs emit no rows") {
    val in = docs(1L -> "", 2L -> "   ", 3L -> "real content")
    val out = Dedup.spanDedup(in, "doc_id", "text", 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("spanDedup: corpus-wide span multiset is preserved exactly once each") {
    val in = docs(
      1L -> "a b c a b c",
      2L -> "a b c d e f",
      3L -> "d e f a b c")
    val out = Dedup.spanDedup(in, "doc_id", "text", 3)
    val keptSpans = out
      .select(explode(split(col("dedup_text"), " ")).as("tok"))
      .count()
    // 6 distinct 3-token spans exist across the corpus:
    // (a b c), (d e f) at two span alignments each — dedup keeps each once
    val distinctSpans = Seq("a b c", "d e f").size
    assert(keptSpans == distinctSpans * 3L)
  }

  test("incrementalCandidatePairs: new x new and new x old form, old x old never") {
    import spark.implicits._
    // every doc shares band hash "h" in band 0 — all pairs collide
    def docs(ids: Long*) = ids.map(i => (i, Seq("h"))).toDF("id", "bands")
    val old = docs(1L, 2L)
    val neu = docs(3L, 4L)
    val got = Dedup.incrementalCandidatePairs(old, neu, "id", "bands")
      .as[(Long, Long)].collect().toSet
    // 1-2 (old x old) must be absent; every new-involving pair present
    assert(got == Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      s"got $got")
    // null band hashes never join
    val withNull = Seq((9L, Seq[String](null))).toDF("id", "bands")
    assert(Dedup.incrementalCandidatePairs(withNull, neu, "id", "bands")
      .as[(Long, Long)].collect().toSet == Set((3L, 4L)))
  }

  // The quote case Jaccard under-scores: a short token set wholly inside
  // a much larger one has containment 1.0 forward, small backward, and a
  // Jaccard equal to the size ratio.
  test("containment: asymmetric, sees full quoting; empty set scores 0") {
    import spark.implicits._
    val rows = Seq(
      (Seq("a", "b"), Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (Seq.empty[String], Seq("a")))
      .toDF("sa", "sb")
      .select(Dedup.containment(col("sa"), col("sb")).as("ab"),
        Dedup.containment(col("sb"), col("sa")).as("ba"),
        Dedup.jaccard(col("sa"), col("sb")).as("jac"))
      .as[(Double, Double, Double)].collect()
    assert(rows(0) == ((1.0, 0.25, 0.25)), s"got ${rows(0)}")
    assert(rows(1) == ((0.0, 0.0, 0.0)), s"got ${rows(1)}")
  }

  private def spanRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "start_a", "start_b", "span_len")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  // Constructed overlapping-boilerplate fixture: a 14-token boilerplate
  // block shared by two docs at different offsets must come back as ONE
  // span with the exact 14-token extent (not five fixed 10-grams), and
  // extending it by one token on either side must break the match.
  test("maximalSpans: exact variable-length extent, maximality both ends") {
    val boiler = (1 to 14).map(i => s"b$i").mkString(" ")
    val in = docs(
      1L -> s"intro one two $boiler tail1 tail2",
      2L -> s"$boiler closing words here now")
    val got = spanRows(Dedup.maximalSpans(in, "doc_id", "text", 10))
    // doc 1: boilerplate starts at token 3; doc 2: at token 0
    assert(got == Set((1L, 2L, 3L, 0L, 14L)), s"got $got")
    val text = Dedup.maximalSpans(in, "doc_id", "text", 10)
      .select("span_text").collect().head.getString(0)
    assert(text == boiler)
  }

  test("maximalSpans: exactly-10-token run reported; 9-token run is not") {
    val run10 = (1 to 10).map(i => s"r$i").mkString(" ")
    val run9 = (1 to 9).map(i => s"s$i").mkString(" ")
    val in = docs(
      1L -> s"$run10 filler also $run9 endone",
      2L -> s"prefix $run10 and $run9 endtwo")
    val got = spanRows(Dedup.maximalSpans(in, "doc_id", "text", 10))
    assert(got == Set((1L, 2L, 0L, 1L, 10L)), s"got $got")
  }

  test("maximalSpans: within-document repeat reported with doc_a == doc_b") {
    val run = (1 to 11).map(i => s"w$i").mkString(" ")
    val in = docs(1L -> s"$run middle gap words $run")
    val got = spanRows(Dedup.maximalSpans(in, "doc_id", "text", 10))
    // second occurrence starts after the 11-token run + 3 middle tokens
    assert(got == Set((1L, 1L, 0L, 14L, 11L)), s"got $got")
  }

  test("maximalSpans: no duplication -> empty; short docs emit nothing") {
    val in = docs(
      1L -> "all these words appear exactly once in this corpus today",
      2L -> "and none of them repeat across any of the two documents",
      3L -> "tiny")
    assert(Dedup.maximalSpans(in, "doc_id", "text", 10).count() == 0)
  }

  // The q217 proof within Spark, on the real corpus: the incremental
  // build over (old, new) must equal the full rebuild restricted to
  // pairs involving a new doc — including span_text and maximality —
  // and must contain NO old×old rows.
  test("incrementalMaximalSpans == full rebuild restricted to new-involving pairs") {
    val all = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val old = all.filter(col("doc_id") % 10 =!= 7)
    val fresh = all.filter(col("doc_id") % 10 === 7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val inc = Dedup.incrementalMaximalSpans(old, fresh, "doc_id", "text", 10)
    val full = Dedup.maximalSpans(all, "doc_id", "text", 10)
      .filter(col("doc_a") % 10 === 7 || col("doc_b") % 10 === 7)
    assert(rows(inc) == rows(full))
    assert(inc.filter(col("doc_a") % 10 =!= 7 && col("doc_b") % 10 =!= 7)
      .count() == 0, "old×old pair leaked into the incremental build")
    assert(inc.count() > 0, "fixture produced no new-involving spans")
  }

  test("crossDocGramShare: shared grams counted once per doc, " +
      "self-repetition never counts as cross-doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c")),      // grams {a b, b c}
      (2L, Seq("b", "c", "d")),      // grams {b c, c d} — shares "b c"
      (3L, Seq("x", "y")),           // gram {x y} — unique
      (4L, Seq("p", "q", "p", "q"))) // {p q, q p, p q} -> distinct, unique
      .toDF("doc_id", "tok")
    val got = graft.operators.Dedup.crossDocGramShare(docs, "doc_id",
        "tok", n = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((2L, 1L, 500000L)))
    assert(got(2L) == ((2L, 1L, 500000L)))
    assert(got(3L) == ((1L, 0L, 0L)))
    assert(got(4L) == ((2L, 0L, 0L)),
      "a doc repeating its own bigram must not count as shared")
  }

  test("minhash agreement estimates Jaccard: identical sets agree on " +
      "all 8 components, disjoint sets on none") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a b c", "b c d")), (2L, Seq("a b c", "b c d")),
      (3L, Seq("x y z", "y z w"))).toDF("doc_id", "shingles")
    val sigs = docs.select(col("doc_id"),
        graft.operators.Dedup.minhashSignature(col("shingles"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical shingle sets => identical sigs")
    assert(sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y } == 0,
      "disjoint small sets should agree nowhere (md5 collisions aside)")
  }

  test("quality canonical: every representative is its cluster's length " +
      "argmax, and the policy actually diverges from min-id somewhere") {
    val dir = "/root/testdata/sf0.01"
    val reps = graft.SparkEntry.queries("q295_quality_canonical")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val clusters = graft.SparkEntry.queries("q52_dedup_clusters")(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lens = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(reps.keySet == byCluster.keySet)
    reps.foreach { case (c, (rep, repLen)) =>
      val members = byCluster(c).map(_._1)
      val best = members.map(d => (lens(d), -d)).max
      assert((repLen, -rep) == best,
        s"cluster $c rep $rep is not the length argmax")
    }
    assert(reps.exists { case (c, (rep, _)) => rep != c },
      "fixture must contain a cluster where best-quality != min-id")
  }

  test("cluster transitivity: a verified chain scores 2/3, a clique 1.0") {
    import spark.implicits._
    // chain 1~2~3 (no 1~3 evidence) + clique {10,11,12} fully verified
    val pairs = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b", maxIter = 20)
      .select(col("node").as("doc_id"), col("cluster_id"))
    val sizes = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    val direct = pairs
      .join(cc.select(col("doc_id").as("doc_a"), col("cluster_id")),
        Seq("doc_a"))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_direct"))
    val got = sizes.join(direct, Seq("cluster_id"))
      .select(col("cluster_id"),
        expr("n_direct * 1000000 div (n_members * (n_members - 1) div 2)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 666666L, "the chain must be flagged below 1e6")
    assert(got(10L) == 1000000L, "the clique is fully evidenced")
  }

  test("simhash calibration is monotone: mean exact Jaccard decreases " +
      "as hamming grows on the real corpus") {
    val out = graft.SparkEntry.queries("q296_simhash_calibration")(
        spark, "/root/testdata/sf0.01")
      .groupBy(col("hamming")).agg(avg(col("jaccard_ppm")).as("mj"))
      .orderBy(col("hamming")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length >= 5)
    // identical docs collide on all bands with hamming 0 and near-1 jac
    assert(out.head._1 == 0L && out.head._2 > 950000.0)
    // weak monotone: each step down by at least -2% tolerance
    out.sliding(2).foreach { case Array((h1, j1), (h2, j2)) =>
      assert(j2 <= j1 + 20000.0,
        s"calibration not monotone at hamming $h1 -> $h2: $j1 -> $j2")
    }
  }
}
