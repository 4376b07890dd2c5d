package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE REHEARSAL (round-10 verdict #5): measure the sf0.1 → sf1 scaling
  * exponent of the hot query family, converting the 100 TB *arguments*
  * into a measured curve. No driver-generated sf1 exists, so the main
  * SYNTHESIZES one — 10 replicas of sf0.1's `documents`/`embeddings`
  * with structure-preserving separation, under `tmp/sf1` (gitignored):
  *
  *   - documents: replica r offsets doc_id by r·10⁷ and suffixes every
  *     whitespace token with `_r<r>` (r=0 keeps the original text), so
  *     each replica is its own disjoint sub-corpus with IDENTICAL
  *     internal statistics (same per-term df, same shingle families,
  *     same near-dup clusters) and zero cross-replica token overlap —
  *     dedup/index workloads scale their TRUE structure ×10 instead of
  *     quadratically inflating cross-replica duplicate families;
  *   - embeddings: replica r applies an ORTHOGONAL transform — rotate
  *     dimensions by 7r mod 64, then md5-derived per-(r, dim) sign flips
  *     — so every within-replica cosine is EXACTLY preserved (the
  *     cluster/density structure replicates verbatim) while
  *     cross-replica cosines concentrate near 0 in 64 dims and stay
  *     below every operating threshold.
  *
  * Timing: each hot query warms once at sf0.1, then takes the MIN of
  * `SPARK_GRAFT_CURVE_RUNS` (default 2) at sf0.1 and 1 run at sf1 (min
  * is the standard contention-robust statistic for scaling curves; the
  * load context is recorded like Bench's). Prints one JSON line with
  * per-query (t_sf01, t_sf1, exponent = log10(t1/t01)) and writes it to
  * `BENCH_SF1.json`. Exponent ≈ 1 ⇒ the plan's work scales with the
  * data; the deliberately-quadratic exact baselines (block grid) are
  * expected near 2 and named as such in SCALE.md.
  */
object ScaleCurve {

  /** The verdict's hot family: index build+serve, MinHash, CC, RRF,
    * density (exact grid + both guarded operating points), AUC.
    */
  private val hot = Seq(
    "q213_index_delta", "q214_bm25_from_index", "q23_minhash_sig",
    "q52_dedup_clusters", "q153_rrf_hybrid", "q219_auc",
    "q181_density_clusters", "q250_density_clusters_lsh",
    "q261_density_high_sim",
    // round-10 second wave: the selection family's heavier members
    "q276_dsir_importance", "q280_dup_gram_share", "q284_ktruss",
    "q290_selection_capstone",
    // round-11 (verdict #2): the expensive capstones — the suite's
    // slowest query and the calibration/audit family — were the only
    // heavy queries with no scale measurement
    "q262_takedown_capstone", "q296_simhash_calibration",
    "q234_dedup_eval",
    // round-12 (verdict #1): the ExactSubstr suffix-ordering family —
    // the suite's heaviest compute (char-row unit, O(log maxlen) keyed
    // sort rounds) joins the curve, plus the executed gram-prefilter
    // escape (q307) whose exponent vs q303's is the escape's measured
    // value
    "q298_exact_substr_coverage", "q303_exact_substr_remove",
    "q304_char_decontaminate", "q306_longest_dup_substrings",
    "q307_prefiltered_substr_remove", "q312_token_substr_coverage",
    // round-12 second wave: MP re-ranking of the LSH candidate lists —
    // the hubness correction's deployment shape at scale
    "q313_mp_knn_lsh",
    // round 13: the incremental removal — its claim IS a scale claim
    // (work ∝ the batch's duplication neighborhood, not the corpus), so
    // its exponent vs q307's full-slice rerun is the measured value
    "q315_incremental_substr_remove")

  private def md5SignFlips(r: Int, dims: Int): Array[Float] =
    Array.tabulate(dims) { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sf1:$r:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0f else -1.0f
    }

  /** CHAR-GRANULAR replica separation (round-14 verdict #1) — a
    * per-replica SUBSTITUTION CIPHER over the letter alphabet, applied
    * with one native `translate`. The round-13 measurement outgrew the
    * token-suffix transform for the ExactSubstr family, but NOT for the
    * reason first suspected: a direct measurement this round showed
    * ZERO duplicated 30-char grams span replicas on the suffixed
    * corpus — the 76–92 % changed-set blowup is entirely WITHIN-replica,
    * because `_r<r>` suffixes lengthen every token (~4 → ~7 chars), so a
    * 30-char window covers ~4 tokens instead of ~6 and short-phrase
    * collisions over this 31-word vocabulary explode (replica 0, left
    * verbatim, contributes ~73 changed docs for a 1 % batch; each
    * suffixed replica ~4,170 — 73 + 9×4170 ≈ the measured 37,731). A
    * substitution cipher fixes the mechanism itself: it is a
    * character-level ISOMORPHISM, so every replica's internal char-gram
    * equality structure — window lengths, phrase collision rates,
    * duplicate families — is EXACTLY the original corpus's (equal
    * windows stay equal, unequal stay unequal, every length unchanged),
    * while a 30-char window can only match across replicas if every
    * token in it maps onto a real token sequence under the other
    * replica's random permutation (probability ~0; replica 0 keeps the
    * identity cipher). Token-level stats survive verbatim for the same
    * reason. The suffixed corpus remains the STRESS case — its
    * corpus-sized neighborhoods caught three OOMs — and this mode is
    * the production-duplication (1–5 %) regime the incremental
    * removal's daily-ingest claim is measured on.
    */
  private def replicaCipher(r: Int): String = {
    val a = ('a' to 'z').toArray
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-cipher:$r".getBytes("UTF-8"))
    val rng = new java.util.Random(java.nio.ByteBuffer.wrap(h).getLong)
    var i = a.length - 1
    while (i >= 1) {
      val j = rng.nextInt(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    new String(a)
  }

  private def synthesize(spark: SparkSession, src: String, out: String,
      replicas: Int, charSalt: Boolean): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until replicas).map { r =>
      val text =
        if (r == 0) col("text")
        else if (charSalt)
          translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
            replicaCipher(r))
        else array_join(transform(split(col("text"), "\\s+"),
          w => concat(w, lit(s"_r$r"))), " ")
      docs.select((col("doc_id") + r.toLong * 10000000L).as("doc_id"),
          text.as("text"), col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // lineitem replicas for the co-occurrence graph family (q284):
    // offsetting BOTH the order and part key spaces per replica keeps
    // each replica's co-occurrence graph bit-identical to the original
    // and the replicas mutually disconnected — graph structure scales
    // x10 without cross-replica edges inflating triangle counts.
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until replicas).map { r =>
      li.withColumn("l_orderkey",
          col("l_orderkey") + lit(r.toLong * 1000000000L))
        .withColumn("l_partkey",
          col("l_partkey") + lit(r.toLong * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    synthesizeEmbeddings(spark, src, out, replicas)
  }

  private def synthesizeEmbeddings(spark: SparkSession, src: String,
      out: String, replicas: Int): Unit = {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dims = 64
    (0 until replicas).map { r =>
      val rot = (r * 7) % dims
      val rotated =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dims - rot),
          slice(col("embedding"), 1, rot))
      val signed =
        if (r == 0) col("embedding")
        else zip_with(rotated, lit(md5SignFlips(r, dims)),
          (x, s) => (x * s).cast("float"))
      emb.select((col("vec_id") + r.toLong * 10000000L).as("vec_id"),
        signed.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** THE PROBE-RADIUS LEG EXECUTED (round-12 verdict #6): n ≈ 200k (one
    * more decade than the sf1 curve point), the dialed radius-1 geometry
    * vs the past-cap SHAPE — 3 more bits than the dial (what radius 1
    * cannot afford: its band count grows ×(1/p)³ ≈ 3.6) with Hamming
    * radius 2 restoring the band count via the binomial-tail model
    * ([[graft.operators.Similarity.bandsAtRadius]]). Measured per
    * geometry, query-side probing over the %97 anchor slice (the serve
    * shape where radius probing lives at 100 TB — the corpus index keeps
    * ONE key per (vector, band); probes multiply only query rows):
    * recall vs the exact ≥ 0.45 ground truth, candidate rows per anchor,
    * probe keys per anchor, and the corpus-side index size. The
    * SELF-join wall is also written down as numbers: total probe rows =
    * n · bands · probeKeys if the whole corpus probes — the measured
    * reason corpus self-dedup stays at radius 1 and serves go wide.
    * One JSON line → `PROBE_LEG.json`.
    */
  private def probeLeg(spark: SparkSession, src: String): Unit = {
    import graft.operators.{Dedup, Similarity}
    graft.functions.GraftFunctions.register(spark)
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "tmp/probe200k")
    val replicas = 100
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/embeddings.parquet"))) {
      System.err.println(s"[probe] synthesizing $replicas x $src -> $out")
      synthesizeEmbeddings(spark, src, out, replicas)
    }
    val c = Similarity.prepared(
        graft.sources.Tables.embeddings(spark, out), "embedding")
      .select(col("vec_id"), col("vec"), col("nrm")).cache()
    val n = c.count()
    val anchors = c.filter(col("vec_id") % 97 === 0).cache()
    val nAnchors = anchors.count()
    System.err.println(s"[probe] n=$n anchors=$nAnchors")
    val truth = broadcast(anchors.select(col("vec_id").as("query_id"),
        col("vec").as("qv"), col("nrm").as("qn")))
      .crossJoin(c.select(col("vec_id").as("cand_id"), col("vec").as("cv"),
        col("nrm").as("cn")))
      .filter(col("query_id") =!= col("cand_id"))
      .filter(round(Similarity.cosineWithNorms(col("qv"), col("cv"),
        col("qn"), col("cn")), 6) >= 0.45)
      .select(col("query_id"), col("cand_id")).cache()
    val nTruth = truth.count()
    System.err.println(s"[probe] exact >=0.45 truth pairs: $nTruth")
    // the dialed row comes THROUGH the unified entry point (round-13
    // verdict #3): at this n it resolves to radius 1 and exactly
    // dialedBandGeometry's bits/bands, so the row doubles as the
    // continuity witness for the dial's radius-1 regime
    val (bitsDial, bandsDial, radiusDial) = Similarity.dialedGeometry(n)
    // the PAST-CAP row now also comes through the dial VERBATIM
    // (round-14 verdict #6; r12 pinned bits+3 by hand): the smallest
    // past-cap corpus size resolves to the radius-2 regime — 25 bits,
    // bandsAtRadius(25, 2) — and that exact geometry is SERVED here.
    // The dial's recall model is per-pair (a function of bits, bands,
    // radius and the similarity threshold alone, never of n), so the
    // measured recall on this corpus is the model's end-to-end check
    // even though the geometry was dialed for 2²⁷+1 vectors. The probe
    // volume at 326 masks/band is ~21x the radius-1 row's, so this row
    // serves a NARROWED anchor slice — queries are the side radius
    // probing is ALLOWED to widen (the corpus index keeps one key per
    // (vector, band)); the slice only narrows the recall estimate's
    // sample, not its expectation. Slice width (round-14 verdict #4):
    // the original 1-in-971 slice left 3 anchors / 55 truth pairs — at
    // p≈0.96, n=55 the 95% CI is ±0.05 and the 0.94 design bound sits
    // inside the noise. 1-in-29 of the anchors gives a ~20x larger
    // truth sample (>1000 pairs), putting the bound outside the CI,
    // while the probe join stays ~70 anchors x 449k keys ≈ 31M probe
    // rows — well under the corpus index's own 275M rows.
    val nPastCap = 8L * (1L << 24) + 1L
    val (bitsPC, bandsPC, radiusPC) = Similarity.dialedGeometry(nPastCap)
    val narrow = anchors.filter(col("vec_id") % 29 === 0).cache()
    val nNarrow = narrow.count()
    val truthNarrow = truth.filter(col("query_id") % 29 === 0).cache()
    val nTruthNarrow = truthNarrow.count()
    System.err.println(s"[probe] narrow anchors=$nNarrow " +
      s"truth=$nTruthNarrow; pastcap dial n=$nPastCap -> " +
      s"(bits=$bitsPC, bands=$bandsPC, radius=$radiusPC)")
    val geoms = Seq(
      ("dialed_unified", bitsDial, radiusDial, bandsDial, false),
      ("pastcap_r2", bitsDial + 3, 2,
        Similarity.bandsAtRadius(bitsDial + 3, 2), false),
      ("dialed_pastcap", bitsPC, radiusPC, bandsPC, true))
    // one loop-based rhBands expression covers ANY geometry now (the
    // plane table ships as a single codegen reference — round-15 fix);
    // the old chunked-projection-with-checkpoint-barriers workaround
    // for janino's heap died with the per-plane expression form. Same
    // global plane sequence, bit-identical band keys.
    def bandedChunked(bits: Int, bands: Int): DataFrame =
      c.withColumn("bands",
          Similarity.rhBands(col("vec"), bands * bits, bits, 64))
        .select(col("vec_id"), col("bands"))
    val rows = geoms.map { case (tag, bits, radius, bands, useNarrow) =>
      val (anch, tru, nTru, nAnch) =
        if (useNarrow) (narrow, truthNarrow, nTruthNarrow, nNarrow)
        else (anchors, truth, nTruth, nAnchors)
      val banded = bandedChunked(bits, bands)
      val qb = banded.join(anch.select(col("vec_id")), Seq("vec_id"),
        "left_semi")
      val cand = Dedup.multiProbeCandidatesFor(qb, banded, "vec_id",
        "bands", bits, radius).cache()
      val nCand = cand.count()
      val hits = cand.join(tru, Seq("query_id", "cand_id"), "left_semi")
        .count()
      // nTru == 0 would make this NaN and f"%.4f" would write the bare
      // token NaN into PROBE_LEG.json — invalid JSON (round-12 advisor).
      // An empty truth set means recall is undefined, not zero; emit
      // null and let the reader see the truth_pairs count alongside.
      val recallJson = if (nTru == 0) "null"
        else f"${hits.toDouble / nTru}%.4f"
      val recall = if (nTru == 0) Double.NaN else hits.toDouble / nTru
      val probeKeys = bands.toLong * Dedup.probeMasks(bits, radius).size
      cand.unpersist()
      System.err.println(f"[probe] $tag%-14s bits=$bits radius=$radius " +
        f"bands=$bands cand/anchor=${nCand / nAnch}%d " +
        f"probeKeys/anchor=$probeKeys%d recall=$recall%.3f " +
        f"selfJoinProbeRows=${n * probeKeys}%d")
      s""""$tag":{"bits":$bits,"radius":$radius,"bands":$bands,""" +
        s""""anchors":$nAnch,"truth_pairs":$nTru,""" +
        s""""cand":$nCand,"cand_per_anchor":${nCand / nAnch},""" +
        s""""probe_keys_per_anchor":$probeKeys,""" +
        s""""recall":$recallJson,""" +
        s""""self_join_probe_rows":${n * probeKeys},""" +
        s""""index_rows":${n * bands}}"""
    }
    val json = s"""{"metric":"probe_leg",${BoxCalib.jsonField()},""" +
      s""""n":$n,"anchors":$nAnchors,""" +
      s""""truth_pairs":$nTruth,"geometries":{${rows.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("PROBE_LEG.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
  }

  /** STREAMING-TWIN READ AMPLIFICATION (round-14 verdict #5):
    * [[graft.streaming.StreamingGramPostings.start]] serves every batch
    * off `loadPostings` — a merge-on-read over ALL committed segments —
    * so after k batches every serve pays k segment opens plus a k-wide
    * keyed re-sum. `compact` exists with a crash proof; what this leg
    * adds is the MEASURED curve: four stores with BIT-IDENTICAL content
    * (the sf0.1 corpus) split into 1 / 9 / 33 / 65 segments, the same
    * production-shaped 1 % batch served against each (the `start`
    * foreachBatch shape verbatim: pre-state postings + batch fold +
    * incremental removal), plus the merge-on-read wall alone
    * (`loadPostings` → noop) to separate the amplification term from
    * the removal's fixed floor, plus the serve against `compact`'s
    * output — the reclaim. Identical content isolates segmentation as
    * the only variable. The derived policy (the largest measured
    * segment count whose serve stays within 25 % of the single-segment
    * wall) lands in the JSON as `policy_max_segments` and in SCALE.md
    * as the compaction cadence. One JSON line → `STREAM_AMP.json`.
    */
  private def streamAmpLeg(spark: SparkSession, src: String,
      runs: Int): Unit = {
    import graft.operators.Dedup
    import graft.streaming.StreamingGramPostings
    // main() guards its env var, but the leg re-checks its own contract:
    // runs = 0 would make ts.tail.min below throw on an empty tail after
    // the expensive store builds (round-15 advisor)
    require(runs >= 1, s"streamAmpLeg needs runs >= 1, got $runs")
    val docs = graft.sources.Tables.documents(spark, src)
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()
    val batch = docs.filter(col("doc_id") % 97 === 0)
    val segCounts = Seq(1, 9, 33, 65)
    val root = s"${sys.props("java.io.tmpdir")}/graft_streamamp_" +
      ProcessHandle.current().pid()
    try {
      def timeIt(f: () => Unit): Double = {
        val ts = (0 to runs).map { _ =>
          // cold SEGMENT reads per run, but a WARM batch/docs input:
          // clearCache alone also dropped the docs cache built above, so
          // every timed serve re-scanned the source parquet — a constant
          // cost across segment counts that inflated the fixed serve
          // floor the 25 %-of-base policy is measured against, biasing
          // policy_max_segments upward (round-15 advisor). Re-materialize
          // the input cache OUTSIDE the timed region so the timer sees
          // only store reads + the serve itself.
          spark.catalog.clearCache()
          docs.cache()
          docs.write.mode("overwrite").format("noop").save()
          val t0 = System.nanoTime()
          f()
          (System.nanoTime() - t0) / 1e9
        }
        ts.tail.min
      }
      // the start() foreachBatch serve, verbatim shape
      def serve(dir: String): Unit = {
        val pre = StreamingGramPostings.loadPostings(spark, dir)
        val folded = Dedup.combineGramPostings(pre,
          Dedup.gramPostings(batch, "doc_id", "text", 30))
        val corpus = StreamingGramPostings.loadDocs(spark, dir)
          .select(col("id").as("doc_id"), col("text"))
        Dedup.exactSubstrRemoveIncremental(corpus, "doc_id", "text", 30,
            folded, batch.select(col("doc_id")))
          .write.mode("overwrite").format("noop").save()
      }
      def mergeOnly(dir: String): Unit =
        StreamingGramPostings.loadPostings(spark, dir)
          .write.mode("overwrite").format("noop").save()
      val rows = segCounts.map { k =>
        val dir = s"$root/k$k"
        if (k == 1) StreamingGramPostings.init(spark, dir, docs,
          "doc_id", "text", 30)
        else {
          // same corpus, k segments: base = even ids, the odd ids in
          // k-1 equal-width slivers — content identical at every k
          StreamingGramPostings.init(spark, dir,
            docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 30)
          (0 until k - 1).foreach { i =>
            StreamingGramPostings.foldBatch(dir,
              docs.filter(col("doc_id") % 2 === 1 &&
                pmod(col("doc_id") - 1, lit(2L * (k - 1))) === 2L * i),
              "doc_id", "text", 30, s"b$i")
          }
        }
        val nSeg = StreamingGramPostings.committedSegments(dir).size
        val tMerge = timeIt(() => mergeOnly(dir))
        val tServe = timeIt(() => serve(dir))
        System.err.println(f"[streamamp] segments=$nSeg " +
          f"t_merge=$tMerge%.2fs t_serve=$tServe%.2fs")
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(1000)
        (nSeg, tMerge, tServe)
      }
      // the reclaim: compact the most fragmented store, serve again
      val cdir = s"$root/compacted"
      StreamingGramPostings.compact(spark, s"$root/k${segCounts.max}", cdir)
      val tServeC = timeIt(() => serve(cdir))
      val base = rows.head._3
      val policy = rows.filter(_._3 <= base * 1.25).map(_._1).max
      System.err.println(f"[streamamp] compacted serve=$tServeC%.2fs " +
        s"policy_max_segments=$policy")
      val segJson = rows.map { case (k, tm, ts) =>
        f""""$k":{"t_merge":$tm%.3f,"t_serve":$ts%.3f}"""
      }.mkString("{", ",", "}")
      val json =
        s"""{"metric":"stream_amp",${BoxCalib.jsonField()},""" +
          s""""n_docs":$nDocs,"segments":$segJson,""" +
          f""""t_serve_compacted":$tServeC%.3f,""" +
          s""""policy_max_segments":$policy}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("STREAM_AMP.json"),
        (json + "\n").getBytes("UTF-8"))
      println(json)
    } finally {
      graft.operators.Dedup.deleteRecursively(new java.io.File(root))
    }
  }

  /** THE INCREMENTAL-REMOVAL LEG (round 13): q315's sf1 exponent (0.96)
    * is dominated by the PROOF query's in-query bootstrap — it builds
    * the old corpus's gram postings from scratch before saving, loading,
    * folding, and serving, which is the one-time init cost the
    * maintained artifact exists to amortize. This leg turns that named
    * cause into a measured decomposition: per scale, the postings
    * artifact is built OUTSIDE the timer, then (a) the INCREMENTAL
    * serve — load + fold the batch's postings + removal over changed ∪
    * witnesses — and (b) the FULL daily rerun a non-incremental pipeline
    * pays (the q307 lambda verbatim) are each timed. Also records the
    * changed-set size: on this deliberately duplication-fat corpus the
    * %-10 batch shares grams with most of the duplication slice, so the
    * neighborhood is large BY CONSTRUCTION — the row counts let a reader
    * see that, rather than take it on faith. One JSON line →
    * `INC_LEG.json`.
    */
  private def incLeg(spark: SparkSession, dirs: Seq[(String, String)],
      runs: Int, outFile: String): Unit = {
    import graft.operators.Dedup
    // two batch shapes per scale: the oracle-convention 10 % batch
    // (comparable to q315's proof query) and a PRODUCTION-shaped ~1 %
    // batch (%97 — the benchmark-slice convention) whose duplication
    // neighborhood should stay batch-sized even on this corpus: the
    // "daily batch ≪ corpus" claim as a measurement, not an
    // extrapolation
    val scenarios = dirs.flatMap { case (tag, dir) => Seq(
      (s"${tag}_b10", dir, (c: org.apache.spark.sql.Column) => c % 10 === 7),
      (s"${tag}_b1", dir, (c: org.apache.spark.sql.Column) => c % 97 === 0))
    }
    val rows = scenarios.map { case (tag, dir, inBatch) =>
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      val oldDocs = docs.filter(!inBatch(col("doc_id")))
      val batch = docs.filter(inBatch(col("doc_id")))
      val pdir = s"${sys.props("java.io.tmpdir")}/graft_incleg_" +
        ProcessHandle.current().pid() + "_" + tag
      try {
      // UNTIMED bootstrap: the maintained artifact, as it would already
      // exist on day N
      Dedup.saveGramPostings(
        Dedup.gramPostings(oldDocs, "doc_id", "text", 30), pdir)
      def timeIt(f: () => Unit): Double = {
        val ts = (0 to runs).map { _ => // extra first run = warmup
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          f()
          (System.nanoTime() - t0) / 1e9
        }
        ts.tail.min
      }
      def incremental(): DataFrame = Dedup.exactSubstrRemoveIncremental(
        docs, "doc_id", "text", 30,
        Dedup.combineGramPostings(Dedup.loadGramPostings(spark, pdir),
          Dedup.gramPostings(batch, "doc_id", "text", 30)),
        batch.select(col("doc_id")))
      val nChanged = incremental().count()
      val tInc = timeIt(() => incremental()
        .write.mode("overwrite").format("noop").save())
      val tFull = timeIt(() =>
        SparkEntry.queries("q307_prefiltered_substr_remove")(spark, dir)
          .write.mode("overwrite").format("noop").save())
      System.err.println(f"[incleg] $tag: n_docs=$nDocs " +
        f"n_changed=$nChanged t_inc=$tInc%.2fs t_full=$tFull%.2fs")
      // the suffix machinery checkpoints internally and relies on
      // ContextCleaner (GC-driven) to reclaim; four back-to-back
      // scenarios in one JVM accumulate dead checkpoints faster than
      // GC volunteers, and the sf1 rows inherit the debris (measured:
      // the 4-scenario leg OOM'd where the 2-scenario one fit) — force
      // the cleanup at the scenario boundary
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(1000)
      (tag, nDocs, nChanged, tInc, tFull)
      } finally {
        // the bootstrap dir is multi-GB at sf1 and its graft_incleg_
        // prefix sits OUTSIDE Tables.artifactDir's reaper — without this
        // each leg leaks four parquet trees into java.io.tmpdir
        // permanently (round-13 advisor)
        Dedup.deleteRecursively(new java.io.File(pdir))
      }
    }
    val qs = rows.map { case (tag, n, c, ti, tf) =>
      s""""$tag":{"n_docs":$n,"n_changed":$c,""" +
        f""""t_inc":$ti%.3f,"t_full":$tf%.3f}"""
    }.mkString("{", ",", "}")
    // exponents from the 10 %-batch pair (the q315-comparable shape)
    def expPair(aTag: String, bTag: String): Option[String] = for {
      a <- rows.find(_._1 == aTag)
      b <- rows.find(_._1 == bTag)
    } yield {
      val r = b._2.toDouble / a._2
      f"""{"inc":${math.log(b._4 / a._4) / math.log(r)}%.2f,""" +
        f""""full":${math.log(b._5 / a._5) / math.log(r)}%.2f}"""
    }
    val exps = expPair("sf01_b10", "sf1_b10").getOrElse("null")
    // the third-scale pair (round-14 verdict #6), when present: sf1 ->
    // the SPARK_GRAFT_REPLICAS2 corpus — both points clear of the
    // sf0.1 serve floor, so this is the honest exponent
    val hiTag = rows.map(_._1).filter(t => t.endsWith("_b10") &&
      t != "sf01_b10" && t != "sf1_b10").headOption
    val expsHi = hiTag.flatMap(expPair("sf1_b10", _)).getOrElse("null")
    // the artifact names its own confound (round-15 verdict nit): the
    // headline pair is fitted through the sf0.1 rows, where the fixed
    // load/fold serve floor dominates t_inc — only exponents_hi (both
    // points clear of the floor) is the meaningful slope
    val json =
      s"""{"metric":"inc_leg",${BoxCalib.jsonField()},"scales":$qs,""" +
        s""""exponents":$exps,"exponents_hi":$expsHi,""" +
        s""""note":"exponents is fitted across ALL scales including """ +
        s"""the sf0.1 rows, whose t_inc is dominated by the fixed """ +
        s"""load+fold serve floor — floor-confounded, kept only for """ +
        s"""continuity; exponents_hi (sf1 -> the REPLICAS2 corpus, """ +
        s"""both clear of the floor) is the meaningful slope"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    println(json)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    // char-salted corpus mode (round-14 verdict #1): SPARK_GRAFT_CHAR_SALT=1
    // synthesizes with [[charSaltToken]] and defaults the corpus dir and
    // the artifacts' names apart from the adversarial ones, so both
    // regimes coexist on disk and in the committed JSON
    val charSalt = sys.env.get("SPARK_GRAFT_CHAR_SALT").contains("1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      if (charSalt) "tmp/sf1c" else "tmp/sf1")
    val curveOut = sys.env.getOrElse("SPARK_GRAFT_CURVE_OUT",
      if (charSalt) "BENCH_SF1_CHAR.json" else "BENCH_SF1.json")
    val incOut = sys.env.getOrElse("SPARK_GRAFT_INC_OUT",
      if (charSalt) "INC_LEG_CHAR.json" else "INC_LEG.json")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_CURVE_RUNS", "2").toInt
    // 0 would run the expensive untimed bootstraps and then die computing
    // ts.tail.min on an empty sequence (round-13 advisor; Bench.scala has
    // the same guard on its env var)
    require(runs >= 1, s"SPARK_GRAFT_CURVE_RUNS must be >= 1, got $runs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) hot.filter(args.contains) else hot
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (sys.env.get("SPARK_GRAFT_PROBE_LEG").contains("1")) {
      probeLeg(spark, src)
      spark.stop()
      return
    }

    if (sys.env.get("SPARK_GRAFT_STREAM_AMP").contains("1")) {
      streamAmpLeg(spark, src, runs)
      spark.stop()
      return
    }

    if (sys.env.get("SPARK_GRAFT_INC_LEG").contains("1")) {
      // needs the synthesized sf1 (falls through to build it if absent)
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$out/lineitem.parquet")))
        synthesize(spark, src, out, replicas, charSalt)
      // round-14 verdict #6: a THIRD scale point turns the sf1
      // incremental-vs-full ratio into a trend. SPARK_GRAFT_REPLICAS2=N
      // (> replicas) synthesizes a second, larger corpus under
      // <out>_rN and appends its two batch shapes to the leg.
      val replicas2 = sys.env.getOrElse("SPARK_GRAFT_REPLICAS2", "0").toInt
      val dirs = Seq("sf01" -> src, "sf1" -> out) ++ (
        if (replicas2 > 0) {
          require(replicas2 > replicas,
            s"SPARK_GRAFT_REPLICAS2 ($replicas2) must exceed " +
              s"SPARK_GRAFT_REPLICAS ($replicas)")
          val out2 = s"${out}_r$replicas2"
          if (!java.nio.file.Files.exists(
              java.nio.file.Paths.get(s"$out2/lineitem.parquet")))
            synthesize(spark, src, out2, replicas2, charSalt)
          Seq(s"sf$replicas2" -> out2)
        } else Seq.empty)
      incLeg(spark, dirs, runs, incOut)
      spark.stop()
      return
    }

    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/lineitem.parquet"))) {
      System.err.println(s"[curve] synthesizing sf1 ($replicas x $src) -> $out" +
        (if (charSalt) " (char-salted)" else ""))
      synthesize(spark, src, out, replicas, charSalt)
    }
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$out/embeddings.parquet").count()
    System.err.println(s"[curve] sf1: $nDocs docs, $nVecs vectors")

    def runOnce(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // a single failing query must not zero the whole curve artifact
      try SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[curve] $name failed on $dir: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val rows = names.map { n =>
      runOnce(n, src) // warmup (JIT/codegen) at the small scale
      val t01 = (1 to runs).map(_ => runOnce(n, src)).min
      val t1 = runOnce(n, out)
      // t ∝ n^e  ⇒  e = log(t1/t01) / log(scale ratio)
      val exp =
        if (t01 <= 0 || t1 <= 0) Double.NaN
        else math.log(t1 / t01) / math.log(replicas.toDouble)
      System.err.println(
        f"[curve] $n%-28s sf0.1 $t01%8.2fs  sf1 $t1%8.2fs  exponent $exp%5.2f")
      // the suffix machinery checkpoints internally and relies on
      // ContextCleaner (GC-driven) to reclaim; seven back-to-back family
      // members in one JVM accumulate dead checkpoint blocks faster than
      // GC volunteers and the later sf1 rows inherit the debris (the r14
      // char-salt run died exactly this way: q303's sf1 row fell over and
      // every subsequent runOnce failed fast on the dead context) — force
      // the cleanup at the row boundary, as incLeg already does at its
      // scenario boundary
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(1000)
      (n, t01, t1, exp)
    }
    val qs = rows.map { case (n, a, b, e) =>
      val expJson = if (e.isNaN) "null" else f"$e%.2f"
      "\"" + n + f"""\":{"t_sf01":$a%.3f,"t_sf1":$b%.3f,""" +
        s""""exponent":$expJson}"""
    }.mkString("{", ",", "}")
    // candidate-pair volume at BOTH scales (round-10 verdict #1): the
    // band-geometry dial's claim is that candidates track the
    // LSH-optimal n^(1+ρ) instead of n² — record n, the dialed
    // (bits, bands), and the measured candidate-pair count per scale
    // so the claim is a number, not an argument
    // the cand stats must not zero the whole artifact when a heavy
    // query killed the context upstream (round 12: q306 at sf1 OOM'd an
    // 8g driver and the artifact write never ran — set
    // SPARK_DRIVER_MEM=24g for the suffix family); any failure here
    // yields an empty cand block and the per-query rows still persist
    val cand = Seq("sf01" -> src, "sf1" -> out).map { case (tag, dir) =>
      try {
        val (n, bits, bands, pairs) =
          graft.queries.SimilarityQueries.dialedCandidateStats(spark, dir)
        System.err.println(
          s"[curve] cand $tag: n=$n bits=$bits bands=$bands pairs=$pairs")
        s""""$tag":{"n":$n,"bits":$bits,"bands":$bands,"pairs":$pairs}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[curve] cand $tag failed: ${e.getMessage}")
          s""""$tag":null"""
      }
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"scale_curve",${BoxCalib.jsonField()},""" +
      s""""replicas":$replicas,""" +
      s""""char_salt":$charSalt,""" +
      s""""n_docs":$nDocs,"n_vecs":$nVecs,"cand":$cand,"queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(curveOut),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
