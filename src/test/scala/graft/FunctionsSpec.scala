package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{GraftExtensions, GraftFunctions}

/** Native Catalyst function registration + both evaluation paths. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot: SQL surface, null safety, mismatch/null-element -> NULL") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1d,2d,3d), array(4d,5d,6d)) d")
      .head().getDouble(0) == 32.0)
    assert(spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1d)) d")
      .head().isNullAt(0))
    // mismatched lengths and null elements poison to NULL (same as the
    // aggregate(zip_with(...)) HOF form), never a truncated partial sum
    assert(spark.sql("SELECT graft_dot(array(1d,2d), array(3d)) d")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT graft_dot(array(1d, CAST(NULL AS DOUBLE)), array(2d,3d)) d")
      .head().isNullAt(0))
  }

  test("graft_dot through whole-stage codegen over column data") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0)), (Seq(0.5, 0.5), Seq(2.0, 2.0)))
      .toDF("a", "b")
    val out = df.selectExpr("graft_dot(a, b) AS d").as[Double].collect().toSeq
    assert(out == Seq(11.0, 2.0))
  }

  test("graft_zorder SQL form equals the Column builder bit-for-bit") {
    GraftFunctions.register(spark)
    // known value: x=3 (bits at 0,2), y=5 (bits at 1,5) -> 39
    assert(spark.sql("SELECT graft_zorder(3, 3L, 5L) z").head().getLong(0) == 39L)
    val df = (1L to 200L).map(i => (i, (i * 37) % 97)).toDF("x", "y")
    val viaSql = df.selectExpr("x", "graft_zorder(8, x, y) AS z")
    val viaCol = df.select(org.apache.spark.sql.functions.col("x"),
      graft.operators.Relational.zorderValue(
        Seq(org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y")), 8).as("z"))
    assert(viaSql.except(viaCol).isEmpty && viaCol.except(viaSql).isEmpty)
    // bits must be a literal (it shapes the expression tree)
    val ex = intercept[Exception](spark.sql("SELECT graft_zorder(x, x, x) FROM VALUES (1L) t(x)").collect())
    assert(ex.getMessage.contains("literal") || ex.getMessage.contains("graft_zorder"))
  }

  test("graft_simhash60 equals the HOF vote-fold formulation bit-for-bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random hash arrays of varying length, 60-bit range
    val df = (1L to 300L).map { i =>
      (i, (0 until (i % 7 + 1).toInt).map(j =>
        ((i * 2654435761L + j * 40503L) & ((1L << 60) - 1))))
    }.toDF("id", "hashes")
    val viaExpr = df.select(col("id"),
      call_function("graft_simhash60", col("hashes")).as("s"))
    val idx = sequence(lit(0), lit(59))
    val votes = aggregate(col("hashes"), array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, idx,
        (a, j) => a + call_function("shiftright", h, j).bitwiseAND(lit(1L)) * 2 - 1))
    val viaHof = df.select(col("id"),
      aggregate(zip_with(votes, idx,
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
        lit(0L), _ + _).as("s"))
    assert(viaExpr.except(viaHof).isEmpty && viaHof.except(viaExpr).isEmpty,
      "native simhash must be bit-identical to the HOF fold")
    // null element poisons to NULL; empty array -> 0 (no majority anywhere)
    assert(spark.sql("SELECT graft_simhash60(array(1L, CAST(NULL AS BIGINT)))")
      .head().isNullAt(0))
    assert(spark.sql("SELECT graft_simhash60(CAST(array() AS ARRAY<BIGINT>))")
      .head().getLong(0) == 0L)
  }

  test("GraftExtensions wires injection without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("graft_pq_encode / graft_pq_qtab equal an in-memory reference on " +
    "pseudo-random lattices (codegen path), null/short poison") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val subspaces = 4
    val codewords = 5
    val sub = 3
    val dims = subspaces * sub
    // deterministic pseudo-random codebook and vectors on the micro lattice
    def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L)
    val cb = Array.tabulate(subspaces * codewords * sub)(i =>
      (lcg(i + 7L) % 2000001L + 2000001L) % 2000001L - 1000000L)
    val rows = (1L to 200L).map { i =>
      (i, (0 until dims).map(j =>
        (lcg(i * 131 + j) % 2000001L + 2000001L) % 2000001L - 1000000L))
    }
    // in-memory reference: integer squared-L2 argmin, first-min tie-break
    def refCodes(v: Seq[Long]): Seq[Int] = (0 until subspaces).map { m =>
      (0 until codewords).minBy { c =>
        (0 until sub).map { j =>
          val d = v(m * sub + j) - cb((m * codewords + c) * sub + j); d * d
        }.sum
      }
    }
    def refTab(v: Seq[Long]): Seq[Long] =
      for { m <- 0 until subspaces; c <- 0 until codewords } yield
        (0 until sub).map { j =>
          val d = v(m * sub + j) - cb((m * codewords + c) * sub + j); d * d
        }.sum
    val df = rows.toDF("id", "uq")
    val got = df.select(col("id"),
        call_function("graft_pq_encode", col("uq"), lit(cb),
          lit(subspaces), lit(codewords)).as("codes"),
        call_function("graft_pq_qtab", col("uq"), lit(cb),
          lit(subspaces), lit(codewords)).as("qtab"))
      .as[(Long, Seq[Int], Seq[Long])].collect()
    got.foreach { case (i, codes, qtab) =>
      val v = rows(i.toInt - 1)._2
      assert(codes == refCodes(v), s"codes mismatch for row $i")
      assert(qtab == refTab(v), s"qtab mismatch for row $i")
    }
    // ties break to the FIRST minimum: duplicate codeword 0 as codeword 1
    val cbTie = cb.clone()
    for (m <- 0 until subspaces; j <- 0 until sub)
      cbTie((m * codewords + 1) * sub + j) = cbTie(m * codewords * sub + j)
    val tied = Seq((1L, cbTie.grouped(codewords * sub).toSeq.flatMap(
      _.take(sub)))).toDF("id", "uq")
    val tcodes = tied.select(call_function("graft_pq_encode", col("uq"),
      lit(cbTie), lit(subspaces), lit(codewords))).as[Seq[Int]].head()
    assert(tcodes.forall(_ == 0), s"tie must pick the first min, got $tcodes")
    // too-short and null-element inputs poison to NULL
    assert(spark.sql(s"SELECT graft_pq_encode(array(1L, 2L), " +
      s"array(${cb.mkString(",")}), $subspaces, $codewords)").head().isNullAt(0))
    assert(spark.sql(s"SELECT graft_pq_qtab(" +
      s"array(${Seq.fill(dims)("CAST(NULL AS BIGINT)").mkString(",")}), " +
      s"array(${cb.mkString(",")}), $subspaces, $codewords)").head().isNullAt(0))
  }

  test("graft_jaro_winkler: textbook vectors, empty rule, null safety") {
    GraftFunctions.register(spark)
    def jw(a: String, b: String): Double =
      spark.sql(s"SELECT round(graft_jaro_winkler('$a', '$b'), 6) j")
        .head().getDouble(0)
    // classic Winkler test vectors
    assert(jw("MARTHA", "MARHTA") == 0.961111)
    assert(jw("DWAYNE", "DUANE") == 0.84)
    assert(jw("DIXON", "DICKSONX") == 0.813333)
    assert(jw("same", "same") == 1.0)
    // below the 0.7 boost threshold the prefix bonus must NOT apply:
    // jaro(abcdef, abzzzz) = (2/6 + 2/6 + 2/2)/3 = 0.555556 exactly
    assert(jw("abcdef", "abzzzz") == 0.555556)
    // DuckDB rule: either side empty -> 0, even for both-empty
    assert(jw("", "") == 0.0)
    assert(jw("", "x") == 0.0)
    assert(spark.sql("SELECT graft_jaro_winkler(CAST(NULL AS STRING), 'x') j")
      .head().isNullAt(0))
  }

  test("LevenshteinBandRule preserves semantics on adversarial pairs") {
    graft.plans.GraftRules.register(spark)
    val pairs = Seq(
      ("kitten", "sitting"), ("abc", "abc"), ("", ""), ("", "abc"),
      ("aaaa", "aaab"), ("short", "muchlongerstring"), ("xy", "yx"),
      (null, "x"), ("x", null))
    // RDD-backed, NOT a LocalRelation: ConvertToLocalRelation would
    // otherwise evaluate the filter before extraOptimizations run and the
    // rule under test would never see the predicate
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p =>
        org.apache.spark.sql.Row(p._1, p._2))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType))))
    // reference: compute the raw distance (projection — untouched by the
    // rule), then cut off in Scala
    val raw = df.selectExpr("a", "b", "levenshtein(a, b) AS d").collect()
      .filter(r => !r.isNullAt(2) && r.getInt(2) <= 3)
      .map(r => (r.getString(0), r.getString(1))).toSet
    // rule path: the filter predicate gets rewritten to band + threshold
    val fast = df.filter("levenshtein(a, b) <= 3").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == raw, s"rewrite changed results: $fast vs $raw")
    // sanity: the rewrite actually fired in the optimized plan
    val opt = df.filter("levenshtein(a, b) <= 3")
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(3)") && opt.contains("length("),
      s"rule did not fire:\n$opt")
  }

  test("graft_jaro_winkler through whole-stage codegen over column data") {
    val df = Seq(("MARTHA", "MARHTA"), ("CRATE", "TRACE"), ("a", "b"))
      .toDF("a", "b")
    val out = df.selectExpr("round(graft_jaro_winkler(a, b), 6) AS j")
      .as[Double].collect().toSeq
    assert(out == Seq(0.961111, 0.733333, 0.0))
  }

  test("graft_cms_estimate: codegen'd point estimates match the kernel, " +
      "null-safe, rejects a non-foldable sketch") {
    import org.apache.spark.sql.functions._
    import graft.functions.{CountMin, CountMinAggregator}
    val items = Seq("a", "a", "a", "b", "b", "c")
    val sk = items.toDF("t").as[String].groupByKey(_ => 0)
      .agg(new CountMinAggregator(3, 32).toColumn.name("sk"))
      .collect().head._2
    val probe = Seq("a", "b", "c", "zz", null.asInstanceOf[String]).toDF("t")
    val est = call_function("graft_cms_estimate", col("t"),
      typedLit(sk.table.toSeq), lit(3), lit(32))
    val out = probe.select(est.as("e")).collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0))
    // estimates >= exact per key; null item -> null out
    assert(out(0) >= 3L && out(1) >= 2L && out(2) >= 1L && out(3) >= 0L)
    assert(out(4) == -1L)
    // same numbers as the direct kernel call (eval and codegen agree)
    assert(out(0) == CountMin.estimate(sk.table, 3, 32, "a"))
    assert(out(3) == CountMin.estimate(sk.table, 3, 32, "zz"))
    // a non-foldable table column must be rejected at analysis
    val bad = intercept[Exception] {
      probe.withColumn("tbl", array(lit(1L)))
        .select(call_function("graft_cms_estimate", col("t"), col("tbl"),
          lit(1), lit(1))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("foldable"))
    // GEOMETRY must match the sketch at PLAN time: a smaller claimed d*w
    // keeps every index in bounds and silently reads wrong slots — the
    // min can fall BELOW the true count, breaking never-undercount (the
    // q227 lossless-prefilter invariant); a bigger one would throw
    // mid-query. Both shapes must fail analysis with the mismatch named.
    val mismatch = intercept[Exception] {
      probe.select(call_function("graft_cms_estimate", col("t"),
        typedLit(sk.table.toSeq), lit(3), lit(16))).collect()
    }
    assert(mismatch.getMessage.contains("geometry mismatch"),
      s"wrong error for undersized d*w: ${mismatch.getMessage}")
    val oversize = intercept[Exception] {
      probe.select(call_function("graft_cms_estimate", col("t"),
        typedLit(sk.table.toSeq), lit(4), lit(32))).collect()
    }
    assert(oversize.getMessage.contains("geometry mismatch"),
      s"wrong error for oversized d*w: ${oversize.getMessage}")
    // the build side skips null items instead of NPE-ing in the hash —
    // the sketch over (items + nulls) equals the sketch over items, and
    // n counts only real items (MG and the query side already tolerate
    // the same input)
    val withNulls = (items :+ null.asInstanceOf[String]).toDF("t")
      .as[String].groupByKey(_ => 0)
      .agg(new CountMinAggregator(3, 32).toColumn.name("sk"))
      .collect().head._2
    assert(withNulls.table.toSeq == sk.table.toSeq,
      "null items must not touch the counter grid")
    assert(withNulls.n == sk.n, "null items must not count toward n")
  }
}
