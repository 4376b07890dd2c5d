package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Retrieval, TextAnalysis}
import graft.sources.Tables

/** The maintained retrieval index must be indistinguishable from a
  * from-scratch rebuild — on every surface (postings, df, dl, stats) and
  * through the disk round-trip. The q213/q214 DuckDB oracles prove this
  * against an independent engine; these tests prove it within Spark at
  * finer granularity (table-by-table) and pin the serve-path equivalences.
  */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def toks = Tables.documents(spark, dir)
    .withColumn("tok", Dedup.tokens(col("text"))).cache()

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("applyIndexDelta == buildIndex over old ∪ new, on all four tables") {
    val docs = toks
    val old = docs.filter(col("doc_id") % 10 =!= 7)
    val fresh = docs.filter(col("doc_id") % 10 === 7)
    val folded = Retrieval.applyIndexDelta(
      Retrieval.buildIndex(old, "doc_id", "tok"), fresh, "doc_id", "tok")
    val rebuilt = Retrieval.buildIndex(docs, "doc_id", "tok")
    assert(sortedRows(folded.postings) == sortedRows(rebuilt.postings))
    assert(sortedRows(folded.terms) == sortedRows(rebuilt.terms))
    assert(sortedRows(folded.docs) == sortedRows(rebuilt.docs))
    assert(sortedRows(folded.stats) == sortedRows(rebuilt.stats))
  }

  test("save→load round-trip preserves every table bit-for-bit") {
    val idx = Retrieval.buildIndex(toks, "doc_id", "tok")
    val out = java.nio.file.Files.createTempDirectory("graft-retr").toString
    Retrieval.saveIndex(idx, out)
    val loaded = Retrieval.loadIndex(spark, out)
    assert(sortedRows(loaded.postings) == sortedRows(idx.postings))
    assert(sortedRows(loaded.terms) == sortedRows(idx.terms))
    assert(sortedRows(loaded.docs) == sortedRows(idx.docs))
    assert(sortedRows(loaded.stats) == sortedRows(idx.stats))
  }

  test("bm25FromIndex == bm25TopDocs from scratch (same terms, same corpus)") {
    val docs = toks
    val idx = Retrieval.buildIndex(docs, "doc_id", "tok")
    val qterms = Retrieval.topTermsFromIndex(idx, 3)
    val fromIndex = Retrieval.bm25FromIndex(idx, qterms, 10)
    val scratch = TextAnalysis.bm25TopDocs(docs, "doc_id", "tok", qterms, 10)
    assert(sortedRows(fromIndex) == sortedRows(scratch))
  }

  test("queryLikelihoodFromIndex: Dirichlet semantics on a hand-built " +
      "corpus — term-bearing docs outrank, short beats long on absent " +
      "terms, every doc scores") {
    import spark.implicits._
    // query terms (by collection frequency, rank order): a > b > c.
    // d1 holds all three; d2 holds a only, same length as d1;
    // d3/d4 hold none — d3 short, d4 long (padded with filler)
    val docs = Seq(
      (1L, Seq("a", "b", "c", "a")),
      (2L, Seq("a", "x", "x", "x")),
      (3L, Seq("y", "y")),
      (4L, Seq("y", "y", "y", "y", "y", "y", "y", "y", "y", "y")),
      (5L, Seq("a", "a", "b", "b", "c"))).toDF("doc_id", "tok")
    val idx = Retrieval.buildIndex(docs, "doc_id", "tok")
    val got = Retrieval.queryLikelihoodFromIndex(idx, 3, 2000L, 10)
      .select("doc_id", "rank", "score")
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    // smoothing: EVERY doc gets a positive score
    assert(got.length == 5, s"expected all 5 docs scored: ${got.toSeq}")
    assert(got.forall(_._3 > 0), s"nonpositive QL score: ${got.toSeq}")
    val rankOf = got.map(r => r._1 -> r._2).toMap
    // docs holding query terms beat docs holding none
    assert(rankOf(1L) < rankOf(3L) && rankOf(5L) < rankOf(3L),
      s"term-bearing docs must outrank term-free docs: ${got.toSeq}")
    // all-terms doc beats same-length single-term doc
    assert(rankOf(1L) < rankOf(2L),
      s"d1 (a,b,c) must outrank d2 (a only, same dl): ${got.toSeq}")
    // among term-free docs the SHORT one wins (Dirichlet length prior)
    assert(rankOf(3L) < rankOf(4L),
      s"short term-free doc must outrank long one: ${got.toSeq}")
  }

  test("topTermsFromIndex matches the corpus's total-occurrence top terms") {
    val docs = toks
    val idx = Retrieval.buildIndex(docs, "doc_id", "tok")
    val fromIndex = Retrieval.topTermsFromIndex(idx, 3)
      .collect().map(_.getString(0)).toSeq
    val scratch = TextAnalysis.tokenInstances(docs, "doc_id", "tok")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(fromIndex == scratch)
  }
}
