package graft

import graft.queries.AnalyticsQueries

/** Bounds for the approximate (sketch) aggregates that have no hash oracle. */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q44 sketches: HLL within 5% of exact, approx median within data range") {
    val row = AnalyticsQueries.queries("q44_sketches")(spark, dir).head()
    val approx = row.getLong(0).toDouble
    val exact = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
    val med = row.getDouble(2)
    assert(med > 0 && med <= 50, s"median quantity $med outside plausible range")
  }

  test("registerViews: the whole engine is reachable from spark.sql alone") {
    graft.sources.Tables.registerViews(spark, dir)
    // one pure-SQL statement spanning tables, the nanos-safe events view,
    // and the native graft_dot function — no DataFrame API anywhere
    val rows = spark.sql(
      """SELECT (SELECT count(*) FROM lineitem)        AS n_li,
        |       (SELECT count(*) FROM events)          AS n_ev,
        |       (SELECT count(DISTINCT lang) FROM documents) AS n_lang,
        |       (SELECT round(graft_dot(
        |              transform(embedding, x -> cast(x AS double)),
        |              transform(embedding, x -> cast(x AS double))), 4)
        |        FROM embeddings WHERE vec_id = 0)     AS self_dot
        |""".stripMargin).head()
    assert(rows.getLong(0) > 0 && rows.getLong(1) > 0)
    assert(rows.getLong(2) >= 3, s"langs: ${rows.getLong(2)}")
    assert(rows.getDouble(3) > 0.0, s"graft_dot in SQL: ${rows.getDouble(3)}")
  }
}
