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
}
