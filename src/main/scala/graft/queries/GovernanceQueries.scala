package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Quality}
import graft.sources.Tables

/** Privacy-governance audits over the release-candidate tables —
  * l-diversity and t-closeness ([[graft.operators.Quality]]), the two
  * classical strengthenings of the k-anonymity checks q194/q195 already
  * run. Quasi-identifier: (nation, market segment); sensitive attribute:
  * the account-balance bracket (a 10-bucket ordinal "income band").
  */
object GovernanceQueries {

  /** The shared sensitive-attribute bucketing, 0..9: floor(balance)
    * shifted positive (min balance ≈ −995 ⇒ numerator ≥ 5 > 0, so
    * truncating and flooring division agree in both engines) then
    * 1200-wide bands, top band closed.
    */
  private val BucketExpr = "least(9, (cast(floor(c_acctbal) as bigint) + 1000) div 1200)"
  private val BucketSql = "least(9, (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 1200)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FAIRNESS audit of a quality filter across language slices: the
    // n_chars >= 300 keep-rule (the corpus median) scored against the
    // whitespace-stripped "substantive length >= 250" notion per
    // language — selection rate, TPR,
    // FPR in exact ppm. The disparate-impact read ("does the cheap
    // filter select some languages structurally less?") that a
    // multilingual pipeline audits before shipping the filter; the
    // 80%-rule gap is one aggregate over this output (CurationSpec).
    "q289_filter_fairness" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .withColumn("pred", col("n_chars") >= 300)
        .withColumn("y",
          length(regexp_replace(col("text"), "\\s", "")) >= 250)
      g.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("pred") && col("y"), 1L).otherwise(0L)).as("tp"),
          sum(when(!col("pred") && col("y"), 1L).otherwise(0L)).as("fn"),
          sum(when(col("pred") && !col("y"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("pred") && !col("y"), 1L).otherwise(0L)).as("tn"))
        .select(col("lang"), col("n"), col("n_kept"),
          expr("n_kept * 1000000 div n").as("sel_rate_ppm"),
          when(col("tp") + col("fn") > 0,
            expr("tp * 1000000 div (tp + fn)")).as("tpr_ppm"),
          when(col("fp") + col("tn") > 0,
            expr("fp * 1000000 div (fp + tn)")).as("fpr_ppm"))
    }),

    // l-diversity: (nation, segment) classes whose members span fewer
    // than 8 of the 10 balance brackets — k-anonymous classes that STILL
    // leak the sensitive attribute because everyone in them is alike.
    "q222_ldiversity" -> ((s, d) =>
      Quality.lDiversityClasses(Tables.customer(s, d),
        Seq(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment")),
        expr(BucketExpr), l = 8L)),

    // Categorical drift between the md5 train split (70) and the rest:
    // total-variation distance over the language distribution, exact ppm
    // — the split-balance audit a leakage-free pipeline runs before
    // trusting its held-out metrics (the categorical sibling of q131's
    // continuous KS drift).
    "q245_tvd_drift" -> ((s, d) =>
      Quality.tvdPpm(Tables.documents(s, d), col("lang"),
        Curation.hashBucket(col("doc_id"), 100) < 70)),

    // epsilon-DP count release (two-sided geometric mechanism, eps=0.5):
    // per-(nation, segment) customer counts with md5-deterministic
    // integer noise — re-running cannot re-roll the draw (no silent
    // budget leak), and the oracle regenerates the identical noise from
    // the same literal threshold table.
    "q233_dp_counts" -> ((s, d) =>
      Quality.dpNoisyCounts(Tables.customer(s, d),
        Seq(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment")),
        releaseTag = "release1")),

    // t-closeness: per-class earth-mover's distance (ordered ground
    // metric) between the class's bracket distribution and the global
    // one, in exact ppm over the common denominator n*N — no float ever
    // forms, so the audit is bit-identical at any parallelism.
    "q223_tcloseness" -> ((s, d) =>
      Quality.tClosenessEmd(Tables.customer(s, d),
        Seq(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment")),
        expr(BucketExpr), m = 10)))

  /** The q233 noise CASE, generated from the SAME literal table the
    * operator uses ([[Quality.TwoSidedGeomPpm]]) — one source of truth.
    */
  private val GeomCaseSql: String =
    Quality.TwoSidedGeomPpm.init.map { case (z, cum) =>
      s"WHEN uu < $cum THEN ($z)" }.mkString("CASE ", " ", " ELSE 8 END")

  val oracles: Map[String, String] = Map(
    "q289_filter_fairness" ->
      """WITH g AS (
        |  SELECT lang, (n_chars >= 300) AS pred,
        |         (length(regexp_replace(text, '\s', '', 'g')) >= 250) AS y
        |  FROM documents
        |), a AS (
        |  SELECT lang, count(*) AS n,
        |         CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_kept,
        |         CAST(sum(CASE WHEN pred AND y THEN 1 ELSE 0 END)
        |           AS BIGINT) AS tp,
        |         CAST(sum(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END)
        |           AS BIGINT) AS fn,
        |         CAST(sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END)
        |           AS BIGINT) AS fp,
        |         CAST(sum(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END)
        |           AS BIGINT) AS tn
        |  FROM g GROUP BY 1
        |)
        |SELECT lang, n, n_kept,
        |       CAST(n_kept * 1000000 // n AS BIGINT) AS sel_rate_ppm,
        |       CASE WHEN tp + fn > 0 THEN
        |         CAST(tp * 1000000 // (tp + fn) AS BIGINT) END AS tpr_ppm,
        |       CASE WHEN fp + tn > 0 THEN
        |         CAST(fp * 1000000 // (fp + tn) AS BIGINT) END AS fpr_ppm
        |FROM a""".stripMargin,

    "q245_tvd_drift" ->
      s"""WITH g AS (
         |  SELECT lang AS cat,
         |         (${OracleSql.bucketSql("doc_id", 100)} < 70) AS ia
         |  FROM documents
         |), per AS (
         |  SELECT cat,
         |         CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |         CAST(sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS BIGINT)
         |           AS b
         |  FROM g GROUP BY cat
         |), tot AS (
         |  SELECT CAST(sum(a) AS BIGINT) AS na,
         |         CAST(sum(b) AS BIGINT) AS nb FROM per
         |)
         |SELECT tot.na AS n_a, tot.nb AS n_b,
         |       count(*) AS n_categories,
         |       CASE WHEN tot.na > 0 AND tot.nb > 0 THEN
         |         CAST(sum(abs(per.a * tot.nb - per.b * tot.na)) * 1000000
         |              // (2 * tot.na * tot.nb) AS BIGINT)
         |       END AS tvd_ppm
         |FROM per CROSS JOIN tot
         |GROUP BY tot.na, tot.nb""".stripMargin,

    "q233_dp_counts" ->
      s"""WITH c AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         |         c_mktsegment AS segment, count(*) AS true_n
         |  FROM customer GROUP BY 1, 2
         |), u AS (
         |  SELECT nation, segment, true_n,
         |         (('0x' || substr(md5(coalesce(CAST(nation AS VARCHAR), '')
         |            || '|' || coalesce(segment, '') || '|' || 'release1'),
         |            1, 8))::BIGINT
         |          % 1000000) AS uu
         |  FROM c
         |)
         |SELECT nation, segment, true_n,
         |       CAST($GeomCaseSql AS BIGINT) AS z,
         |       CAST(greatest(0, true_n + $GeomCaseSql) AS BIGINT)
         |         AS noisy_n
         |FROM u""".stripMargin,

    "q222_ldiversity" ->
      s"""SELECT CAST(c_nationkey AS BIGINT) AS nation,
         |       c_mktsegment AS segment,
         |       count(*) AS class_size,
         |       CAST(count(DISTINCT $BucketSql) AS BIGINT) AS n_distinct
         |FROM customer
         |GROUP BY 1, 2
         |HAVING count(DISTINCT $BucketSql) < 8""".stripMargin,

    "q223_tcloseness" ->
      s"""WITH b AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         |         c_mktsegment AS segment, $BucketSql AS bkt
         |  FROM customer
         |), cls AS (SELECT nation, segment, bkt, count(*) AS c
         |           FROM b GROUP BY 1, 2, 3),
         |tot AS (SELECT nation, segment, count(*) AS n FROM b GROUP BY 1, 2),
         |gcnt AS (SELECT bkt, count(*) AS g FROM b GROUP BY 1),
         |nn AS (SELECT count(*) AS N_total FROM b),
         |spine AS (
         |  SELECT t.nation, t.segment, t.n, gs.i AS bkt
         |  FROM tot t CROSS JOIN
         |    (SELECT unnest(generate_series(0, 9)) AS i) gs
         |), j AS (
         |  SELECT s.nation, s.segment, s.n, s.bkt,
         |         coalesce(c.c, 0) AS c, coalesce(g.g, 0) AS g, nn.N_total
         |  FROM spine s
         |  LEFT JOIN cls c ON s.nation = c.nation
         |    AND s.segment = c.segment AND s.bkt = c.bkt
         |  LEFT JOIN gcnt g ON s.bkt = g.bkt
         |  CROSS JOIN nn
         |), pd AS (
         |  SELECT nation, segment, n, N_total, bkt,
         |         CAST(sum(c * N_total - g * n) OVER (
         |           PARTITION BY nation, segment ORDER BY bkt
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS dd
         |  FROM j
         |)
         |SELECT nation, segment, CAST(n AS BIGINT) AS class_size,
         |       CAST(sum(abs(dd)) * 1000000 // (9 * n * N_total) AS BIGINT)
         |         AS emd_ppm
         |FROM pd WHERE bkt < 9
         |GROUP BY nation, segment, n, N_total""".stripMargin)
}
