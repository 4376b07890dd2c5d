package graft.queries

/** Shared DuckDB SQL fragments mirrored by Spark-side operators — ONE
  * definition per engine-portability-critical formula, so a change to the
  * Spark side (e.g. `Curation.hashBucket`'s hash width or cast) has
  * exactly one oracle counterpart to update instead of hand-copied
  * instances drifting apart across query files.
  */
private[queries] object OracleSql {

  /** DuckDB mirror of `Curation.hashBucket`. */
  def bucketSql(id: String, buckets: Int): String =
    s"(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8))::BIGINT % $buckets)"

  /** The q62-shape three-way split CASE over [[bucketSql]]. */
  def splitCaseSql(id: String): String =
    s"""CASE WHEN ${bucketSql(id, 100)} < 90 THEN 'train'
       |     WHEN ${bucketSql(id, 100)} < 95 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** DuckDB stopword IN-list mirroring TextAnalysis.Stopwords. */
  def stopInSql: String = graft.operators.TextAnalysis.Stopwords
    .map(w => s"'$w'").mkString("(", ",", ")")

  /** DuckDB mirror of TextAnalysis.qualityScore over columns
    * (text, tok): length credit + stopword naturalness − punctuation
    * penalty, rounded to 4. ONE definition — q33, q179, and q199's
    * oracles all interpolate this, so a formula change cannot leave a
    * drifting copy behind.
    */
  def qualitySql: String =
    s"""round(least(1.0, len(tok)/50.0) * 0.5 +
       |      (CASE WHEN len(tok) = 0 THEN 0.0
       |       ELSE len(list_filter(tok, x -> x IN $stopInSql)) / len(tok) END) * 0.3 +
       |      (1.0 - CASE WHEN length(text) = 0 THEN 0.0
       |       ELSE length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))
       |            / length(text) END) * 0.2, 4)""".stripMargin
}
