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
}
