package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlShims}

/** Checkpoint discipline for ITERATIVE fixpoint operators.
  *
  * Plain `localCheckpoint()` truncates lineage but (Spark ≥3.4) carries the
  * origin plan's `Statistics` into the checkpointed leaf. The size-only
  * estimator multiplies child sizes at every join, so a fixpoint whose
  * round-k plan references the round-(k−1) checkpoint r times compounds the
  * `sizeInBytes` BigInt to sizeᵣᵏ — its bit-length grows geometrically and
  * after ~15 rounds the driver spends minutes per round in
  * `BigInteger.multiply` inside broadcast-size planning (measured on the
  * SCC fixpoint: >10 min of pure planning at sf0.01). [[ckpt]] resets the
  * stats to "unknown" along with the lineage, keeping per-round planning
  * cost constant. See
  * [[org.apache.spark.sql.GraftSqlShims.statsTruncatedLocalCheckpoint]].
  */
object Iterate {

  /** Postfix syntax: `df.ckpt()` — drop-in for `df.localCheckpoint()`
    * inside iterative loops.
    */
  implicit class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = GraftSqlShims.statsTruncatedLocalCheckpoint(df)
  }
}
