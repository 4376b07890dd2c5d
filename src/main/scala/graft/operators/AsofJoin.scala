package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins (backward and forward): for each left row, attach the
  * closest right row in the same key group — `backward` the latest with
  * `rightTime <= leftTime`, `forward` the earliest with
  * `rightTime >= leftTime` (both inclusive, like DuckDB/kdb ASOF). Null
  * event times never match (SQL semantics): null-time right rows are
  * dropped, null-time left rows get null payloads.
  *
  * Spark has no native as-of operator, so this uses the scalable
  * union-and-fill pattern instead of a range join: tag both sides, union,
  * sort each key group by (time, side) and carry the last non-null right
  * payload forward with `last(..., ignoreNulls)` over a running window.
  * Cost is ONE shuffle per side on the key (the window reuses the union's
  * partitioning) and a single sequential pass — no O(|L|·|R|) candidate
  * explosion, which is what makes it hold at 100 TB. Hot keys are the only
  * caveat (same as any keyed window); salt upstream if a key is pathological.
  *
  * Right-side rows that tie on (key, time) must be pre-deduplicated by the
  * caller (the reference of "which ties win" is otherwise engine-specific).
  * Column names `_t`, `_src`, `_rv`, `_asof` are reserved working names and
  * must not appear in either input; `rightValues` names must not collide
  * with left columns (both enforced).
  */
object AsofJoin {

  /** @param on          join key columns, same names on both sides
    * @param leftTime    event-time column on the left
    * @param rightTime   event-time column on the right
    * @param rightValues right payload columns to attach (null when no match)
    */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      rightValues: Seq[String]): DataFrame =
    asof(left, right, on, leftTime, rightTime, rightValues, forward = false)

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * (inclusive). Same union-and-fill mechanics with the scan order
    * reversed: walking time descending, the last right payload seen is the
    * smallest right time at or after the current left row.
    */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      rightValues: Seq[String]): DataFrame =
    asof(left, right, on, leftTime, rightTime, rightValues, forward = true)

  private def asof(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      rightValues: Seq[String], forward: Boolean): DataFrame = {
    val reserved = Seq("_t", "_src", "_rv", "_asof")
    val collisions = (left.columns ++ right.columns).filter(reserved.contains)
    require(collisions.isEmpty,
      s"as-of inputs must not contain reserved columns ${collisions.toSeq}")
    val overlaps = rightValues.filter(left.columns.contains)
    require(overlaps.isEmpty,
      s"rightValues collide with left columns: $overlaps")
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select(rightValues.map(col): _*).schema.map(_.copy(nullable = true)))

    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_src", lit(1))
      .withColumn("_rv", lit(null).cast(payloadType))
    val keep = (on ++ Seq(rightTime) ++ rightValues).distinct
    val r = right
      .filter(col(rightTime).isNotNull) // null time never matches
      .select(keep.map(col): _*)
      .withColumn("_t", col(rightTime))
      .withColumn("_src", lit(0))
      .withColumn("_rv", struct(rightValues.map(col): _*))
      .select(on.map(col) ++ Seq(col("_t"), col("_src"), col("_rv")): _*)

    // unionByName with missing-column fill keeps each side's schema minimal.
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(timeOrder, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))

    val leftCols = left.columns.map(col)
    // a null left time matches nothing (SQL comparison semantics)
    val attached = rightValues.map(c =>
      when(col("_t").isNotNull, col("_asof").getField(c)).as(c))
    filled.filter(col("_src") === 1).select(leftCols.toSeq ++ attached: _*)
  }
}
