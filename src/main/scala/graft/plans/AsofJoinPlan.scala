package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join, the brief's extension path (c): a custom
  * logical node + planner [[SparkStrategy]] + physical [[SparkPlan]],
  * alongside the composition form in [[graft.operators.AsofJoin]] (the
  * union-and-fill window). Semantics are identical — backward attaches the
  * LATEST right row with `rightTime <= leftTime` per key, forward the
  * EARLIEST with `rightTime >= leftTime`, both inclusive; null times and
  * null keys never match (SQL comparison semantics); right ties on
  * (key, time) must be pre-deduplicated by the caller.
  *
  * Why a physical operator when the composition already scales: the merge
  * exec declares its true requirements to the planner —
  * `ClusteredDistribution` on the keys for BOTH children and a per-child
  * (keys, time) sort — so Catalyst/EnsureRequirements co-partition the
  * sides exactly as for a sort-merge join, and the join itself is a
  * streaming one-pass merge with O(1) state per partition (one pending
  * right row + one candidate payload). The union-and-fill form instead
  * materializes |L|+|R| rows through one window sort. Same shuffle count,
  * but the merge never widens left rows with union padding columns, and
  * its window state is a single row rather than a sort runway.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute], forward: Boolean) extends BinaryNode {

  // left-outer shape: every left row survives, right payload is nullable
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]; a no-op on everything else. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, fwd) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, fwd) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children arrive co-partitioned on the keys and
  * sorted by (keys, time) — time ascending for backward, descending for
  * forward — so one synchronized forward walk per partition suffices. For
  * each left row the walk consumes right rows while they are "at or
  * before" it in (key, time) order, remembering the last eligible one; in
  * backward mode that is the greatest `rightTime <= leftTime`, in forward
  * mode (both sides time-descending) the smallest `rightTime >= leftTime`.
  *
  * State per partition is O(1): the one pending right row and the one
  * candidate payload (both copied out of the sorter's reused buffers).
  * Rows with null keys or null times are consumed but never become
  * candidates, and null-key/null-time left rows emit null payloads —
  * matching SQL ASOF semantics and the AsofJoin composition bit-for-bit.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute], forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  // the merge emits left rows in their incoming order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val fwd = forward
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val rValExprs = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition: codegen'd projections are not serializable
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val rValProj = UnsafeProjection.create(rValExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      // codegen'd comparators (GenerateOrdering), not the interpreted
      // natural ordering — the merge calls these per consumed row, and the
      // interpreted form measured ~2.7x slower end-to-end at sf0.1
      val keyOrd = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.create(org.apache.spark.sql.types.StructType(
          keyTypes.zipWithIndex.map { case (t, i) =>
            org.apache.spark.sql.types.StructField(s"k$i", t)
          }))
      val timeOrd = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.create(org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("t", timeType))))
      val nullPayload = new GenericInternalRow(rValExprs.length)
      val joined = new JoinedRow

      // the not-yet-consumed right row (copied: sorters reuse buffers)
      var pendKey: InternalRow = null
      var pendTime: InternalRow = null
      var pendVal: InternalRow = null
      // last consumed eligible right row for the current key neighborhood
      var candKey: InternalRow = null
      var candVal: InternalRow = null

      def readRight(): Unit =
        if (rIter.hasNext) {
          val row = rIter.next()
          pendKey = rKeyProj(row).copy()
          pendTime = rTimeProj(row).copy()
          pendVal = rValProj(row).copy()
        } else { pendKey = null; pendTime = null; pendVal = null }

      readRight()

      // "r at-or-before l" in scan order: backward walks time ascending
      // (rt <= lt), forward walks descending (rt >= lt)
      def atOrBefore(rt: InternalRow, lt: InternalRow): Boolean = {
        val c = timeOrd.compare(rt, lt)
        if (fwd) c >= 0 else c <= 0
      }

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow)
        var cmp = if (pendKey == null) 1 else keyOrd.compare(pendKey, lKey)
        while (pendKey != null &&
            (cmp < 0 || (cmp == 0 && (pendTime.isNullAt(0) ||
              (!lTime.isNullAt(0) && atOrBefore(pendTime, lTime)))))) {
          // null-keyed or null-timed right rows are consumed, never kept
          if (!pendKey.anyNull && !pendTime.isNullAt(0)) {
            candKey = pendKey; candVal = pendVal
          }
          readRight()
          cmp = if (pendKey == null) 1 else keyOrd.compare(pendKey, lKey)
        }
        val matched = !lTime.isNullAt(0) && !lKey.anyNull &&
          candKey != null && keyOrd.compare(candKey, lKey) == 0
        resultProj(joined(lRow, if (matched) candVal else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry for the native as-of operator. */
object NativeAsof {

  /** Latest right row with `rightTime <= leftTime` per key (inclusive). */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String]): DataFrame =
    build(left, right, on, leftTime, rightTime, rightValues, forward = false)

  /** Earliest right row with `rightTime >= leftTime` per key (inclusive). */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String]): DataFrame =
    build(left, right, on, leftTime, rightTime, rightValues, forward = true)

  private def build(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightValues: Seq[String],
      forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // a keyless (global) as-of would reach EnsureRequirements as
    // ClusteredDistribution(Nil) and die in a require deep inside Spark;
    // every other precondition here fails loudly — so must this one
    require(on.nonEmpty, "as-of join needs at least one key column " +
      "(for a global as-of, add a constant key to both sides)")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of $side side has no column '$name' " +
            s"(has ${plan.output.map(_.name).mkString(", ")})"))
    val clash = lPlan.outputSet.intersect(rPlan.outputSet)
    require(clash.isEmpty,
      s"as-of sides share attributes $clash — re-alias one side first")
    // the merge exec compares both sides with comparators generated from
    // the LEFT side's types; the custom node bypasses analyzer coercion,
    // so a type mismatch must fail loudly here, not corrupt silently
    on.foreach { k =>
      val (lt, rt) = (attr(lPlan, k, "left").dataType, attr(rPlan, k, "right").dataType)
      require(lt == rt, s"as-of key '$k' types differ: $lt vs $rt — cast first")
    }
    require(attr(lPlan, leftTime, "left").dataType ==
      attr(rPlan, rightTime, "right").dataType,
      s"as-of time types differ: ${attr(lPlan, leftTime, "left").dataType} vs " +
        s"${attr(rPlan, rightTime, "right").dataType} — cast first")
    val overlaps = rightValues.filter(left.columns.contains)
    require(overlaps.isEmpty, s"rightValues collide with left columns: $overlaps")
    val node = AsofJoinNode(lPlan, rPlan,
      on.map(attr(lPlan, _, "left")), on.map(attr(rPlan, _, "right")),
      attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"),
      rightValues.map(attr(rPlan, _, "right")), forward)
    GraftSqlShims.ofRows(spark, node)
  }

  /** Idempotently add [[AsofJoinStrategy]] to the session's planner. The
    * cluster-deploy path is `GraftExtensions` (spark.sql.extensions),
    * which injects the same strategy.
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
  }
}
