package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Count-Min point-estimate expression: `graft_cms_estimate(item,
  * table, d, w)` where `table` is the FOLDABLE flattened d×w counter grid
  * (one `Literal` of ARRAY<BIGINT> — a single broadcast-sized object in
  * the plan, not 8 k nodes) and `d`/`w` are foldable ints.
  *
  * Why an expression and not the Scala UDF it replaces: the estimate
  * filter is the 100 TB hot path of the CMS heavy-hitter pattern — it
  * runs once per TOKEN INSTANCE to decide, row-locally, whether the
  * instance may reach the confirm shuffle. A UDF fences that row out of
  * whole-stage codegen and pays encoder boxing per call; this expression
  * stays inside the generated loop and calls the same static
  * [[CountMin.estimate]] kernel against a codegen-referenced long[]
  * (materialized once per executor from the literal, not per row).
  */
case class CmsEstimate(item: Expression, table: Expression,
    d: Expression, w: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(item, table, d, w)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName item must be STRING, got ${item.dataType.catalogString}")
    else if (!table.dataType.isInstanceOf[ArrayType] ||
      table.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName table must be ARRAY<BIGINT>")
    else if (!table.foldable || !d.foldable || !w.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName table/d/w must be foldable (the sketch is plan-time data)")
    else if (d.dataType != IntegerType || w.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName d and w must be INT")
    else {
      // geometry must match the sketch: with a SMALLER claimed d*w every
      // index stays in bounds, the min is taken over wrong slots, and
      // the estimate can fall BELOW the true count — silently breaking
      // the never-undercount invariant the lossless prefilter (q227)
      // rests on; larger d*w would throw mid-query instead. All three
      // args are foldable (checked above), so fail at PLAN time.
      val tv = table.eval()
      val dv = d.eval()
      val wv = w.eval()
      if (tv == null || dv == null || wv == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName table/d/w must be non-null")
      else {
        val len = tv.asInstanceOf[ArrayData].numElements()
        val need = dv.asInstanceOf[Int].toLong * wv.asInstanceOf[Int]
        if (len.toLong != need)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName sketch geometry mismatch: table has $len " +
              s"counters but d*w = $need")
        else TypeCheckResult.TypeCheckSuccess
      }
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = item.nullable
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val dVal: Int = d.eval().asInstanceOf[Int]
  @transient private lazy val wVal: Int = w.eval().asInstanceOf[Int]
  @transient private lazy val tbl: Array[Long] =
    table.eval().asInstanceOf[ArrayData].toLongArray()

  override def eval(input: InternalRow): Any = {
    val v = item.eval(input)
    if (v == null) null
    else CountMin.estimate(tbl, dVal, wVal,
      v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val tblRef = ctx.addReferenceObj("cmsTable", tbl, "long[]")
    val itemEv = item.genCode(ctx)
    ev.copy(code =
      code"""
        ${itemEv.code}
        boolean ${ev.isNull} = ${itemEv.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.CountMin.estimate(
            $tblRef, $dVal, $wVal, ${itemEv.value}.toString());
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsEstimate =
    copy(item = newChildren(0), table = newChildren(1),
      d = newChildren(2), w = newChildren(3))
}
