package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 60-bit SimHash vote fold: ARRAY<BIGINT> token hashes → sketch.
  * Bit j of the result is set iff more hashes have bit j set than clear
  * (majority vote, ties → clear: `2·ones > n`), identical to the
  * `aggregate(zip_with(...))` HOF formulation it replaces — but where the
  * HOF evaluates interpreted (60-counter array allocated and boxed per
  * fold step), this compiles to a primitive int[60] double loop inside
  * whole-stage codegen. A null element poisons to NULL (visible, not a
  * silently partial sketch).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var j = 0
      while (j < 60) { ones(j) += (((h >>> j) & 1L)).toInt; j += 1 }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 60) { if (2L * ones(j) > n) r |= 1L << j; j += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val ones = ctx.freshName("ones")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $ones = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    $ones[$j] += (int) (($h >>> $j) & 1L);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $r = 0L;
         |  for (int $j = 0; $j < 60; $j++) {
         |    if (2L * $ones[$j] > $n) $r |= 1L << $j;
         |  }
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
