package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH banding: ARRAY<DOUBLE> vector → the
  * ARRAY<BIGINT> of band sign-keys, all planes in ONE loop-based
  * expression.
  *
  * Why this exists (round-14 verdict #3): the previous formulation built
  * one `when(graft_dot(vec, lit(plane)) > 0, 1L << i)` term PER PLANE and
  * summed them — at the dialed sf1 geometry (67 bands × 12 bits = 804
  * planes) the generated source blows past janino's limits
  * (`InternalCompilerException` → silent whole-stage fallback to
  * interpreted eval), and past-cap geometries had to be built in chunked
  * projection stages with checkpoint barriers (`ScaleCurve`'s old
  * `bandedChunked`). Here the plane table ships as ONE `double[]` in the
  * codegen references array and the generated code is a fixed triple
  * loop — O(1) source size at ANY geometry, so every dialed/past-cap
  * geometry stays inside whole-stage codegen (pinned in PlanSpec).
  *
  * Bit-identical to the per-plane form: bit i of band g is
  * `dot(vec, plane(g·bits + i)) > 0`, the dot accumulating strictly
  * left-to-right over j (the [[DotProduct]] order the DuckDB oracle
  * reproduces); a null vector, a length≠dim vector, or a null element
  * makes the plane's dot NULL, which the old `when(...).otherwise(0)`
  * mapped to a cleared bit — so those rows still yield an all-zero
  * (non-null) band array here.
  *
  * `planes` is the flattened row-major plane table
  * (`planes(p*dim + j)` = component j of plane p), length bands·bits·dim.
  */
case class RhBandsExpr(child: Expression, planes: Array[Double],
    bands: Int, bits: Int, dim: Int) extends UnaryExpression {

  require(bands >= 1 && bits >= 1 && bits <= 62 && dim >= 1,
    s"invalid geometry: bands=$bands bits=$bits dim=$dim")
  require(planes.length == bands * bits * dim,
    s"plane table length ${planes.length} != bands*bits*dim " +
      s"(${bands * bits * dim})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a null/ragged vector yields the all-zero band array, never NULL —
  // exactly what when(dot > 0, bit).otherwise(0) did on a NULL dot
  override def nullable: Boolean = false
  override def prettyName: String = "graft_rh_bands"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out = new Array[Long](bands)
    val vec = if (v == null) null else v.asInstanceOf[ArrayData]
    if (vec != null && vec.numElements() == dim) {
      var g = 0
      while (g < bands) {
        var bv = 0L
        var i = 0
        while (i < bits) {
          val base = (g * bits + i) * dim
          var s = 0.0
          var j = 0
          var dnull = false
          while (j < dim && !dnull) {
            if (vec.isNullAt(j)) dnull = true
            else { s += vec.getDouble(j) * planes(base + j); j += 1 }
          }
          if (!dnull && s > 0.0) bv |= 1L << i
          i += 1
        }
        out(g) = bv
        g += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("rhPlanes", planes, "double[]")
    val bandArr = ctx.freshName("bandArr")
    val g = ctx.freshName("g")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val bv = ctx.freshName("bv")
    val base = ctx.freshName("base")
    val dnull = ctx.freshName("dnull")
    val javaType = CodeGenerator.javaType(dataType)
    val code =
      code"""
         |${childGen.code}
         |long[] $bandArr = new long[$bands];
         |if (!${childGen.isNull} && ${childGen.value}.numElements() == $dim) {
         |  for (int $g = 0; $g < $bands; $g++) {
         |    long $bv = 0L;
         |    for (int $i = 0; $i < $bits; $i++) {
         |      int $base = ($g * $bits + $i) * $dim;
         |      double $s = 0.0;
         |      boolean $dnull = false;
         |      for (int $j = 0; $j < $dim; $j++) {
         |        if (${childGen.value}.isNullAt($j)) { $dnull = true; break; }
         |        $s += ${childGen.value}.getDouble($j) * $planesRef[$base + $j];
         |      }
         |      if (!$dnull && $s > 0.0) $bv |= 1L << $i;
         |    }
         |    $bandArr[$g] = $bv;
         |  }
         |}
         |final $javaType ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bandArr);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RhBandsExpr =
    copy(child = newChild)
}
