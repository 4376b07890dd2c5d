package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native product-quantization kernels (Jégou et al., PAMI 2011).
  *
  * The declarative formulation of PQ encode — per subspace, an `array()` of
  * `codewords` squared-distance expressions followed by
  * `array_position(dists, array_min(dists))` — is semantically right but
  * builds a ~10k-node expression tree (subspaces × codewords × subdim
  * element_at/arith nodes, with the distance array evaluated TWICE for the
  * min and the position). That tree is re-planned per query and evaluated
  * per row; measured at sf0.1 it dominates q152/q154 wall time. These
  * expressions collapse the whole encode (and the per-query ADC table) to
  * ONE Catalyst node each: a primitive long[] triple loop in whole-stage
  * codegen, with the codebook shipped once as a referenced constant — the
  * same native-kernel recipe as [[SimHash60]] and [[DotProduct]].
  *
  * Semantics are bit-identical to the declarative form: integer micro-unit
  * arithmetic (inputs on the 1e-6 lattice, |d| ≤ 2e6 → d² ≤ 4e12, × subdim
  * sums stay far inside a long), first-minimum tie-break (= array_position
  * of the min's first occurrence). A null or too-short input array → NULL;
  * a null ELEMENT → NULL (poison, never a silently partial code).
  */
private[functions] trait PqKernel { self: UnaryExpression =>
  def codebook: Array[Long] // flattened (m × codewords × subdim)-major
  def subspaces: Int
  def codewords: Int

  protected lazy val subDim: Int = codebook.length / (subspaces * codewords)

  protected def checkUq(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _)
      if codebook.length == subspaces.toLong * codewords * subDim
        && subDim > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName codebook length ${codebook.length} does not factor " +
        s"into $subspaces subspaces x $codewords codewords")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> micro-unit vectors, got " +
        other.catalogString)
  }
}

/** `graft_pq_encode(uq, cbflat, subspaces, codewords)` → ARRAY<INT>: the
  * nearest-codeword id per subspace (integer squared-L2 argmin, first-min
  * tie-break) — the row-local corpus encode of a PQ index.
  */
case class PqEncodeCodes(child: Expression, codebook: Array[Long],
    subspaces: Int, codewords: Int) extends UnaryExpression with PqKernel {

  override def checkInputDataTypes(): TypeCheckResult = checkUq()
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < subspaces * subDim) return null
    val codes = new Array[Int](subspaces)
    var m = 0
    while (m < subspaces) {
      var best = Long.MaxValue
      var bi = 0
      var c = 0
      while (c < codewords) {
        var dist = 0L
        var j = 0
        while (j < subDim) {
          val idx = m * subDim + j
          if (arr.isNullAt(idx)) return null
          val d = arr.getLong(idx) - codebook((m * codewords + c) * subDim + j)
          dist += d * d
          j += 1
        }
        if (dist < best) { best = dist; bi = c }
        c += 1
      }
      codes(m) = bi
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val poison = ctx.freshName("poison")
      s"""
         |if ($a.numElements() < ${subspaces * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$subspaces];
         |  boolean $poison = false;
         |  for (int $m = 0; $m < $subspaces && !$poison; $m++) {
         |    long $best = Long.MAX_VALUE;
         |    int $bi = 0;
         |    for (int $c = 0; $c < $codewords && !$poison; $c++) {
         |      long $dist = 0L;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        int $idx = $m * $subDim + $j;
         |        if ($a.isNullAt($idx)) { $poison = true; break; }
         |        long $d = $a.getLong($idx)
         |          - $cb[($m * $codewords + $c) * $subDim + $j];
         |        $dist += $d * $d;
         |      }
         |      if (!$poison && $dist < $best) { $best = $dist; $bi = $c; }
         |    }
         |    $codes[$m] = $bi;
         |  }
         |  if ($poison) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** `graft_pq_qtab(uq, cbflat, subspaces, codewords)` → ARRAY<BIGINT>: the
  * per-query ADC distance table — squared L2 to EVERY codeword of every
  * subspace, flattened subspace-major — so scoring a corpus code is
  * `subspaces` table lookups, never a vector op.
  */
case class PqQueryTable(child: Expression, codebook: Array[Long],
    subspaces: Int, codewords: Int) extends UnaryExpression with PqKernel {

  override def checkInputDataTypes(): TypeCheckResult = checkUq()
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_qtab"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < subspaces * subDim) return null
    val tab = new Array[Long](subspaces * codewords)
    var m = 0
    while (m < subspaces) {
      var c = 0
      while (c < codewords) {
        var dist = 0L
        var j = 0
        while (j < subDim) {
          val idx = m * subDim + j
          if (arr.isNullAt(idx)) return null
          val d = arr.getLong(idx) - codebook((m * codewords + c) * subDim + j)
          dist += d * d
          j += 1
        }
        tab(m * codewords + c) = dist
        c += 1
      }
      m += 1
    }
    new GenericArrayData(tab)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
      val tab = ctx.freshName("tab")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val poison = ctx.freshName("poison")
      s"""
         |if ($a.numElements() < ${subspaces * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $tab = new long[${subspaces * codewords}];
         |  boolean $poison = false;
         |  for (int $m = 0; $m < $subspaces && !$poison; $m++) {
         |    for (int $c = 0; $c < $codewords && !$poison; $c++) {
         |      long $dist = 0L;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        int $idx = $m * $subDim + $j;
         |        if ($a.isNullAt($idx)) { $poison = true; break; }
         |        long $d = $a.getLong($idx)
         |          - $cb[($m * $codewords + $c) * $subDim + $j];
         |        $dist += $d * $d;
         |      }
         |      if (!$poison) { $tab[$m * $codewords + $c] = $dist; }
         |    }
         |  }
         |  if ($poison) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($tab);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqQueryTable =
    copy(child = newChild)
}

object PqExpressions {

  /** Shared literal-argument extraction for the SQL builders:
    * (uqExpr, flat codebook, subspaces, codewords).
    */
  private[functions] def extractArgs(name: String,
      exprs: Seq[Expression]): (Expression, Array[Long], Int, Int) = {
    require(exprs.length == 4,
      s"$name(uq, cbflat, subspaces, codewords) needs 4 arguments, " +
        s"got ${exprs.length}")
    require(exprs.tail.forall(_.foldable),
      s"$name: cbflat/subspaces/codewords must be literals")
    // SQL-surface integer literals arrive as ARRAY<INT>; widen to long.
    // A NULL literal is foldable and evals to null — name it in the
    // error instead of NPE-ing out of the analyzer (or, for cbflat,
    // reporting "must be ARRAY<BIGINT>, got array<bigint>")
    val cb = (exprs(1).eval(), exprs(1).dataType) match {
      case (null, _) => throw new IllegalArgumentException(
        s"$name: cbflat must not be NULL")
      case (a: ArrayData, ArrayType(LongType, _)) => a.toLongArray()
      case (a: ArrayData, ArrayType(IntegerType, _)) =>
        a.toIntArray().map(_.toLong)
      case (_, dt) => throw new IllegalArgumentException(
        s"$name: cbflat must be ARRAY<BIGINT>, got ${dt.catalogString}")
    }
    def intArg(i: Int, arg: String): Int = exprs(i).eval() match {
      case null => throw new IllegalArgumentException(
        s"$name: $arg must not be NULL")
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be INT, got $other")
    }
    val subspaces = intArg(2, "subspaces")
    val codewords = intArg(3, "codewords")
    require(subspaces > 0 && codewords > 0,
      s"$name: subspaces/codewords must be positive")
    (exprs.head, cb, subspaces, codewords)
  }

  def encodeBuilder(exprs: Seq[Expression]): Expression = {
    val (uq, cb, m, k) = extractArgs("graft_pq_encode", exprs)
    PqEncodeCodes(uq, cb, m, k)
  }

  def qtabBuilder(exprs: Seq[Expression]): Expression = {
    val (uq, cb, m, k) = extractArgs("graft_pq_qtab", exprs)
    PqQueryTable(uq, cb, m, k)
  }
}
