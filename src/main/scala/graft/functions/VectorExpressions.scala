package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the vector hot path: sequential-fold dot
  * product over two double arrays.
  *
  * Why an Expression and not a UDF: `doGenCode` emits a primitive loop
  * directly into whole-stage codegen — no row boxing, no Seq conversion, no
  * codegen fence. The interpreted path (`nullSafeEval`) reads the unsafe
  * array buffers in place. Accumulation order is strictly left-to-right in
  * both paths, so results are bit-identical to any sequential evaluation of
  * the same doubles (the DuckDB oracle, the closure-based loop, and the
  * `aggregate(zip_with(...))` HOF form all agree).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // the result can be NULL even for non-null inputs (length mismatch, null
  // element) — without this override codegen would hardwire isNull=false
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  // Mismatched lengths or null elements yield NULL — the same answer the
  // aggregate(zip_with(...)) HOF form gives (zip_with pads with null, null
  // poisons the sum). A truncated partial dot product would be a plausible
  // but wrong similarity; NULL is a visible one.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native SQL functions. */
object GraftFunctions {

  /** SQL form of `Relational.zorderValue`: graft_zorder(bits, c1, c2, …)
    * builds the identical shift/mask interleave tree from raw Catalyst
    * expressions (ShiftLeft/ShiftRight/BitwiseAnd/Add over longs), so the
    * SQL-first path gets the same codegen'd plan as the Column builder.
    * `bits` must be a foldable literal — it shapes the expression tree.
    */
  private def zorderBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Literal, ShiftLeft, ShiftRight}
    import org.apache.spark.sql.types.LongType
    require(exprs.length >= 2,
      s"graft_zorder(bits, col1[, col2...]) needs >= 2 arguments, got ${exprs.length}")
    val bitsE = exprs.head
    require(bitsE.foldable, "graft_zorder: bits must be a literal")
    val bits = bitsE.eval().asInstanceOf[Number].intValue()
    val cols = exprs.tail
    val k = cols.size
    // bits.toLong: an Int product could wrap negative and bypass the check
    require(bits > 0 && bits.toLong * k <= 63,
      s"graft_zorder: bits*cols must fit a positive long, got $bits*$k")
    cols.zipWithIndex.flatMap { case (c, j) =>
      val longC = Cast(c, LongType)
      (0 until bits).map { i =>
        ShiftLeft(BitwiseAnd(ShiftRight(longC, Literal(i)), Literal(1L)),
          Literal(i * k + j)): Expression
      }
    }.reduce(Add(_, _))
  }

  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("graft_dot", exprs => {
      require(exprs.length == 2,
        s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
      DotProduct(exprs(0), exprs(1))
    }, "graft_dot(a, b) - dot product of two ARRAY<DOUBLE> vectors"),
    ("graft_zorder", zorderBuilder,
      "graft_zorder(bits, c1, c2, ...) - Z-order (Morton) bit-interleave " +
        "of the low `bits` bits of each column"),
    ("graft_simhash60", exprs => {
      require(exprs.length == 1,
        s"graft_simhash60 requires exactly 1 argument, got ${exprs.length}")
      SimHash60(exprs(0))
    }, "graft_simhash60(hashes) - 60-bit SimHash majority-vote sketch " +
      "over an ARRAY<BIGINT> of token hashes"),
    ("graft_jaro_winkler", exprs => {
      require(exprs.length == 2,
        s"graft_jaro_winkler requires exactly 2 arguments, got ${exprs.length}")
      JaroWinklerSimilarity(exprs(0), exprs(1))
    }, "graft_jaro_winkler(a, b) - Jaro-Winkler similarity of two strings " +
      "(DuckDB-compatible: prefix boost above 0.7, empty string -> 0)"),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its own
    // runtime row-level filtering but leaves them out of the public
    // registry; exposing them gives the decontamination prefilter (q144) a
    // fully declarative bloom path — partial-aggregated sketch build, no
    // UDF fence on the probe side.
    ("graft_bloom_agg", exprs => {
      require(exprs.length == 3,
        s"graft_bloom_agg requires exactly 3 arguments, got ${exprs.length}")
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
    }, "graft_bloom_agg(xxhash64_value, est_items, num_bits) - build a " +
      "bloom filter sketch (BINARY) over a BIGINT hash column"),
    ("graft_pq_encode", PqExpressions.encodeBuilder _,
      "graft_pq_encode(uq, cbflat, subspaces, codewords) - nearest " +
        "codeword id per subspace (integer squared-L2 argmin) of a " +
        "micro-unit ARRAY<BIGINT> vector against a flattened PQ codebook"),
    ("graft_pq_qtab", PqExpressions.qtabBuilder _,
      "graft_pq_qtab(uq, cbflat, subspaces, codewords) - per-query ADC " +
        "distance table: squared L2 to every codeword of every subspace, " +
        "flattened subspace-major"),
    ("graft_cms_estimate", exprs => {
      require(exprs.length == 4,
        s"graft_cms_estimate requires exactly 4 arguments, got ${exprs.length}")
      CmsEstimate(exprs(0), exprs(1), exprs(2), exprs(3))
    }, "graft_cms_estimate(item, table, d, w) - Count-Min sketch point " +
      "estimate of a STRING item against a foldable flattened d*w " +
      "ARRAY<BIGINT> counter grid; never undercounts"),
    ("graft_might_contain", exprs => {
      require(exprs.length == 2,
        s"graft_might_contain requires exactly 2 arguments, got ${exprs.length}")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))
    }, "graft_might_contain(bloom, xxhash64_value) - probe a bloom filter " +
      "sketch; false means definitely absent"),
    ("graft_rh_bands", exprs => {
      require(exprs.length == 4,
        s"graft_rh_bands requires exactly 4 arguments, got ${exprs.length}")
      val Seq(vec, planesE, bitsE, dimE) = exprs
      require(planesE.foldable && bitsE.foldable && dimE.foldable,
        "graft_rh_bands: planes, bits and dim must be literals — they " +
          "shape the plane table shipped in the codegen references")
      val planes = planesE.eval() match {
        case a: ArrayData => a.toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"graft_rh_bands: planes must be ARRAY<DOUBLE>, got $other")
      }
      val bits = bitsE.eval().asInstanceOf[Number].intValue()
      val dim = dimE.eval().asInstanceOf[Number].intValue()
      require(dim >= 1 && bits >= 1 && bits <= 62,
        s"graft_rh_bands: need dim >= 1 and bits in [1,62], got $dim/$bits")
      require(planes.length % (bits * dim) == 0 && planes.length > 0,
        s"graft_rh_bands: plane table length ${planes.length} is not a " +
          s"positive multiple of bits*dim (${bits * dim})")
      RhBandsExpr(vec, planes, planes.length / (bits * dim), bits, dim)
    }, "graft_rh_bands(vec, planes, bits, dim) - random-hyperplane LSH " +
      "band keys (ARRAY<BIGINT>) of an ARRAY<DOUBLE> vector against a " +
      "foldable flattened plane table, one loop-based codegen expression " +
      "at any geometry"))

  /** Session-scoped registration (temp functions) — used by the query layer
    * and tests. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Cluster deployment hook: `--conf spark.sql.extensions=graft.functions.
  * GraftExtensions` registers the functions permanently in every session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    GraftFunctions.functions.foreach { case (name, builder, usage) =>
      // per-function class attribution: DESCRIBE FUNCTION EXTENDED must not
      // claim every graft function is DotProduct
      val clazz = name match {
        case "graft_dot" => classOf[DotProduct].getName
        case "graft_simhash60" => classOf[SimHash60].getName
        case "graft_jaro_winkler" => classOf[JaroWinklerSimilarity].getName
        case "graft_pq_encode" => classOf[PqEncodeCodes].getName
        case "graft_pq_qtab" => classOf[PqQueryTable].getName
        case "graft_cms_estimate" => classOf[CmsEstimate].getName
        case "graft_bloom_agg" => classOf[org.apache.spark.sql.catalyst
          .expressions.aggregate.BloomFilterAggregate].getName
        case "graft_might_contain" => classOf[org.apache.spark.sql.catalyst
          .expressions.BloomFilterMightContain].getName
        case "graft_rh_bands" => classOf[RhBandsExpr].getName
        case _ => GraftFunctions.getClass.getName
      }
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz, name, usage),
        builder))
    }
  }
}
