package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native vector kernels for the embedding path. The Column-combinator
 * forms (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) evaluate their
 * lambdas through interpreted HigherOrderFunction machinery per element —
 * the dominant cost of every ANN scan and near-dup verify. Each kernel is
 * one tight JVM loop with IDENTICAL arithmetic: sequential left-fold in
 * ascending index order, float widened to double per element, so results
 * are bit-for-bit what the combinator form (and the DuckDB oracles
 * mirroring it) produce.
 *
 * Null/length semantics mirror the combinators exactly: zip_with pads a
 * shorter array with null and a null element poisons the whole fold — so
 * [[DotProduct]] returns NULL on any null element or length mismatch,
 * and [[CosineSim]] (whose combinator form wraps the null dot in
 * `when(d > 0, ...).otherwise(0.0)`) returns 0.0.
 */
private[functions] trait VectorKernelInputs extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> inputs, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  protected def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Sequential-fold dot product; NULL on length mismatch or null element. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorKernelInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"""
         |java.lang.Double ${ev.value}Box = graft.functions.VectorKernels.dot(
         |  $l, $r, $leftIsFloat, $rightIsFloat);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single-pass cosine similarity; 0.0 on zero norms, null elements, or
  * length mismatch (the combinator form's when/otherwise contract). */
case class CosineSim(left: Expression, right: Expression)
    extends VectorKernelInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VectorKernels.cosine($l, $r, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Boxed so generated code can branch on the null case. */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aF) * elem(b, i, bF)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** One pass, three accumulators — each the same sequential fold the
    * separate dot/norm combinators would run. */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return 0.0
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return 0.0
      val x = elem(a, i, aF)
      val y = elem(b, i, bF)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    val d = math.sqrt(daa) * math.sqrt(dbb)
    if (d > 0) dab / d else 0.0
  }
}
