package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/**
 * Jaccard similarity of two DISTINCT string-array columns as a native
 * expression: one hash-set build + one probe pass. The Column-combinator
 * form (size(array_intersect)/size(array_union)) walks both arrays twice
 * through interpreted set machinery — measured ~0.3ms per pair on
 * ~300-element shingle sets; this kernel is ~10x cheaper. Same math as
 * the DuckDB oracle's list_intersect/list_distinct(list_concat) form.
 *
 * Inputs MUST be element-distinct (callers use array_distinct /
 * tokenSet); duplicates would overcount the union.
 */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim requires (array<string>, array<string>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaccardSim.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  /** |A ∩ B| / |A ∪ B| for element-distinct arrays; 0.0 when both empty. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // build set over the smaller side, probe with the larger
    val (small, nSmall, large, nLarge) =
      if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(16, nSmall * 2))
    var i = 0
    var smallNonNull = 0
    while (i < nSmall) {
      if (!small.isNullAt(i)) {
        if (set.add(small.getUTF8String(i))) smallNonNull += 1
      }
      i += 1
    }
    var inter = 0
    var largeNonNull = 0
    var j = 0
    while (j < nLarge) {
      if (!large.isNullAt(j)) {
        largeNonNull += 1
        if (set.contains(large.getUTF8String(j))) inter += 1
      }
      j += 1
    }
    val union = smallNonNull + largeNonNull - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
