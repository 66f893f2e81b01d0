package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/**
 * Jaccard similarity of two SORTED, element-distinct string arrays as a
 * native expression: a single zero-allocation merge scan. [[JaccardSim]]
 * builds a hash set per pair (one allocation + hashing per element); when
 * callers already hold arrays in sorted order — e.g. the canonical
 * token-set form Dedup uses as its grouping key — the merge scan is ~5x
 * cheaper per pair, which matters when the verify stage runs millions of
 * pairs (dedup over near-clique corpora).
 *
 * Inputs MUST be sorted ascending by UTF8 binary order (sort_array) and
 * element-distinct; the result is undefined otherwise.
 */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard requires (array<string>, array<string>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedJaccard.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SortedJaccard.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** |A ∩ B| / |A ∪ B| via merge scan of two sorted distinct arrays;
    * 0.0 when both empty. Null elements are skipped (treated as absent,
    * like JaccardSim.compute — sort_array places them first, so the skip
    * is a prefix scan). Same math as JaccardSim.compute. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    val effA = na - i
    val effB = nb - j
    if (effA == 0 && effB == 0) return 0.0
    var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = effA + effB - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
