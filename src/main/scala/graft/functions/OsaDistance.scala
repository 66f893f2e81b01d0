package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Optimal String Alignment (restricted Damerau-Levenshtein) distance.
 *
 * The reference's fuzzy matcher uses `stringdist`'s default OSA method
 * (reference: scripts/Roster_scripts/fuzzy_matching_functions.R:2-50,
 * docs/notebooks/fuzzy.Rmd:16,556). OSA extends Levenshtein with the
 * adjacent-transposition edit, but unlike full Damerau-Levenshtein a
 * substring may not be edited more than once (no edits between the two
 * transposed characters). distance("AB","BA") = 1 (Levenshtein would say 2);
 * distance("CA","ABC") = 3 (full DL would say 2).
 *
 * Implemented as a native Catalyst Expression so the fuzzy join predicate
 * stays on the JVM fast path (no Scala UDF boxing). doGenCode emits a
 * static call to the DP kernel, keeping enclosing filters/projections
 * inside whole-stage codegen (a CodegenFallback here would split the
 * generated pipeline at every fuzzy predicate).
 */
case class OsaDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"osa_distance requires (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "osa_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    OsaDistance.osa(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.OsaDistance.osa($l.toString(), $r.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OsaDistance {
  /** Classic 3-row DP for OSA distance. */
  def osa(a: String, b: String): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    // rows: i-2, i-1, i over b (m+1 wide)
    var prev2 = new Array[Int](m + 1)
    var prev1 = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev1(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = i
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val cost = if (ai == bj) 0 else 1
        var d = math.min(
          math.min(prev1(j) + 1, curr(j - 1) + 1),
          prev1(j - 1) + cost)
        if (i > 1 && j > 1 && ai == b.charAt(j - 2) && a.charAt(i - 2) == bj) {
          d = math.min(d, prev2(j - 2) + 1)
        }
        curr(j) = d
        j += 1
      }
      val tmp = prev2; prev2 = prev1; prev1 = curr; curr = tmp
      i += 1
    }
    prev1(m)
  }
}
