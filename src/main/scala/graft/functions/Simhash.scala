package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * SimHash as a native Catalyst expression: one pass over the token array
 * computing the polynomial content hash and all `bits` signed bit-counters
 * in a tight JVM loop (the HOF formulation would re-walk the token array
 * once per bit — 60x the traffic).
 *
 * Semantics (mirrored bit-for-bit by the DuckDB oracle in
 * QueriesText.dedup_simhash, generated from the same a/b functions):
 *   x(t)    = fold over chars: (acc * 31 + code) mod P,  P = 2^31-1
 *   g_j(x)  = (a(j) * x + b(j)) mod P        — MinhashSignature's family
 *   bit j   = sign of sum over tokens of (g_j(x) odd ? +1 : -1), set on >= 0
 *   empty array => 0L (degenerate hash, like MinhashSignature's empty sig)
 *
 * `bits` is capped at 60 so band keys and the hash itself never touch the
 * sign bit in either engine (DuckDB BIGINT shifts on bit 63 are UB-adjacent;
 * 60 also divides evenly into 4 x 15-bit LSH sub-bands).
 *
 * Reference behavior: near-duplicate grouping of free-text submissions
 * (roster_filters dedups in scripts/roster/roster_filters.R) re-expressed
 * as the content-hash family used by web-scale corpus dedup.
 */
case class Simhash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits > 0 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string> and 0 < bits <= 60, got " +
        s"${child.dataType.catalogString} / $bits")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    Simhash.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash {
  import MinhashSignature.{P, a, b}

  /** The kernel; static so generated code can call it. Null token elements
    * hash like the empty string (x = 0). */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      var x = 0L
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i).toString
        var j = 0
        while (j < s.length) { x = (x * 31 + s.charAt(j)) % P; j += 1 }
      }
      var h = 0
      while (h < bits) {
        val g = (x * a(h) + b(h)) % P
        if ((g & 1L) == 1L) counts(h) += 1 else counts(h) -= 1
        h += 1
      }
      i += 1
    }
    var r = 0L
    var h = 0
    while (h < bits) { if (counts(h) >= 0) r |= 1L << h; h += 1 }
    r
  }
}
