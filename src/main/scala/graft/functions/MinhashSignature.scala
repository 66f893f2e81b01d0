package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * MinHash signature as a native Catalyst expression: one pass over the
 * shingle array computing the polynomial content hash and all `numHashes`
 * running minima in a tight JVM loop.
 *
 * Semantics (mirrored bit-for-bit by the DuckDB oracle in
 * QueriesText.dedup_minhash, which is generated from the same a/b
 * functions below):
 *   x(t)   = fold over chars: (acc * 31 + code) mod P,  P = 2^31-1
 *   h_i(x) = (a(i) * x + b(i)) mod P      — Knuth-style large odd a(i)
 *   sig[i] = min over shingles of h_i(x(t))
 *
 * Why an Expression and not Column combinators: the same computation as
 * nested higher-order functions (transform/aggregate per character) runs
 * interpreted with per-element lambda binding and boxing — measured 71s at
 * sf0.1 vs ~2s for this kernel. This is the reference's "hot scalar kernel
 * → native expression" escape hatch (same rationale as OsaDistance).
 */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> and numHashes > 0, got " +
        s"${child.dataType.catalogString} / $numHashes")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  final val P = 2147483647L

  /**
   * Hash-family coefficients. The multipliers must be LARGE pseudo-random
   * odds: tiny ones (1, 3, 5, ...) barely permute the value order, so all
   * per-seed minima correlate with min(x) and near-duplicate docs collapse
   * into a handful of giant LSH buckets (observed: 747-doc buckets at
   * sf0.1 → quadratic pair blowup). Knuth-multiplicative-style constants
   * give independent-looking permutations. Mirrored into the DuckDB oracle
   * from these same functions.
   */
  def a(i: Int): Long = (((i + 1) * 2654435761L) % P) | 1L
  def b(i: Int): Long = ((i + 1) * 1779033703L + 144262901L) % P

  /** The kernel; static so generated code can call it. Null shingle
    * elements hash like the empty string (x = 0). */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      var x = 0L
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i).toString
        var j = 0
        while (j < s.length) { x = (x * 31 + s.charAt(j)) % P; j += 1 }
      }
      var h = 0
      while (h < numHashes) {
        val v = (x * a(h) + b(h)) % P
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L) // empty doc: degenerate sig
    new GenericArrayData(mins)
  }
}
