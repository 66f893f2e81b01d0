package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Random-hyperplane LSH signature as a native Catalyst expression: bit i
 * is the sign of dot(vec, h_{planeOffset+i}), with h_p the deterministic
 * +-1 hyperplane from the splitmix64 family (see [[HyperplaneSig.sign]]).
 * The Column-combinator formulation expands to bits x dims literal terms —
 * at 12 bits x 64 dims the generated method crosses the JVM's 64 KB
 * limit and Spark silently falls back to interpreted evaluation for the
 * whole corpus scan; this kernel is one tight loop and one static call.
 *
 * `planeOffset` (default 0 — existing signatures unchanged) selects a
 * disjoint plane range per LSH band, so a multi-band consumer
 * ([[graft.operators.Similarity.embeddingNearDupPairs]]'s auto-planned
 * banding) gets independent bands from the same family.
 *
 * Summation order matches the combinator form exactly (j ascending,
 * left-accumulated doubles), so signatures — and the DuckDB oracle SQL
 * generated from the same sign function — are bit-identical.
 */
case class HyperplaneSig(child: Expression, bits: Int, planeOffset: Int = 0)
    extends UnaryExpression {

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if bits > 0 && bits <= 62 && planeOffset >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float|double>, 0 < bits <= 62 and " +
        s"planeOffset >= 0, got ${child.dataType.catalogString} / $bits / $planeOffset")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], bits, planeOffset, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSig.compute($c, $bits, $planeOffset, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {

  /** splitmix64 finalizer — decorrelates (bit, dim) pairs; a linear mix
    * like i*31+j would make hyperplane i+1 a shifted copy of hyperplane i
    * for dims > 31, collapsing the LSH buckets. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The +-1.0 hyperplane coefficient for (bit i, dim j) — public so the
    * DuckDB oracle SQL is generated from the same constants. */
  def sign(i: Int, j: Int): Double =
    if ((mix64(i.toLong << 32 | j.toLong) & 1L) == 1L) 1.0 else -1.0

  /** The kernel; static so generated code can call it. Null elements
    * contribute 0. */
  def compute(vec: ArrayData, bits: Int, planeOffset: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    var r = 0L
    var i = 0
    while (i < bits) {
      var contrib = 0.0
      var j = 0
      while (j < n) {
        if (!vec.isNullAt(j)) {
          val v = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
          contrib += v * sign(planeOffset + i, j)
        }
        j += 1
      }
      if (contrib >= 0) r |= 1L << i
      i += 1
    }
    r
  }
}
