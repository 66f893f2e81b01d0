package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Orthonormal-hyperplane LSH signature — the WIDE-BAND plane family for
 * the occupancy-planned scale arms. Bit i is the sign of
 * dot(vec, u_{planeOffset+i}) where {u} is the modified-Gram-Schmidt
 * orthonormalization (within the [planeOffset, planeOffset+bits) group)
 * of deterministic standard-gaussian directions from the splitmix64
 * family (Box-Muller over two hash-uniforms).
 *
 * WHY a second family exists ([[HyperplaneSig]] is the narrow/oracle
 * one): the +-1 splitmix planes are NOT orthogonal — in d dims two
 * random +-1 planes have |correlation| ~ 1/sqrt(d) — so their sign bits
 * are correlated and bucket collision mass exceeds the independent-bit
 * 2^-bits model the occupancy planner (planEmbeddingBands/planLshProbe)
 * budgets against. The effect COMPOUNDS with width: measured on a
 * direction-uniform 303k x 64-dim corpus (ProbeSuite emb_plan), 18-bit
 * +-1 bands carried 2.45x the model's candidate mass, eating the plan's
 * predicted 2.7x cut down to 1.09x. Projections of isotropic data onto
 * ORTHONORMAL directions are independent, so with this family each
 * band's bits are independent coin flips and measured mass sits on the
 * model (same probe: 2.5x cut restored). Per-bit flip probability for a
 * cos>=t pair is unchanged (each u_i is still a uniformly random
 * direction — Gram-Schmidt of iid gaussians is a Haar frame), so the
 * planner's Charikar recall compensation applies as-is.
 *
 * The plane group depends on the runtime vector width, so the
 * orthonormalized matrix is built once per (planeOffset, bits, dims) in
 * a per-JVM cache (bits x dims doubles — at the 30-bit cap and 4k dims,
 * ~1 MB) from a pure hash function: every executor materializes the
 * identical planes with no shuffle or broadcast. For bits > dims (can't
 * have more than dims mutually orthogonal planes) the surplus planes
 * stay raw gaussian directions — documented degradation toward the +-1
 * family's correlated regime, which the occupancy planner avoids anyway
 * (wide bands only make sense when dims affords them).
 *
 * Null elements contribute 0 to the projection and an empty/0-dim array
 * yields the all-ones signature — both exactly [[HyperplaneSig]]'s
 * conventions, so the two families are drop-in interchangeable.
 */
case class OrthoPlaneSig(child: Expression, bits: Int, planeOffset: Int = 0)
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
      s"ortho_plane_sig requires array<float|double>, 0 < bits <= 62 and " +
        s"planeOffset >= 0, got ${child.dataType.catalogString} / $bits / $planeOffset")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ortho_plane_sig"

  override protected def nullSafeEval(input: Any): Any =
    OrthoPlaneSig.compute(input.asInstanceOf[ArrayData], bits, planeOffset, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.OrthoPlaneSig.compute($c, $bits, $planeOffset, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OrthoPlaneSig {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hash-uniform in (0, 1) — the +0.5 keeps it off both endpoints so
    * Box-Muller's log/cos are always finite. */
  private def unit(h: Long): Double =
    ((h >>> 11).toDouble + 0.5) / (1L << 53).toDouble

  /** Deterministic standard normal for (plane p, dim j): Box-Muller over
    * two splitmix draws at distinct keys (2*key, 2*key+1 are unique per
    * (p, j) for j < 2^31). Public so specs can rebuild the raw planes. */
  def gaussian(p: Int, j: Int): Double = {
    val key = (p.toLong << 32) | (j.toLong & 0xFFFFFFFFL)
    val u1 = unit(mix64(key * 2L))
    val u2 = unit(mix64(key * 2L + 1L))
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** The orthonormalized plane group for (planeOffset, bits) at `dims` —
    * modified Gram-Schmidt over the raw gaussian directions, computed
    * once per JVM per key from pure hashes (identical on every executor).
    * Public so specs can assert orthogonality directly. */
  def planesFor(planeOffset: Int, bits: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planeOffset, bits, dims), _ => {
      val out = Array.ofDim[Array[Double]](bits)
      var i = 0
      while (i < bits) {
        val u = Array.tabulate(dims)(j => gaussian(planeOffset + i, j))
        if (i < dims) { // at most dims mutually orthogonal planes exist
          var k = 0
          while (k < i) {
            val prev = out(k)
            var d = 0.0
            var j = 0
            while (j < dims) { d += u(j) * prev(j); j += 1 }
            j = 0
            while (j < dims) { u(j) -= d * prev(j); j += 1 }
            k += 1
          }
        }
        var nrm = 0.0
        var j = 0
        while (j < dims) { nrm += u(j) * u(j); j += 1 }
        if (nrm > 0) {
          val inv = 1.0 / math.sqrt(nrm)
          j = 0
          while (j < dims) { u(j) *= inv; j += 1 }
        }
        out(i) = u
        i += 1
      }
      out
    })

  /** The kernel; static so generated code can call it. Null elements
    * contribute 0 (HyperplaneSig's convention). */
  def compute(vec: ArrayData, bits: Int, planeOffset: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    val planes = planesFor(planeOffset, bits, n)
    var r = 0L
    var i = 0
    while (i < bits) {
      val u = planes(i)
      var contrib = 0.0
      var j = 0
      while (j < n) {
        if (!vec.isNullAt(j)) {
          val v = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
          contrib += v * u(j)
        }
        j += 1
      }
      if (contrib >= 0) r |= 1L << i
      i += 1
    }
    r
  }
}
