package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** The derived-corpus cipher must preserve each copy's internal
  * similarity geometry exactly and keep cross-copy overlap far below
  * every near-dup threshold — the properties the round-11 scaling-slope
  * measurement stands on. */
class ScaleCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog near a riverbank today"
  private val b = "the quick brown fox jumps over the lazy dog near a riverbank tonight"
  private val far = "completely unrelated material discussing catalyst optimizer internals"

  private def jac(x: String, y: String, c: Int): Double = {
    val df = Seq((x, y)).toDF("x", "y")
      .select(
        (if (c == 0) col("x") else ScaleCorpus.cipherText(col("x"), c)).as("cx"),
        (if (c == 0) col("y") else ScaleCorpus.cipherText(col("y"), c)).as("cy"))
      .select(
        array_distinct(charShinglesCanon(canonicalText(col("cx")), 5)).as("sx"),
        array_distinct(charShinglesCanon(canonicalText(col("cy")), 5)).as("sy"))
      .select((size(array_intersect(col("sx"), col("sy"))).cast("double") /
        size(array_union(col("sx"), col("sy")))).as("j"))
    df.as[Double].head()
  }

  private def cross(x: String, c1: Int, c2: Int): Double = {
    val df = Seq((x, x)).toDF("x", "y")
      .select(ScaleCorpus.cipherText(col("x"), c1).as("cx"),
        ScaleCorpus.cipherText(col("y"), c2).as("cy"))
      .select(
        array_distinct(charShinglesCanon(canonicalText(col("cx")), 5)).as("sx"),
        array_distinct(charShinglesCanon(canonicalText(col("cy")), 5)).as("sy"))
      .select((size(array_intersect(col("sx"), col("sy"))).cast("double") /
        size(array_union(col("sx"), col("sy")))).as("j"))
    df.as[Double].head()
  }

  test("cipher preserves length and within-copy shingle Jaccard (bijective " +
      "rename), keeps cross-copy overlap far below the thresholds") {
    // length preserved exactly for every copy index used by the slope runs
    val lens = Seq(a).toDF("x").select(
      length(col("x")) +: (1 until 30).map(c =>
        length(ScaleCorpus.cipherText(col("x"), c))): _*)
      .head().toSeq.map(_.asInstanceOf[Int])
    assert(lens.distinct.size === 1, s"cipher changed text length: $lens")
    // within-copy geometry: the ciphered pair's Jaccard equals the base
    // pair's (same shingle-set sizes, same intersection size)
    val j0 = jac(a, b, 0)
    assert(j0 > 0.5, s"fixture pair must be a near-dup in base, j=$j0")
    (1 until 30).foreach { c =>
      val jc = jac(a, b, c)
      assert(math.abs(jc - j0) < 0.02,
        s"copy $c distorted within-copy jaccard: $jc vs base $j0")
    }
    // a far pair stays far in every copy
    assert(jac(a, far, 7) < 0.1)
    // cross-copy: the SAME doc under two different copy ciphers must not
    // be a near-dup of itself (only whitelist material overlaps)
    for ((c1, c2) <- Seq((1, 2), (1, 27), (5, 15), (9, 29)))
      assert(cross(a, c1, c2) < 0.3,
        s"copies $c1/$c2 share too many shingles: ${cross(a, c1, c2)}")
  }

  test("affine maps are pairwise distinct and never the identity over the " +
      "slope run's copy range") {
    val images = (1 until 30).map(c => Seq("abcdefghij zyx 0123456789")
      .toDF("x").select(ScaleCorpus.cipherText(col("x"), c)).as[String].head())
    assert(images.distinct.size === images.size, "two copies share a cipher")
    assert(!images.contains("abcdefghij zyx 0123456789"), "identity cipher leaked")
  }

  test("no copy index up to 1000 yields an identity letter or digit map " +
      "(the b = c % 26 bug put the identity at c = 312)") {
    (1 to 1000).foreach { c =>
      val (from, to) = ScaleCorpus.affineAlphabets(c)
      val letters = from.take(26).zip(to.take(26))
      val digits = from.takeRight(10).zip(to.takeRight(10))
      assert(letters.exists { case (f, t) => f != t },
        s"copy $c: identity letter map")
      assert(digits.exists { case (f, t) => f != t },
        s"copy $c: identity digit map")
    }
  }
}
