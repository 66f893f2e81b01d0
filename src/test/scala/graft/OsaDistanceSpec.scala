package graft

import graft.functions.OsaDistance.osa
import graft.functions.osa_distance
import org.apache.spark.sql.functions._

/** OSA distance vs known stringdist::stringdist(method="osa") vectors
  * (reference: scripts/Roster_scripts/fuzzy_matching_functions.R uses the
  * stringdist default, which is OSA). */
class OsaDistanceSpec extends SparkSpec {

  test("OSA matches known stringdist vectors") {
    // adjacent transposition is ONE edit (Levenshtein would say 2)
    assert(osa("AB", "BA") === 1)
    assert(osa("ab", "ba") === 1)
    // restricted: no edits within a transposed pair — full DL says 2 here
    assert(osa("CA", "ABC") === 3)
    assert(osa("", "") === 0)
    assert(osa("", "abc") === 3)
    assert(osa("abc", "") === 3)
    assert(osa("kitten", "sitting") === 3)
    assert(osa("saturday", "sunday") === 3)
    assert(osa("SMITH_JOHN", "SMITH_JON") === 1)
    assert(osa("SMITH_JOHN", "SMTIH_JOHN") === 1)
    assert(osa("identical", "identical") === 0)
  }

  private def randomPairs(n: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(42)
    def s() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (0 until n).map(_ => (s(), s()))
  }

  test("OSA is symmetric, bounded, zero on identity (seeded corpus)") {
    randomPairs(500).foreach { case (a, b) =>
      assert(osa(a, b) === osa(b, a), s"symmetry failed on ($a,$b)")
      assert(osa(a, b) <= math.max(a.length, b.length))
      assert(osa(a, a) === 0)
    }
  }

  test("OSA <= Levenshtein always") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    randomPairs(500).foreach { case (a, b) =>
      assert(osa(a, b) <= lev(a, b), s"OSA > Lev on ($a,$b)")
    }
  }

  test("osa_distance Column expression evaluates in a query") {
    import spark.implicits._
    val df = Seq(("AB", "BA"), ("kitten", "sitting"), ("x", "x"))
      .toDF("a", "b")
      .select(osa_distance(col("a"), col("b")).as("d"))
    assert(df.as[Int].collect().toSeq === Seq(1, 3, 0))
  }

  test("osa_distance compiles under whole-stage codegen (no fallback)") {
    import spark.implicits._
    // fallback=false makes janino failures throw instead of silently
    // interpreting — proves doGenCode emits valid code.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = spark.range(1000)
        .select(concat(lit("name"), col("id").cast("string")).as("a"),
          concat(lit("name"), ((col("id") + 1) % 1000).cast("string")).as("b"))
        .filter(osa_distance(col("a"), col("b")) <= 2)
        .count()
      assert(n > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("osa_distance is null-safe") {
    import spark.implicits._
    val df = Seq((Some("a"), None: Option[String]), (None, Some("b")))
      .toDF("a", "b")
      .select(osa_distance(col("a"), col("b")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  // ------------------------------------------------ property-based parity

  /** Independent reference OSA: the full-matrix textbook DP (the engine's
    * kernel is the rolling 3-row variant — a genuinely different
    * implementation, so agreement is evidence, not tautology). */
  private def refOsa(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(a.length)(b.length)
  }

  private def check(prop: org.scalacheck.Prop, tests: Int = 500): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(tests)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: kernel == full-matrix reference on adversarial alphabets") {
    import org.scalacheck.{Gen, Prop}
    // tiny alphabet (dense transpositions near the threshold), plus
    // unicode incl. a combining mark and a surrogate-pair char (both
    // impls operate on UTF-16 code units, so they must agree there too),
    // plus empty strings (Gen.listOf starts at length 0)
    val alphabets = Seq("ab", "abcd", "aß日́x😀")
    alphabets.foreach { alpha =>
      val genStr = Gen.choose(0, 14).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))
      check(Prop.forAll(genStr, genStr) { (a, b) =>
        osa(a, b) == refOsa(a, b)
      })
    }
  }

  test("property: k disjoint adjacent transpositions cost exactly k (boundary 3 and 4)") {
    import org.scalacheck.{Gen, Prop}
    // distinct-character base strings: each disjoint adjacent swap leaves
    // 2 mismatched positions that only a transposition fixes in one op,
    // so the distance sits EXACTLY at the threshold boundary k
    val base = "abcdefghijklmnop"
    val genK = Gen.oneOf(3, 4)
    val prop = Prop.forAll(genK, Gen.choose(0L, Long.MaxValue)) { (k, seed) =>
      val rnd = new scala.util.Random(seed)
      // pick k disjoint adjacent pairs: positions 2*i offsets shuffled
      val slots = rnd.shuffle((0 until base.length / 2).toList).take(k)
        .map(_ * 2)
      val chars = base.toCharArray
      slots.foreach { p =>
        val t = chars(p); chars(p) = chars(p + 1); chars(p + 1) = t
      }
      val swapped = new String(chars)
      osa(base, swapped) == k && refOsa(base, swapped) == k
    }
    check(prop)
  }

  test("property: metamorphic bounds (symmetry, identity, length bounds)") {
    import org.scalacheck.{Gen, Prop}
    val genStr = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcXYZ0189 _-".toSeq)).map(_.mkString))
    check(Prop.forAll(genStr, genStr) { (a, b) =>
      val d = osa(a, b)
      d == osa(b, a) &&
        osa(a, a) == 0 &&
        d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length)
    })
  }
}
