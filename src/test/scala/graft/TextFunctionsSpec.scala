package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis primitive coverage: tokenization, language ID, quality
  * scores, fingerprints, shingles, MinHash, SimHash. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercased whitespace split, empties removed") {
    val r = Seq("Hello  World\tfoo\n", "").toDF("x")
      .select(tokens(col("x")).as("t")).as[Seq[String]].collect()
    assert(r(0) === Seq("hello", "world", "foo"))
    assert(r(1) === Seq.empty)
  }

  test("tokenCount and subwordCount") {
    val r = Seq("one two three").toDF("x")
      .select(tokenCount(col("x")).as("n"), subwordCount(col("x")).as("sw"))
      .as[(Int, Long)].head()
    assert(r._1 === 3)
    // ceil(3/4)+ceil(3/4)+ceil(5/4) = 1+1+2
    assert(r._2 === 4L)
  }

  test("langId picks dominant stopword language, und when none") {
    val r = Seq(
      "the cat sat on the mat and it is happy",
      "el perro y la casa de los vecinos se ven por la ventana",
      "der hund und die katze ist ein tier von mir mit dir",
      "zzz qqq xxx").toDF("x")
      .select(langId(col("x")).as("l")).as[String].collect().toSeq
    assert(r === Seq("en", "es", "de", "und"))
  }

  test("alphaRatio, punctRatio, meanTokenLength, qualityScore") {
    val (a, p, m) = Seq("ab, cd!").toDF("x")
      .select(alphaRatio(col("x")).as("a"), punctRatio(col("x")).as("p"),
        meanTokenLength(col("x")).as("m"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(a - 4.0 / 7) < 1e-9)
    assert(math.abs(p - 2.0 / 7) < 1e-9)
    assert(math.abs(m - 3.0) < 1e-9) // "ab," (3) and "cd!" (3)
    val q = Seq("A perfectly reasonable english sentence with normal words.")
      .toDF("x").select(qualityScore(col("x")).as("q")).as[Double].head()
    assert(q === 1.0)
  }

  test("canonicalText + fingerprint: case/punct/space-insensitive identity") {
    val r = Seq("Hello,  World!", "hello world", "different").toDF("x")
      .select(fingerprint(col("x")).as("f")).as[String].collect()
    assert(r(0) === r(1))
    assert(r(0) !== r(2))
  }

  test("charShingles of canonical form") {
    val r = Seq("a b!").toDF("x") // canonical: "a b"
      .select(charShingles(col("x"), 2).as("s")).as[Seq[String]].head()
    assert(r === Seq("a ", " b"))
    // shorter than k: single-element array of the whole text
    val short = Seq("x").toDF("x")
      .select(charShingles(col("x"), 5).as("s")).as[Seq[String]].head()
    assert(short === Seq("x"))
  }

  test("wordNgrams") {
    val r = Seq("a b c d").toDF("x")
      .select(wordNgrams(col("x"), 3).as("g")).as[Seq[String]].head()
    assert(r === Seq("a b c", "b c d"))
  }

  test("minhash signature: deterministic, identical texts collide, length = numHashes") {
    val df = Seq("the quick brown fox", "the quick brown fox", "lorem ipsum dolor")
      .toDF("x")
      .select(minhashSignature(array_distinct(charShingles(col("x"), 3)), 8).as("sig"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0).length === 8)
    assert(rows(0) === rows(1))
    assert(rows(0) !== rows(2))
  }

  test("minhash band keys: equal slices => equal keys") {
    val df = Seq("abcdefgh", "abcdefgh").toDF("x")
      .select(minhashBandKeys(minhashSignature(
        array_distinct(charShingles(col("x"), 3)), 8), 2, 4).as("bk"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0).length === 2)
    assert(rows(0) === rows(1))
  }

  test("jaccard") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
      .select(jaccard(col("a"), col("b")).as("j")).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-9)
    val z = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(jaccard(col("a"), col("b")).as("j")).as[Double].head()
    assert(z === 0.0)
  }

  test("rollingFingerprint: polynomial hash, empty-safe, order-sensitive") {
    val r = Seq("ab", "ba", "ab", "").toDF("x")
      .select(canonicalText(col("x")).as("c"))
      .select(rollingFingerprint(col("c")).as("h")).as[Long].collect()
    // h("ab") = (0*31+97)*31+98 mod p = 3105
    assert(r(0) === 97L * 31 + 98)
    assert(r(1) === 98L * 31 + 97)   // order matters
    assert(r(0) === r(2))            // deterministic
    assert(r(3) === 0L)              // empty
  }

  test("scrubPii: emails, SSNs, phones redacted; SSN wins over phone shape") {
    val out = Seq(
      "mail bob.smith+x@sub.example.org now",
      "ssn is 123-45-6789 thanks",
      "call (555) 123-4567 or 555-123-4567 or +1 555 123 4567",
      "order 123-45 ships 12-34-5678")  // near-misses stay untouched
      .toDF("x").select(scrubPii(col("x")).as("c")).as[String].collect()
    assert(out(0) === "mail <EMAIL> now")
    assert(out(1) === "ssn is <SSN> thanks")
    assert(out(2) === "call <PHONE> or <PHONE> or <PHONE>")
    assert(out(3) === "order 123-45 ships 12-34-5678")
  }

  test("repetition: duplicate-line fraction and bigram repetition ratio") {
    val r = Seq(
      "alpha beta\ngamma\nalpha beta\n  \n",  // 3 non-empty lines, 1 dup
      "a b a b a b",                           // bigrams: ab ba ab ba ab -> 2 distinct of 5
      "")                                       // empty-safe
      .toDF("x")
      .select(dupLineFraction(col("x")).as("d"),
        ngramRepetitionRatio(col("x"), 2).as("g"))
      .as[(Double, Double)].collect()
    assert(math.abs(r(0)._1 - 1.0 / 3) < 1e-9)
    assert(math.abs(r(1)._2 - (1.0 - 2.0 / 5)) < 1e-9)
    assert(r(2) === ((0.0, 0.0)))
  }

  test("simhash: deterministic, identical inputs equal, hamming 0/positive") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps",
      "totally different words here okay").toDF("x")
      .select(simhash(tokens(col("x"))).as("sh"))
    val rows = df.as[Long].collect()
    assert(rows(0) === rows(1))
    val h = Seq((rows(0), rows(2))).toDF("a", "b")
      .select(hamming(col("a"), col("b")).as("h")).as[Int].head()
    assert(h > 0)
  }
}
