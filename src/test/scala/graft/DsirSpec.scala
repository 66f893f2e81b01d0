package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: target-like docs out-rank corpus-typical
  * ones, selection is deterministic, and the Gumbel noise is well-formed. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain: nautical vocabulary; raw corpus: mostly office-speak
  // plus two nautical infiltrators that DSIR should surface
  private val nautical = Seq(
    "the ship sailed the harbor and the tide rose past the quay",
    "the crew rigged the mast while the tide turned near the harbor",
    "the captain charted the reef beyond the harbor mouth at dawn")
  private def rawDocs = (
    (1L to 20L).map(i => (i, s"the report number $i was filed and the meeting " +
      "was moved to thursday for the quarterly budget review session")) ++
    Seq((100L, "the ship sailed the harbor while the crew rigged the mast"),
        (101L, "the tide rose past the reef beyond the quay at dawn")))
    .toDF("doc_id", "text")
  private def targetDocs = nautical.zipWithIndex
    .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")

  test("importance weights rank nautical docs above office boilerplate") {
    val w = Dsir.logImportance(rawDocs, targetDocs, "text", "doc_id")
      .select("doc_id", "log_weight").as[(Long, Double)].collect().toMap
    val nauticalW = Seq(100L, 101L).map(w)
    val officeW = (1L to 20L).map(w)
    assert(nauticalW.min > officeW.max,
      s"nautical $nauticalW should out-weigh office max ${officeW.max}")
  }

  test("resampleTopK: deterministic, k-bounded, prefers the target-like docs") {
    val top5 = Dsir.resampleTopK(rawDocs, targetDocs, "text", "doc_id", k = 5)
    val ids = top5.select("doc_id").as[Long].collect().toSeq
    assert(ids.length === 5)
    assert(Set(100L, 101L).subsetOf(ids.toSet)) // both infiltrators selected
    val again = Dsir.resampleTopK(rawDocs, targetDocs, "text", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids === again)
    // sample keys arrive sorted descending (TakeOrderedAndProject contract)
    val keys = top5.select("sample_key").as[Double].collect().toSeq
    assert(keys === keys.sorted.reverse)
  }

  test("gumbelNoise is finite and deterministic for any id") {
    val g = spark.range(0, 2000000, 99991)
      .select(Dsir.gumbelNoise(col("id")).as("g")).as[Double].collect()
    assert(g.forall(v => !v.isNaN && !v.isInfinite))
    // determinism: a second evaluation produces identical doubles
    val g2 = spark.range(0, 2000000, 99991)
      .select(Dsir.gumbelNoise(col("id")).as("g")).as[Double].collect()
    assert(g.toSeq === g2.toSeq)
    // the TRUE hash extremes (u -> 0+ and u -> 1-): solve for the ids
    // whose multiplicative hash lands on 0 and m-1 (modular inverse of
    // the Knuth constant — m is prime so it exists), and check ln()
    // never sees 0 or 1 there (the +0.5 offset is what protects them)
    val m = 2147483647L
    val cInv = BigInt(2654435761L).modInverse(BigInt(m)).toLong
    def hash(id: Long): Long = (id % m) * 2654435761L % m
    val idLow = 0L
    val idHigh = cInv * (m - 1) % m
    assert(hash(idLow) == 0L && hash(idHigh) == m - 1)
    val edge = Seq(idLow, idHigh).toDF("id")
      .select(Dsir.gumbelNoise(col("id"))).as[Double].collect()
    assert(edge.forall(v => !v.isNaN && !v.isInfinite),
      s"extreme-hash ids $idLow/$idHigh produced $edge")
  }

  test("noise draws are distinct across >10^6 ids (no residue sharing)") {
    // the old mod-10^6 hash shared a draw across ids in the same residue
    // class; mod 2^31-1 (prime, constant coprime) the hash is a bijection
    // below the modulus, so every id draws distinct noise
    val n = 1200000L
    val distinct = spark.range(0, n)
      .select(graft.operators.Mixture.idHashUnit(col("id")).as("u"))
      .agg(countDistinct(col("u"))).as[Long].head()
    assert(distinct === n, s"expected $n distinct draws, got $distinct")
    // and the pair the old modulus collided on now differs
    val pair = Seq(7L, 1000007L).toDF("id")
      .select(Dsir.gumbelNoise(col("id"))).as[Double].collect()
    assert(pair(0) !== pair(1))
  }

  test("empty target corpus fails fast instead of Infinity weights") {
    val e = intercept[IllegalArgumentException] {
      Dsir.logImportance(rawDocs,
        rawDocs.filter(col("doc_id") < 0), "text", "doc_id")
    }
    assert(e.getMessage.contains("target corpus"))
  }
}
