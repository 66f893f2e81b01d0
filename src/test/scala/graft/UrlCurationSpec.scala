package graft

import graft.operators.UrlCuration
import org.apache.spark.sql.functions._

/** URL-level curation: canonicalization edge cases, blocklist anti-join,
  * deterministic per-domain cap. */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlCuration.normalizeUrl($"u").as("n"))
      .as[String].collect().toSeq

  test("normalizeUrl: scheme/host case, www, fragment, tracking params, slash") {
    assert(norm(
      "HTTPS://WWW.Site.COM/Path/To/X/?utm_source=a&id=5#frag",
      "https://site.com/page/",
      "http://www.site.org/x?id=2&utm_campaign=c&ref=tw",
      "  https://site.net  ",
      // xref is NOT a tracking param: the ?/& anchor must protect it
      "https://site.com/x?xref=keep&utm_medium=drop",
      // all params tracking -> '?' disappears entirely
      "https://site.com/x?utm_source=a&utm_medium=b",
      // path case is preserved; only scheme+host lowercase
      "HTTP://HOST.COM/CaseKept") === Seq(
      "https://site.com/Path/To/X/?id=5",
      "https://site.com/page",
      "http://site.org/x?id=2",
      "https://site.net",
      "https://site.com/x?xref=keep",
      "https://site.com/x",
      "http://host.com/CaseKept"))
  }

  test("property: normalizeUrl is idempotent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genUrl = for {
      scheme <- Gen.oneOf("http://", "https://", "HTTPS://", "")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("site.com", "A.B.org", "h-x.net")
      path <- Gen.oneOf("", "/", "/x", "/X/y/", "/p/q")
      query <- Gen.oneOf("", "?id=1", "?utm_source=a", "?utm_source=a&id=2",
        "?id=3&ref=t", "?xref=keep&utm_medium=m")
      frag <- Gen.oneOf("", "#f", "#a/b?c")
      pad <- Gen.oneOf("", " ", "  ")
    } yield s"$pad$scheme$www$host$path$query$frag$pad"
    val prop = Prop.forAll(Gen.listOfN(20, genUrl)) { urls =>
      val once = urls.toDF("u")
        .select(UrlCuration.normalizeUrl($"u").as("n")).as[String].collect()
      val twice = once.toSeq.toDF("u")
        .select(UrlCuration.normalizeUrl($"u").as("n")).as[String].collect()
      once.toSeq == twice.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20)
      .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("domainOf extracts the host of a normalized url") {
    val d = Seq("https://a.b.com/x?q=1", "http://h.org").toDF("u")
      .select(UrlCuration.domainOf($"u")).as[String].collect().toSeq
    assert(d === Seq("a.b.com", "h.org"))
  }

  test("blocklist drops exactly the listed domains; null domain survives") {
    val docs = Seq((1L, "good.com"), (2L, "evil.com"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "domain")
    val bl = Seq("evil.com").toDF("domain")
    val kept = UrlCuration.filterBlocklist(docs, "domain", bl)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("capPerDomain keeps exactly maxPerDomain, deterministically") {
    val docs = (1L to 100L).map(i => (i, if (i <= 80) "big.com" else "small.com"))
      .toDF("doc_id", "domain")
    val capped = UrlCuration.capPerDomain(docs, "domain", "doc_id", 5)
    val byDom = capped.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDom("big.com") === 5L)
    assert(byDom("small.com") === 5L)
    // a domain under the cap passes through whole
    val under = UrlCuration.capPerDomain(docs, "domain", "doc_id", 100)
    assert(under.count() === 100L)
    // deterministic: the same call keeps the same ids
    val again = UrlCuration.capPerDomain(docs, "domain", "doc_id", 5)
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq ===
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("property: capPerDomain == the naive window for arbitrary skews, caps, salts") {
    import graft.operators.{Mixture, UrlCuration}
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // arbitrary domain-size mixes (including empty and sub-cap domains),
    // caps, skew thresholds and salt counts: the salted pre-cut must be
    // invisible in the answer — its exactness argument (subgroup rank <=
    // domain rank) has no data-shape escape hatch, so neither may the code
    val genDocs = for {
      nDomains <- Gen.choose(1, 4)
      sizes <- Gen.listOfN(nDomains, Gen.choose(0, 90))
      offset <- Gen.choose(0L, 5000000L) // vary the hash landscape
    } yield sizes.zipWithIndex.flatMap { case (sz, d) =>
      (0 until sz).map(i => (offset + d.toLong * 7919 + i * 13, s"dom$d"))
    }
    val prop = Prop.forAll(genDocs, Gen.choose(1, 6), Gen.choose(1, 3),
        Gen.oneOf(1, 2, 8)) { (rows, cap, skewFactor, salts) =>
      val df = rows.toDF("doc_id", "domain")
      val w = Window.partitionBy($"domain")
        .orderBy(Mixture.idHashUnit($"doc_id").asc, $"doc_id".asc)
      val naive = df.withColumn("__r", row_number().over(w))
        .filter($"__r" <= cap).drop("__r")
        .select("doc_id").as[Long].collect().toSet
      val got = UrlCuration.capPerDomain(df, "domain", "doc_id", cap,
        skewFactor = skewFactor, skewSalts = salts)
        .select("doc_id").as[Long].collect().toSet
      got == naive
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("mega-domain skew pre-cut: same answer as the naive window, bounded input") {
    import graft.operators.Mixture
    import org.apache.spark.sql.expressions.Window
    // one 5000-row mega-domain, two cold domains
    val docs = ((1L to 5000L).map((_, "mega.com")) ++
      (5001L to 5020L).map((_, "cold.org")) ++
      (5021L to 5023L).map((_, "tiny.net"))).toDF("doc_id", "domain")
    val cap = 5
    // the naive single-window reference (what the operator computed
    // before the skew stage existed)
    val w = Window.partitionBy($"domain")
      .orderBy(Mixture.idHashUnit($"doc_id").asc, $"doc_id".asc)
    val naive = docs.withColumn("__r", row_number().over(w))
      .filter($"__r" <= cap).drop("__r")
      .select("doc_id").as[Long].collect().toSet
    val capped = UrlCuration.capPerDomain(docs, "domain", "doc_id", cap)
      .select("doc_id").as[Long].collect().toSet
    assert(capped === naive, "salted pre-cut changed the kept set")
    // the exact window's input is bounded: <= skewSalts*cap rows for the
    // hot domain, <= the domain size for cold ones (salt 0 = exact cap)
    val pre = UrlCuration.saltedPrecut(docs, "domain", "doc_id", cap,
      skewFactor = 10, skewSalts = 32)
    val preByDom = pre.groupBy("domain").count().as[(String, Long)]
      .collect().toMap
    assert(preByDom("mega.com") <= 32L * cap,
      s"hot-domain window input not bounded: ${preByDom("mega.com")}")
    assert(preByDom("mega.com") > cap.toLong) // salted: more than one subgroup fed
    assert(preByDom("cold.org") === cap.toLong) // cold: pre-cut IS the exact cap
    assert(preByDom("tiny.net") === 3L) // under the cap: untouched
  }
}
