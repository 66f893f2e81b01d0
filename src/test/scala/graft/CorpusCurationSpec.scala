package graft

import graft.operators.{LineDedup, Mixture, NgramLm}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: repeated-span removal, bigram-LM quality
  * scoring, deterministic mixture sampling. */
class CorpusCurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- LineDedup
  test("removeRepeatedChunks drops cross-doc chunks, keeps order, keeps emptied docs") {
    // chunkTokens=3: doc 1 = [shared chunk][unique tail]; doc 2 = [shared
    // chunk][other tail]; doc 3 = only the shared chunk -> fully emptied;
    // doc 4 = no overlap at all.
    val docs = Seq(
      (1L, "cookie banner text alpha beta gamma"),
      (2L, "cookie banner text delta epsilon zeta"),
      (3L, "cookie banner text"),
      (4L, "entirely original content here now yes"))
      .toDF("doc_id", "text")
    val out = LineDedup.removeRepeatedChunks(docs, "text", "doc_id",
        chunkTokens = 3, maxDf = 1)
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(out(1L) === (("alpha beta gamma", 1L, 2L)))
    assert(out(2L) === (("delta epsilon zeta", 1L, 2L)))
    assert(out(3L) === (("", 1L, 1L)))
    assert(out(4L) === (("entirely original content here now yes", 0L, 2L)))
  }

  test("removeRepeatedChunks reassembles multi-chunk survivors in original order") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "four five six totally different words here then"))
      .toDF("doc_id", "text")
    // chunk=3: doc1 chunks = [one two three][four five six][seven eight nine],
    // doc2 = [four five six][totally different words][here then]; the middle
    // chunk of doc1 is shared and must vanish without disturbing order.
    val out = LineDedup.removeRepeatedChunks(docs, "text", "doc_id",
        chunkTokens = 3, maxDf = 1)
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(out(1L) === (("one two three seven eight nine", 1L, 3L)))
    assert(out(2L) === (("totally different words here then", 1L, 3L)))
  }

  test("removeRepeatedChunks: maxDf permits repeats up to the threshold") {
    // chunk shared by 3 docs: dropped at maxDf=2; chunk shared by 2: kept
    val docs = Seq(
      (1L, "three way shared pair shared too"),
      (2L, "three way shared pair shared too"),
      (3L, "three way shared other unique tail")).toDF("doc_id", "text")
    val out = LineDedup.removeRepeatedChunks(docs, "text", "doc_id",
        chunkTokens = 3, maxDf = 2)
      .select("doc_id", "clean").as[(Long, String)].collect().toMap
    // "three way shared" df=3 -> dropped everywhere;
    // "pair shared too" df=2 -> kept in docs 1 and 2
    assert(out(1L) === "pair shared too")
    assert(out(2L) === "pair shared too")
    assert(out(3L) === "other unique tail")
  }

  test("removeRepeatedChunks: empty document keeps a zero-chunk row") {
    val docs = Seq((1L, ""), (2L, "some actual words")).toDF("doc_id", "text")
    val out = LineDedup.removeRepeatedChunks(docs, "text", "doc_id",
        chunkTokens = 3, maxDf = 1)
      .as[(Long, String, Long, Long)].collect().toMap2
    assert(out(1L) === (("", 0L, 0L)))
    assert(out(2L) === (("some actual words", 0L, 1L)))
  }

  // --------------------------------------------------- NgramLm
  test("bigram LM: hand-computed add-1 probabilities") {
    // Corpus: "a b a b" and "a c". Bigrams: (a b)x2, (b a)x1, (a c)x1.
    // Contexts: a->3, b->1. V=3.
    // P(b|a) = (2+1)/(3+3) = 0.5; P(a|b) = (1+1)/(1+3) = 0.5;
    // P(c|a) = (1+1)/(3+3) = 1/3.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = NgramLm.train(docs, "text")
    assert(m.vocabSize === 3L)
    val out = NgramLm.scoreNll(docs, "text", "doc_id", m)
      .as[(Long, Long, Double)].collect().toMap2
    val ln2 = math.log(2.0)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - BigDecimal(ln2).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val expected2 = BigDecimal(-math.log(1.0 / 3.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2 - expected2) < 1e-9)
  }

  test("bigram LM: unseen grams score pure smoothing mass") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLm.train(train, "text")   // V=2, contexts a->2, b->1
    val out = NgramLm.scoreNll(Seq((9L, "z q")).toDF("doc_id", "text"),
        "text", "doc_id", m)
      .as[(Long, Long, Double)].collect().toMap2
    // unseen context and gram: P = (0+1)/(0+2) = 0.5
    assert(math.abs(out(9L)._2 - BigDecimal(math.log(2.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("bigram LM: docs under two tokens are excluded from scoring") {
    val docs = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val m = NgramLm.train(docs, "text")
    val ids = NgramLm.scoreNll(docs, "text", "doc_id", m)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  test("bigram LM scores are invariant under training-order permutation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val m1 = NgramLm.train(docs, "text")
    val m2 = NgramLm.train(
      docs.orderBy(org.apache.spark.sql.functions.col("doc_id").desc)
        .repartition(5), "text")
    assert(m1.vocabSize === m2.vocabSize)
    val s1 = NgramLm.scoreNll(docs, "text", "doc_id", m1)
      .as[(Long, Long, Double)].collect().toSet
    val s2 = NgramLm.scoreNll(docs, "text", "doc_id", m2)
      .as[(Long, Long, Double)].collect().toSet
    assert(s1 === s2)
  }

  test("removeRepeatedChunks is idempotent on its own output (fixture)") {
    val docs = Seq(
      (1L, "cookie banner text alpha beta gamma"),
      (2L, "cookie banner text delta epsilon zeta"),
      (3L, "entirely original content here now yes"))
      .toDF("doc_id", "text")
    val once = LineDedup.removeRepeatedChunks(docs, "text", "doc_id",
      chunkTokens = 3, maxDf = 1)
    val twice = LineDedup.removeRepeatedChunks(
      once.select(col("doc_id"), col("clean").as("text")), "text", "doc_id",
      chunkTokens = 3, maxDf = 1)
    assert(twice.filter(col("n_dropped") > 0).count() === 0L)
    assert(twice.select("doc_id", "clean").as[(Long, String)].collect().toMap
      === once.select("doc_id", "clean").as[(Long, String)].collect().toMap)
  }

  test("semanticOverlap: near-duplicate embeddings flag, orthogonal ones pass, " +
      "empty eval fails fast") {
    import graft.operators.Decontaminate
    // eval = e1; train doc 10 is a tiny perturbation of e1 (cosine ~1),
    // train doc 11 is orthogonal (cosine 0), doc 12 anti-parallel
    val eval = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),
      (11L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (12L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Decontaminate.semanticOverlap(train, eval, "embedding", "vec_id",
        minCosine = 0.95)
      .select("vec_id", "n_semantic_hits", "contaminated")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) === ((1L, 1)))
    assert(out(11L) === ((0L, 0)))
    assert(out(12L) === ((0L, 0)))
    val e = intercept[IllegalArgumentException] {
      Decontaminate.semanticOverlap(train, eval.filter($"vec_id" < 0),
        "embedding", "vec_id", 0.95)
    }
    assert(e.getMessage.contains("eval set is empty"))
  }

  test("semanticOverlap large-eval path: broadcast-join form equals the " +
      "literal fold, and actually joins instead of inlining the plan tree") {
    import graft.operators.Decontaminate
    // 40 train x 25 eval vectors with planted hits: train doc i is a
    // perturbation of eval vec i%25 for i < 10, orthogonal-ish otherwise;
    // duplicate eval vectors planted to check the distinct-once contract
    val eval = ((1 to 25).map(i =>
        (100L + i, Seq(math.cos(i * 0.25), math.sin(i * 0.25), 0.0, 0.0)
          .map(_.toFloat))) ++
      Seq((200L, Seq(math.cos(0.25), math.sin(0.25), 0.0, 0.0).map(_.toFloat))))
      .toDF("vec_id", "embedding")
    val train = (0 until 40).map { i =>
      val v =
        if (i < 10) Seq(math.cos((i % 25 + 1) * 0.25) + 0.001,
          math.sin((i % 25 + 1) * 0.25), 0.0, 0.0)
        else Seq(0.0, 0.0, math.cos(i * 0.7), math.sin(i * 0.7))
      (i.toLong, v.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "n_semantic_hits", "contaminated")
        .as[(Long, Long, Int)].collect().toSet
    val literal = Decontaminate.semanticOverlap(
      train, eval, "embedding", "vec_id", minCosine = 0.999)
    // force the broadcast arm: 26 vectors x 4 dims = 104 elements > 8
    val joined = Decontaminate.semanticOverlap(
      train, eval, "embedding", "vec_id", minCosine = 0.999,
      maxLiteralElements = 8L)
    assert(joined.queryExecution.executedPlan.toString.contains("Join"),
      "past the element threshold the eval set must ride a broadcast " +
        "join, not the plan tree")
    assert(rows(joined) === rows(literal))
    assert(rows(literal).exists(_._3 == 1) && rows(literal).exists(_._3 == 0),
      "fixture must exercise both hit and miss rows")
  }

  test("epochSchedule: floor epochs for all, fractional epoch by hash, " +
      "maxEpochs cap, subsample degenerate, zero budget") {
    val docs = (1L to 8L).map(i => (i, 25L)).toDF("doc_id", "n_tokens") // 200 tokens
    // independent reimplementation of the EpochMult fractional draw
    val m = 2147483647L
    def hashUnit(id: Long): Double = (id % m * (3266489917L % m) % m).toDouble / m
    // budget 500 -> ratio 2.5: two epochs for everyone, a third iff hash < 0.5
    val out = Mixture.epochSchedule(docs, "doc_id", col("n_tokens"), 500L)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("epoch").as("mx"))
      .as[(Long, Long, Int)].collect().toMap2
    (1L to 8L).foreach { id =>
      val expect = 2 + (if (hashUnit(id) < 0.5) 1 else 0)
      assert(out(id) === ((expect.toLong, expect)), s"doc $id")
    }
    // budget >> corpus x 4 -> everyone exactly maxEpochs
    val capped = Mixture.epochSchedule(docs, "doc_id", col("n_tokens"), 100000L)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(capped.size === 8 && capped.values.toSet === Set(4L))
    // budget < corpus -> uniform subsample (base 0): hash < 0.25 keeps, 1 epoch
    val sub = Mixture.epochSchedule(docs, "doc_id", col("n_tokens"), 50L)
      .select("doc_id", "epoch").as[(Long, Int)].collect()
    assert(sub.forall(_._2 == 1))
    assert(sub.map(_._1).toSet === (1L to 8L).filter(hashUnit(_) < 0.25).toSet)
    // zero budget schedules nothing
    assert(Mixture.epochSchedule(docs, "doc_id", col("n_tokens"), 0L).count() === 0L)
    // a NULL token count is skipped by the corpus-total SUM (both
    // engines) but the doc still receives epochs: with doc 9's tokens
    // null the total stays 200, ratio stays 2.5, and doc 9 schedules
    // 2 + (hash < 0.5) epochs like everyone else
    val withNull = docs.unionByName(Seq((9L, null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "n_tokens"))
    val nullOut = Mixture.epochSchedule(withNull, "doc_id", col("n_tokens"), 500L)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(nullOut(9L) === (2L + (if (hashUnit(9L) < 0.5) 1 else 0)))
    assert((1L to 8L).forall(id => nullOut(id) === out(id)._1))
  }

  test("contaminatedIds is exactly ngramOverlap's contaminated set " +
      "(minimal signal == full per-doc counts filtered)") {
    import graft.operators.Decontaminate
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon suffix words"), // hit mid-doc
      (2L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"), // gram repeats within one doc
      (3L, "completely unrelated text with no shared five gram at all"),
      (4L, "short doc"), // whole-text-fallback gram, no hit
      (5L, "alpha beta gamma delta epsilon")) // exact 5-token doc == the eval gram
      .toDF("doc_id", "text")
    val ids = Decontaminate.contaminatedIds(train, eval, "text", "doc_id")
      .as[Long].collect().toSet
    val full = Decontaminate.ngramOverlap(train, eval, "text", "doc_id")
    assert(ids === full.filter($"contaminated" === 1)
      .select("doc_id").as[Long].collect().toSet)
    assert(ids === Set(1L, 2L, 5L))
    // zero-overlap docs are restored with explicit zero counts, not dropped
    assert(full.filter($"contaminated" === 0).select("doc_id")
      .as[Long].collect().toSet === Set(3L, 4L))
    // within-doc gram repetition counts once (distinct grams, not occurrences)
    assert(full.filter($"doc_id" === 2L).select("n_overlap")
      .as[Long].head() === 1L)
  }

  test("perplexityBuckets: per-group terciles — fluent head, soup tail, " +
      "short docs excluded") {
    import graft.operators.NgramLm
    // one group: 9 scoreable docs — 3 made of a heavily repeated bigram
    // (c12 ~ c1, low nll), 3 of a lightly repeated one, 3 rare-word soup
    // (every bigram count 1, high nll) — plus a 1-token doc that must be
    // excluded. Counts, not intuition, set the order: under add-k, nll
    // tracks -ln((c12+1)/(c1+V)), so separation needs c12 separation.
    val fluent = ("aa bb " * 10).trim
    val mixed = "cc dd cc dd"
    val soup = Seq("zeta quux fnord blarg wibble", "corge grault xyzzy plugh thud",
      "snark boojum frabjous vorpal tove")
    val docs = (
      (1L to 3L).map((_, "g1", fluent)) ++
      (4L to 6L).map((_, "g1", mixed)) ++
      soup.zipWithIndex.map { case (t, i) => (7L + i, "g1", t) } ++
      Seq((99L, "g1", "solo"))).toDF("doc_id", "source", "text")
    val out = NgramLm.perplexityBuckets(docs, "text", "doc_id", "source",
        NgramLm.train(docs, "text"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(!out.contains(99L)) // short doc excluded
    assert(out.size === 9)
    // terciles: the three fluent docs are the head, the soup is the tail
    (1L to 3L).foreach(id => assert(out(id) === "head", s"doc $id: ${out(id)}"))
    (7L to 9L).foreach(id => assert(out(id) === "tail", s"doc $id: ${out(id)}"))
    (4L to 6L).foreach(id => assert(out(id) === "middle", s"doc $id: ${out(id)}"))
  }

  test("perplexityBuckets: approxBounds agrees with exact terciles on a " +
      "realistic NLL distribution") {
    import graft.operators.NgramLm
    // 120 docs over 2 groups with a realistic spread of scores: doc i
    // repeats a common bigram i%7 times and adds i%13 rare words, so
    // avg_nll takes many distinct values per group (not a 3-level
    // fixture). At default accuracy (1e5, far above the doc count) the
    // sketch is effectively exact and the bucket assignment must agree
    // with the exact-percentile default for every document.
    val docs = (1 to 120).map { i =>
      val common = Seq.fill(1 + i % 7)("aa bb").mkString(" ")
      val rare = (0 until i % 13).map(j => s"rare${i}x$j").mkString(" ")
      (i.toLong, s"g${i % 2}", s"$common $rare".trim)
    }.toDF("doc_id", "source", "text")
    val model = NgramLm.train(docs, "text")
    val exact = NgramLm.perplexityBuckets(docs, "text", "doc_id", "source",
      model).select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val approx = NgramLm.perplexityBuckets(docs, "text", "doc_id", "source",
        model, approxBounds = true)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(approx.keySet === exact.keySet)
    val disagree = exact.keys.filter(id => exact(id) != approx(id))
    assert(disagree.isEmpty,
      s"approx buckets diverged for docs: ${disagree.toSeq.sorted}")
  }

  test("scoreNllCarrying: carrying the id column or a duplicate fails fast") {
    import graft.operators.NgramLm
    val docs = Seq((1L, "s1", "aa bb cc")).toDF("doc_id", "source", "text")
    val model = NgramLm.train(docs, "text")
    val e1 = intercept[IllegalArgumentException] {
      NgramLm.perplexityBuckets(docs, "text", "doc_id", "doc_id", model)
    }
    assert(e1.getMessage.contains("must not repeat the id"))
    // the duplicate-carry arm, unreachable through perplexityBuckets
    // (single carry column), exercised directly
    val e2 = intercept[IllegalArgumentException] {
      NgramLm.scoreNllCarrying(docs, "text", "doc_id",
        Seq("source", "source"), model, 1.0)
    }
    assert(e2.getMessage.contains("must not repeat the id"))
  }

  test("hashSplit: deterministic, exhaustive, fractions validated") {
    import graft.operators.Mixture
    val docs = spark.range(0, 10000).toDF("doc_id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Mixture.hashSplit(docs, "doc_id", fr)
    val bydist = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    // exhaustive: every row in exactly one split, all three present
    assert(bydist.values.sum === 10000L)
    assert(bydist.keySet === Set("train", "val", "test"))
    // hash-uniform: fractions hold within a loose tolerance
    assert(bydist("train") > 7500 && bydist("train") < 8500, bydist.toString)
    // deterministic across calls AND across an appended corpus (the
    // leakage-safety property: old ids keep their split)
    val s2 = Mixture.hashSplit(spark.range(0, 20000).toDF("doc_id"),
      "doc_id", fr).filter($"doc_id" < 10000)
    assert(s1.orderBy("doc_id").select("split").as[String].collect().toSeq ===
      s2.orderBy("doc_id").select("split").as[String].collect().toSeq)
    val e = intercept[IllegalArgumentException] {
      Mixture.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("sampleByWeight then hashSplit: survivors reach val/test at ~the " +
      "split rate (SplitMult decorrelation)") {
    import graft.operators.Mixture
    // keep ~20% by the samplers' Knuth draw: every survivor has
    // Knuth-hash < 0.2 — a split drawing from the SAME hash could never
    // assign one past the 0.2 boundary, so val/test (hash >= 0.9) would
    // be empty. The split's own SplitMult draw stays uniform on them.
    val docs = spark.range(0, 10000).toDF("doc_id")
      .withColumn("w", lit(0.2))
    val kept = Mixture.sampleByWeight(docs, "doc_id", "w")
    val nKept = kept.count()
    assert(nKept > 1000, s"implausible keep count $nKept at w=0.2")
    val splits = Mixture.hashSplit(kept.select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val nonTrain = splits.getOrElse("val", 0L) + splits.getOrElse("test", 0L)
    assert(nonTrain > 0, "no sampled survivor ever reaches val/test — " +
      "sampler and split draws are correlated")
    assert(nonTrain.toDouble / nKept > 0.02 && nonTrain.toDouble / nKept < 0.3,
      s"val+test share ${nonTrain.toDouble / nKept} far from the 0.1 split rate")
  }

  test("sampleByWeight then epochSchedule: fractional epoch rate stays " +
      "~frac over survivors (EpochMult decorrelation)") {
    // keep ~20% by the samplers' Knuth draw, then schedule at ratio 2.5
    // over the survivors: a fractional-epoch draw correlated with the
    // keep draw hands EVERY survivor the third epoch (rows = 3.0x
    // docs) instead of half of them (rows = 2.5x). The first EpochMult
    // candidate failed exactly this — it looked random but was
    // ≡ 2·KnuthMult + 14 (mod m), measured rate 1.0.
    import graft.operators.Mixture
    val docs = spark.range(0, 20000).toDF("doc_id")
      .withColumn("w", lit(0.2)).withColumn("n_tokens", lit(10L))
    val kept = Mixture.sampleByWeight(docs, "doc_id", "w")
      .select("doc_id", "n_tokens")
    val nKept = kept.count()
    assert(nKept > 2000, s"implausible keep count $nKept at w=0.2")
    val budget = nKept * 10L * 5 / 2 // ratio exactly 2.5 over survivors
    val rows = Mixture.epochSchedule(kept, "doc_id", col("n_tokens"), budget)
      .count()
    val perDoc = rows.toDouble / nKept
    assert(perDoc > 2.4 && perDoc < 2.6,
      s"rows/doc $perDoc — fractional epoch draw correlated with the " +
        "keep draw (expect ~2.5)")
  }

  test("distributionDrift: zero on identical corpora, positive on a shifted " +
      "source, finite for a B-only source") {
    import graft.operators.CorpusStats
    val a = Seq((1L, "s1", "the cat sat on the mat"),
      (2L, "s1", "the dog ran far"), (3L, "s2", "alpha beta gamma delta"))
      .toDF("doc_id", "source", "text")
    val same = CorpusStats.distributionDrift(a, a, "text", "source")
      .select("source", "kl_ab", "js").as[(String, Double, Double)]
      .collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(same("s1") === ((0.0, 0.0)))
    assert(same("s2") === ((0.0, 0.0)))
    // shift s2 only; s1 must stay exactly zero, s2 strictly positive
    val b = a.withColumn("text",
      when($"source" === "s2", concat($"text", lit(" spam spam spam")))
        .otherwise($"text"))
    val drift = CorpusStats.distributionDrift(a, b, "text", "source")
      .select("source", "kl_ab", "js").as[(String, Double, Double)]
      .collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(drift("s1") === ((0.0, 0.0)))
    assert(drift("s2")._1 > 0 && drift("s2")._2 > 0)
    // a source present only on one side smooths, never NaN/Inf (its
    // absent side is uniform, so a SKEWED new source must diverge —
    // an all-distinct-token text would be uniform too and honestly
    // score zero)
    val bNew = b.union(Seq((9L, "s3", "new new new new source text"))
      .toDF("doc_id", "source", "text"))
    val withNew = CorpusStats.distributionDrift(a, bNew, "text", "source")
      .select("source", "n_tokens_a", "kl_ab", "js")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(withNew("s3")._1 === 0L)
    assert(!withNew("s3")._2.isNaN && !withNew("s3")._2.isInfinite)
    assert(!withNew("s3")._3.isNaN && withNew("s3")._3 > 0)
  }

  test("HLL sketches: batch-union estimate equals the one-shot estimate exactly") {
    import graft.operators.CorpusStats
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // one-shot sketch over everything
    val oneShot = CorpusStats.estimates(
      CorpusStats.tokenSketches(docs, "text", "source"), "source")
      .as[(String, Long)].collect().toMap
    // same corpus sketched as two batches, then merged — HLL union is a
    // register-wise max, so this must be EXACTLY equal, not approximately
    val merged = CorpusStats.estimates(
      CorpusStats.mergeSketches(
        CorpusStats.tokenSketches(
          docs.filter($"doc_id" % 2 === 0), "text", "source")
          .unionByName(CorpusStats.tokenSketches(
            docs.filter($"doc_id" % 2 =!= 0), "text", "source")),
        "source"), "source")
      .as[(String, Long)].collect().toMap
    assert(merged === oneShot)
    // and the estimate is close to the exact count
    val exact = docs
      .select($"source", explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .groupBy("source").agg(countDistinct($"t").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (src, n) =>
      assert(math.abs(merged(src) - n) <= math.max(1L, (n * 0.05).toLong),
        s"estimate off for $src: ${merged(src)} vs $n")
    }
  }

  // --------------------------------------------------- Mixture
  test("mixture sampling hits per-source fractions deterministically") {
    // source hot: 400 docs x 10 tokens = 4000; source cold: 100 x 10 = 1000.
    // weights 1:1, budget 2000 -> f(hot) = 1000/4000 = 0.25,
    // f(cold) = 1000/1000 = 1.0 (cap arm: min(1, 1.0)).
    val docs = (0L until 400L).map(i => (i, "hot", 10))
      .++((1000L until 1100L).map(i => (i, "cold", 10)))
      .toDF("doc_id", "source", "n_tokens")
    val weights = Seq(("hot", 1.0), ("cold", 1.0)).toDF("source", "weight")
    val kept = Mixture.sampleByTokenBudget(docs, "doc_id", "source",
      col("n_tokens"), weights, budgetTokens = 2000L)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("cold") === 100L)          // fraction capped at 1.0
    assert(bySource("hot") > 50L && bySource("hot") < 150L) // ~0.25 of 400
    // deterministic: the same call selects the same ids
    val again = Mixture.sampleByTokenBudget(docs, "doc_id", "source",
      col("n_tokens"), weights, budgetTokens = 2000L)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ===
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("mixture sampling fails fast on uncovered source and bad id") {
    val docs = Seq((1L, "known", 5), (2L, "orphan", 5))
      .toDF("doc_id", "source", "n_tokens")
    val weights = Seq(("known", 1.0)).toDF("source", "weight")
    val eMissing = intercept[Exception] {
      Mixture.sampleByTokenBudget(docs, "doc_id", "source",
        col("n_tokens"), weights, budgetTokens = 1000L).collect()
    }
    assert(eMissing.getMessage.contains("no weight for source"))
    val badId = Seq(("not-a-number", "known", 5))
      .toDF("doc_id", "source", "n_tokens")
    val eBadId = intercept[Exception] {
      Mixture.sampleByTokenBudget(badId, "doc_id", "source",
        col("n_tokens"), weights, budgetTokens = 1000L).collect()
    }
    assert(eBadId.getMessage.contains("idHashUnit"))
  }

  test("mixture sampling: zero-weight source contributes nothing") {
    val docs = (0L until 50L).map(i => (i, if (i % 2 == 0) "a" else "b", 5))
      .toDF("doc_id", "source", "n_tokens")
    val weights = Seq(("a", 1.0), ("b", 0.0)).toDF("source", "weight")
    val kept = Mixture.sampleByTokenBudget(docs, "doc_id", "source",
      col("n_tokens"), weights, budgetTokens = 1000L)
    assert(!kept.select("source").as[String].collect().contains("b"))
  }

  test("splitByComponent: cluster-mates share a split; dup-free corpus " +
      "matches hashSplit bit-for-bit") {
    import graft.operators.Mixture
    val docs = spark.range(0, 2000).toDF("doc_id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // components: ids 0..999 clustered in tens (component = floor(id/10)*10)
    val comps = spark.range(0, 1000)
      .select($"id", ($"id" - $"id" % 10).as("component"))
    val out = Mixture.splitByComponent(docs, "doc_id", comps, fr)
    // every cluster lands whole: one distinct split per component
    val straddlers = out.filter($"doc_id" < 1000)
      .groupBy(($"doc_id" - $"doc_id" % 10).as("c"))
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count()
    assert(straddlers === 0L)
    // docs with no component row split exactly as hashSplit would
    val noComp = out.filter($"doc_id" >= 1000)
      .orderBy("doc_id").select("split").as[String].collect().toSeq
    val plain = Mixture.hashSplit(docs, "doc_id", fr)
      .filter($"doc_id" >= 1000)
      .orderBy("doc_id").select("split").as[String].collect().toSeq
    assert(noComp === plain)
    // a singleton-component frame (component = own id) is also identical
    // to hashSplit — the dup-free-corpus equivalence
    val singletons = spark.range(0, 2000)
      .select($"id", $"id".as("component"))
    val viaSingle = Mixture.splitByComponent(docs, "doc_id", singletons, fr)
      .orderBy("doc_id").select("split").as[String].collect().toSeq
    val viaHash = Mixture.hashSplit(docs, "doc_id", fr)
      .orderBy("doc_id").select("split").as[String].collect().toSeq
    assert(viaSingle === viaHash)
  }

  test("sampleByWeight: probability-proportional keep, deterministic, " +
      "fails fast on null/negative/NaN weights") {
    import graft.operators.Mixture
    val docs = spark.range(0, 4000)
      .select($"id".as("doc_id"),
        when($"id" < 2000, 1.0).otherwise(0.25).as("w"))
    val kept = Mixture.sampleByWeight(docs, "doc_id", "w")
    val byW = kept.groupBy("w").count().as[(Double, Long)].collect().toMap
    assert(byW(1.0) === 2000L)                       // weight 1 keeps all
    assert(byW(0.25) > 350L && byW(0.25) < 650L)     // ~0.25 of 2000
    val again = Mixture.sampleByWeight(docs, "doc_id", "w")
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ===
      again.select("doc_id").as[Long].collect().sorted.toSeq)
    for (bad <- Seq(null.asInstanceOf[java.lang.Double],
        java.lang.Double.valueOf(-0.5),
        java.lang.Double.valueOf(Double.NaN))) {
      val df = Seq((1L, bad)).toDF("doc_id", "w")
      val e = intercept[Exception] {
        Mixture.sampleByWeight(df, "doc_id", "w").collect()
      }
      assert(e.getMessage.contains("sampleByWeight"), s"weight=$bad")
    }
  }

  test("sampleByTemperature: alpha extremes, zero-token source excluded " +
      "from the weight mass, null source fails fast") {
    import graft.operators.Mixture
    // big: 300 docs x 10 tok = 3000; small: 100 x 10 = 1000.
    val docs = ((0L until 300L).map(i => (i, "big", 10)) ++
      (1000L until 1100L).map(i => (i, "small", 10)))
      .toDF("doc_id", "source", "n_tokens")
    // alpha=1 (proportional): w ∝ tokens, budget 2000 of 4000 total
    // -> every source keeps fraction 1/2.
    val p = Mixture.sampleByTemperature(docs, "doc_id", "source",
      col("n_tokens"), alpha = 1.0, budgetTokens = 2000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(p("big") > 100L && p("big") < 200L, p.toString)
    assert(p("small") > 25L && p("small") < 75L, p.toString)
    // alpha=0 (equal share): budget 2000 -> 1000 tokens per source
    // -> big keeps 1/3, small keeps all (cap).
    val eq = Mixture.sampleByTemperature(docs, "doc_id", "source",
      col("n_tokens"), alpha = 0.0, budgetTokens = 2000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(eq("small") === 100L, eq.toString)
    assert(eq("big") > 50L && eq("big") < 150L, eq.toString)
    // a zero-token source must NOT dilute real sources at alpha=0:
    // with pow(0,0)=1 it would claim a third of the mass; excluded, the
    // two real sources still split the budget between them.
    val withEmpty = docs.union(
      (2000L until 2050L).map(i => (i, "empty", 0)).toDF("doc_id", "source", "n_tokens"))
    val eq2 = Mixture.sampleByTemperature(withEmpty, "doc_id", "source",
      col("n_tokens"), alpha = 0.0, budgetTokens = 2000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(!eq2.contains("empty"), eq2.toString)
    assert(eq2("small") === 100L, eq2.toString)
    assert(eq2("big") > 50L && eq2("big") < 150L, eq2.toString)
    // a NULL source never matches the fraction join -> must raise, not
    // silently vanish
    val withNull = docs.union(
      Seq((3000L, null.asInstanceOf[String], 10)).toDF("doc_id", "source", "n_tokens"))
    val eNull = intercept[Exception] {
      Mixture.sampleByTemperature(withNull, "doc_id", "source",
        col("n_tokens"), alpha = 0.5, budgetTokens = 2000L).collect()
    }
    assert(eNull.getMessage.contains("sampleByTemperature"))
    // alpha outside [0,1] is a caller bug
    val eAlpha = intercept[IllegalArgumentException] {
      Mixture.sampleByTemperature(docs, "doc_id", "source",
        col("n_tokens"), alpha = 1.5, budgetTokens = 2000L)
    }
    assert(eAlpha.getMessage.contains("alpha"))
  }

  private implicit class MapOps[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
  private implicit class MapOps3[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
