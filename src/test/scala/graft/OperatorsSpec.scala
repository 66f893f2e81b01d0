package graft

import graft.operators.{Corrections, Dedup, FuzzyJoin, Joins, Routing, Sharding, Similarity}
import graft.functions.osa_distance
import org.apache.spark.sql.functions._

/** Operator-level coverage: dedup family, fuzzy join (blocked ≡ unblocked
  * within blocks), fallback/range/as-of joins, routing invariants, ANN. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- dedup
  test("exactDedup keeps deterministic first per content group") {
    val df = Seq((1, "dup"), (3, "dup"), (2, "dup"), (9, "solo"))
      .toDF("id", "content")
    val out = Dedup.exactDedup(df, col("content"), col("id"))
      .as[(Int, String)].collect().toSet
    assert(out === Set((1, "dup"), (9, "solo")))
  }

  test("softDedup: unique docs always survive, keep set matches the " +
      "independently-computed 1/n hash rule, expectation ~1 per cluster") {
    // a 40-copy cluster (ids 100..139, identical canonical text), a
    // 2-copy cluster, and two singletons
    val docs = ((100L to 139L).map(i => (i, "Shared, boilerplate TEXT!")) ++
      Seq((1L, "shared boilerplate text"),
        (2L, "one unique document here"),
        (3L, "another unique document")))
      .toDF("doc_id", "text")
    // canonicalText strips case+punctuation, so doc 1 JOINS the 40-copy
    // cluster: cluster size 41
    val out = Dedup.softDedup(docs, "text", "doc_id")
      .select("doc_id", "n_docs").as[(Long, Long)].collect().toMap
    // independent reimplementation of the keep rule (SoftDedupMult draw)
    val m = 2147483647L
    def hashUnit(id: Long): Double = (id % m * 1779033703L % m).toDouble / m
    val clusterIds = (100L to 139L) :+ 1L
    val expectedKeeps = clusterIds.filter(hashUnit(_) < 1.0 / 41).toSet ++ Set(2L, 3L)
    assert(out.keySet === expectedKeeps)
    // singletons always kept with n_docs = 1
    assert(out(2L) === 1L && out(3L) === 1L)
    // surviving cluster members report the true cluster size
    assert(out.filter(_._2 == 41L).keySet === expectedKeeps -- Set(2L, 3L))
    // expected survivors per cluster is 1; with 41 members the realized
    // count is small (not the whole cluster, not forced to exactly 1)
    val kept41 = (expectedKeeps -- Set(2L, 3L)).size
    assert(kept41 >= 0 && kept41 <= 5, s"implausible 1/41 keep count $kept41")
    // NULL text fingerprints to NULL and drops — the oracle's inner-join
    // semantics (NULL keys never equi-join), pinned here
    val withNull = docs.unionByName(
      Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(!Dedup.softDedup(withNull, "text", "doc_id")
      .select("doc_id").as[Long].collect().contains(999L))
  }

  test("softDedup composes with hashSplit: survivors land in val/test " +
      "at ~the split rate (multiplier decorrelation)") {
    // 400 clusters of 10: a keep draw sharing the split's multiplier
    // would leave every survivor with split-hash < 0.1, and
    // hashSplit(0.9/0.05/0.05) — which assigns train below 0.9 — could
    // then NEVER put a survivor in val or test. SoftDedupMult vs
    // SplitMult keeps the split draw uniform over survivors.
    val docs = (0L until 4000L)
      .map(i => (i, s"cluster body text number ${i % 400} with shared words"))
      .toDF("doc_id", "text")
    val kept = Dedup.softDedup(docs, "text", "doc_id")
    val nKept = kept.count()
    assert(nKept > 200, s"implausible survivor count $nKept for 400 clusters")
    val splits = graft.operators.Mixture.hashSplit(
      kept.select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val nonTrain = splits.getOrElse("val", 0L) + splits.getOrElse("test", 0L)
    // expected ~10% of survivors; zero is the same-hash correlation bug
    assert(nonTrain > 0, "no dedup survivor ever reaches val/test — " +
      "keep draw and split draw are correlated")
    assert(nonTrain.toDouble / nKept > 0.02 && nonTrain.toDouble / nKept < 0.3,
      s"val+test share ${nonTrain.toDouble / nKept} far from the 0.1 split rate")
  }

  test("triple composition softDedup -> epochSchedule -> hashSplit: all " +
      "three draws independent end-to-end") {
    // The pairwise decorrelations (sampler->split, sampler->epoch) are
    // vetted per multiplier; this pins the THREE-WAY chain a real
    // training-data run executes: soft-dedup a corpus, schedule epochs
    // under a 2.5x token budget, split for training. 2000 clusters of
    // 10; survivors' ids are biased LOW under the SoftDedupMult draw by
    // construction, so any multiplier reuse downstream shows up as a
    // rate collapse (extra-epoch rate pinned to 0/1, or val/test
    // starved).
    val docs = (0L until 20000L)
      .map(i => (i, s"cluster body text number ${i % 2000} with shared words"))
      .toDF("doc_id", "text")
    val kept = Dedup.softDedup(docs, "text", "doc_id").select("doc_id").cache()
    val nKept = kept.count()
    // E[survivors] = 2000 (1 per cluster); 5 binomial SDs ~ +-210
    assert(nKept > 1700 && nKept < 2300, s"implausible survivor count $nKept")
    // equal per-doc token counts + a 2.5x budget => base 2 epochs each,
    // the third epoch a fair EpochMult coin per doc
    val sched = graft.operators.Mixture.epochSchedule(
      kept.withColumn("n_tok", lit(10L)), "doc_id", col("n_tok"),
      budgetTokens = nKept * 10L * 5 / 2, maxEpochs = 4)
    val perDoc = sched.groupBy("doc_id")
      .agg(max("epoch").as("e"), count(lit(1)).as("rows"))
    assert(perDoc.filter(col("rows") =!= col("e")).count() === 0,
      "epochs must be contiguous 1..e per doc")
    val nExtra = perDoc.filter(col("e") === 3).count()
    val extraRate = nExtra.toDouble / nKept
    // fair coin over ~2000 survivors: 5 SDs ~ +-0.056
    assert(extraRate > 0.42 && extraRate < 0.58,
      s"extra-epoch rate $extraRate off the 0.5 budget fraction — " +
        "softDedup and epochSchedule draws correlated")
    // split the extra-epoch survivors — two biased selections deep, the
    // split rate must still hold
    val splits = graft.operators.Mixture.hashSplit(
      perDoc.filter(col("e") === 3).select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val nonTrain = splits.getOrElse("val", 0L) + splits.getOrElse("test", 0L)
    val ntRate = nonTrain.toDouble / nExtra
    assert(ntRate > 0.04 && ntRate < 0.2,
      s"val+test share $ntRate far from the 0.1 split rate — " +
        "epochSchedule and hashSplit draws correlated")
    kept.unpersist()
  }

  test("minhash near-dup finds near-identical docs, skips distinct ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely unrelated content about spark catalyst optimizer internals"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhash near-dup flags identical token streams, skips distinct docs") {
    // identical token multisets => identical simhash => hamming 0 (and the
    // band join is guaranteed to produce the candidate); distinct docs with
    // no token overlap land far apart and are filtered.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha  beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
    assert(!pairs.contains((2L, 3L)))
  }

  test("ngram jaccard pairs") {
    val docs = Seq(
      (1L, "shared tokens one two three four five"),
      (2L, "shared tokens one two three four six"),
      (3L, "nothing in common at all here folks"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("ngram jaccard: prefix and size-band blocking agree (incl. exact-dup groups)") {
    // mixed corpus: exact duplicates (intra-group path), near-dups across
    // groups, different sizes near the threshold boundary, disjoint docs
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (7L, "epsilon delta gamma beta alpha"), // same SET as 1 (order differs)
      (3L, "alpha beta gamma delta zeta"),    // 4/6 overlap with {1,2,7}
      (4L, "alpha beta gamma delta"),         // subset, size 4 vs 5
      (5L, "one two three four five six seven"),
      (6L, "totally disjoint tokens here"))
      .toDF("doc_id", "text")
    def run(b: String) =
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.6, blocking = b)
        .as[(Long, Long, Double)].collect().toSet
    val viaPrefix = run("prefix")
    val viaSize = run("size")
    val viaAuto = run("auto")
    assert(viaPrefix === viaSize)
    assert(viaAuto === viaPrefix)
    // identical sets pair at exactly 1.0, regardless of token order
    assert(viaPrefix.filter(_._3 == 1.0).map(p => (p._1, p._2)) ===
      Set((1L, 2L), (1L, 7L), (2L, 7L)))
    // subset pair {alpha beta gamma delta} vs {..epsilon}: J = 4/5 >= 0.6
    assert(viaPrefix.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0.8))
  }

  test("ngram jaccard: prefix ≡ size on randomized corpora across thresholds") {
    // seeded random docs over a small vocab — the dense regime where the
    // two blockings diverge most in cost (never in answer)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    // short docs (2-8 tokens) AND long docs near the full vocab: the
    // long-doc stratum exercises the prefix arm's positional (PPJoin)
    // filter at suffix bounds close to alpha, where an off-by-one or
    // float round-up would silently drop a true pair — the size arm has
    // no positional filter, so any recall loss breaks the equality below
    val docs = ((1L to 120L).map { i =>
      val n = 2 + rnd.nextInt(7)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ (201L to 260L).map { i =>
      val n = 7 + rnd.nextInt(4)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.6, 0.8, 0.9, 1.0)) {
      val p = Dedup.ngramJaccardPairs(docs, "text", "doc_id", t, "prefix")
        .as[(Long, Long, Double)].collect().toSet
      val s = Dedup.ngramJaccardPairs(docs, "text", "doc_id", t, "size")
        .as[(Long, Long, Double)].collect().toSet
      assert(p === s, s"blocking paths disagree at t=$t")
      assert(p.nonEmpty, s"degenerate fixture at t=$t")
    }
  }

  test("incremental minhash index: batch-vs-corpus + in-batch pairs == one-shot restricted") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated content about spark catalyst optimizer internals"),
      (3L, "yet another fully distinct document concerning parquet readers"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again tonight"), // ~1
      (11L, "nothing like anything indexed before in this corpus at all"),
      (12L, "duplicate pair inside the incoming batch of documents"),
      (13L, "duplicate pair inside the incoming batch of documentz"))               // ~12
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_mh_idx").toString + "/idx"
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", path)
    val got = Dedup.incrementalNearDupPairs(batch, "text", "doc_id", path,
      minJaccard = 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: one-shot over the full corpus, keeping only pairs that
    // touch the batch (corpus-internal pairs were found when indexed)
    val oneShot = Dedup.minhashNearDupPairs(corpus.unionByName(batch),
        "text", "doc_id", minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 >= 10L || p._2 >= 10L)
    assert(got === oneShot)
    assert(got.contains((1L, 10L)) && got.contains((12L, 13L)))
    // appending the batch makes the index self-contained for the next day
    Dedup.appendToMinhashIndex(batch, "text", "doc_id", path)
    val next = Seq((20L, "the quick brown fox jumps over the lazy dog again and again tonight"))
      .toDF("doc_id", "text")
    val nextPairs = Dedup.incrementalNearDupPairs(next, "text", "doc_id", path,
      minJaccard = 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nextPairs.contains((10L, 20L))) // matches yesterday's batch doc
    assert(nextPairs.contains((1L, 20L)))  // and the original corpus doc
  }

  // -------------------------------------------------- connected components
  test("connectedComponents matches union-find on random graphs; long chains converge") {
    val rnd = new scala.util.Random(7)
    val nNodes = 60
    val edges = (0 until 80).map(_ => (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)) ++
      // a 25-node chain exercises pointer jumping (diameter >> a few hops)
      (100L until 124L).map(i => (i, i + 1))
    val nodes = ((0 until nNodes).map(_.toLong) ++ (100L to 124L)).distinct
    // ground truth: driver-side union-find
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val truth = nodes.map(n => n -> find(n)).toMap
    // canonical representative = min of component
    val canon = truth.groupBy(_._2).flatMap { case (_, m) =>
      val mn = m.keys.min; m.keys.map(_ -> mn) }

    val got = Dedup.connectedComponents(
      edges.toDF("id_a", "id_b"), Some(nodes.toDF("id")))
      .as[(Long, Long)].collect().toMap
    assert(got === canon)
    // the driver fast path (taken above: tiny graph) and the distributed
    // pointer-jumping loop (forced via a zero threshold) must agree
    // bit-for-bit — the threshold is a cost choice, never an answer
    // choice
    val distributed = Dedup.connectedComponents(
      edges.toDF("id_a", "id_b"), Some(nodes.toDF("id")),
      smallGraphMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(distributed === canon)
  }

  test("connectedComponents fast path handles string ids with least-ordering") {
    val edges = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }

  test("connectedComponents driver escape is byte-aware, not just row-aware") {
    import org.apache.spark.sql.types._
    // under both caps, orderable id type -> eligible
    assert(Dedup.smallGraphEligible(400000L, 6400000L, LongType,
      Dedup.SmallGraphMaxEdges, Dedup.SmallGraphMaxIdBytes))
    // row count fine but URL-like string ids blow the byte cap: 400k
    // edges x ~350B of ids ≈ 140MB raw -> hundreds of MB boxed, refuse
    assert(!Dedup.smallGraphEligible(400000L, 140L * 1024 * 1024, StringType,
      Dedup.SmallGraphMaxEdges, Dedup.SmallGraphMaxIdBytes))
    // tiny but unorderable-on-both-paths id type -> refuse
    assert(!Dedup.smallGraphEligible(10L, 100L, BinaryType,
      Dedup.SmallGraphMaxEdges, Dedup.SmallGraphMaxIdBytes))
    // and the byte gate must not break answers: wide string ids forced
    // onto the distributed loop by a 1-byte cap agree with the fast path
    val wide = "https://example.com/very/long/path/segment/" + "x" * 80
    val edges = Seq((s"$wide/a", s"$wide/b"), (s"$wide/b", s"$wide/c"))
      .toDF("id_a", "id_b")
    def run(maxBytes: Long): Map[String, String] =
      Dedup.connectedComponents(edges, smallGraphMaxIdBytes = maxBytes)
        .as[(String, String)].collect().toMap
    assert(run(1L) === run(Dedup.SmallGraphMaxIdBytes))
    assert(run(1L).values.toSet === Set(s"$wide/a"))
  }

  test("connectedComponents: fast and distributed paths agree on non-BMP " +
      "string ids, self-loops, and null endpoints") {
    // U+FFFD (EF BF BD) vs U+1F600 (F0 9F 98 80): UTF-8 byte order puts
    // U+FFFD first, while Java String.compareTo (UTF-16 code units) puts
    // the surrogate-pair emoji first — the min label must follow Spark's
    // byte order on BOTH paths
    val emoji = new String(Character.toChars(0x1F600))
    val edges = Seq(
      ("�", emoji),      // non-BMP ordering case
      ("z", "z"),             // self-loop-only node must still emit a row
      (null, "q"),            // null endpoints drop; q has no other edge
      ("m", "n")).toDF("id_a", "id_b")
    def run(threshold: Long): Map[String, String] =
      Dedup.connectedComponents(edges, smallGraphMaxEdges = threshold)
        .as[(String, String)].collect().toMap
    val fast = run(500000L)
    val dist = run(0L)
    assert(fast === dist, s"paths disagree: fast=$fast dist=$dist")
    assert(fast(emoji) === "�", "min label must follow UTF-8 byte order")
    assert(fast("z") === "z", "self-loop-only node must emit a singleton row")
    assert(!fast.contains("q"),
      "a node whose only edge had a null peer is not edge-participating")
  }

  test("dedupSurvivors keeps min id per cluster with member counts") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.dedupSurvivors(edges)
      .select("component", "n_members", "keep_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 3L, 1L), (10L, 2L, 10L)))
  }

  test("dedupSurvivorsBest keeps the top score, ties to smallest id, " +
      "fails fast on a missing score") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id") // 9 = singleton
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (9L, 1L))
      .toDF("id", "score")
    val out = Dedup.dedupSurvivorsBest(edges, scores, "id", "score",
        Some(nodes))
      .select("component", "n_members", "keep_id", "keep_score")
      .as[(Long, Long, Long, Long)].collect().toSet
    // {1,2,3}: top score 9 shared by 2 and 3 -> smallest id 2 wins;
    // singleton 9 keeps itself
    assert(out === Set((1L, 3L, 2L, 9L), (9L, 1L, 9L, 1L)))
    val e = intercept[Exception] {
      Dedup.dedupSurvivorsBest(edges, scores.filter($"id" =!= 9L),
        "id", "score", Some(nodes)).collect()
    }
    assert(e.getMessage.contains("no score for id") ||
      Option(e.getCause).exists(_.getMessage.contains("no score for id")))
  }

  // --------------------------------------------------------- separate_rows
  test("separateRows: positional zip, scalar recycling, null rows kept") {
    val df = Seq(
      ("r1", "a,b,c", "1,2,3", "keep"),  // parallel 3-lists zip by position
      ("r2", "x", "9", "solo"),          // scalars pass through
      ("r3", null, "5,6", "rec"))        // null recycled beside a 2-list
      .toDF("id", "accs", "dates", "flag")
    val out = graft.operators.SeparateRows
      .separateRows(df, ",", "accs", "dates")
      .select("id", "accs", "dates", "flag")
      .as[(String, Option[String], String, String)].collect().toSet
    assert(out === Set(
      ("r1", Some("a"), "1", "keep"), ("r1", Some("b"), "2", "keep"),
      ("r1", Some("c"), "3", "keep"),
      ("r2", Some("x"), "9", "solo"),
      ("r3", None, "5", "rec"), ("r3", None, "6", "rec")))
  }

  // ------------------------------------------------------------- fuzzy join
  test("blockedFuzzyJoin ≡ unblocked cross join filtered (within-block pairs)") {
    val l = Seq((1, 1980, "SMITH_JOHN"), (2, 1990, "DOE_JANE"))
      .toDF("lid", "by", "lname")
    val r = Seq((10, 1980, "SMTIH_JOHN"), (11, 1980, "WILSON_MARY"),
      (12, 1990, "DOE_JAN"), (13, 1991, "DOE_JANE"))
      .toDF("rid", "rby", "rname")

    val blocked = FuzzyJoin.blockedFuzzyJoin(
      l.withColumnRenamed("by", "block"), r.withColumnRenamed("rby", "block"),
      "block", col("lname"), col("rname"), 3)
      .select("lid", "rid", "distance").as[(Int, Int, Int)].collect().toSet

    val unblocked = l.crossJoin(r)
      .filter(col("by") === col("rby") &&
        osa_distance(col("lname"), col("rname")) <= 3)
      .select(col("lid"), col("rid"),
        osa_distance(col("lname"), col("rname")).as("d"))
      .as[(Int, Int, Int)].collect().toSet

    assert(blocked === unblocked)
    assert(blocked === Set((1, 10, 1), (2, 12, 1)))
    // 13 excluded purely by the block (different year), as in the reference
  }

  test("fuzzyNameMatch catches flipped names at tighter threshold") {
    // left name JOHN_SMITH; right stored flipped (first=Smith last=John):
    // straight pass compares JOHN_SMITH vs SMITH_JOHN (osa 8, miss),
    // flipped pass compares JOHN_SMITH vs flip = JOHN_SMITH (osa 0, hit).
    val l = Seq((1, 1980, "John", "Smith")).toDF("lid", "block", "lf", "ll")
    val right = Seq((10, 1980, "Smith", "John"), (11, 1980, "Zeta", "Quux"))
      .toDF("rid", "block", "rf", "rl")
    val out = FuzzyJoin.fuzzyNameMatch(
      l, col("lf"), col("ll"), right, col("rf"), col("rl"), "block")
    assert(out.select("lid", "rid").as[(Int, Int)].collect().toSet === Set((1, 10)))
  }

  // ------------------------------------------------------------- joins
  test("harmonizedUnion: intersect-only and null-fill modes") {
    val a = Seq((1, "x", 1.0)).toDF("id", "name", "score")
    val b = Seq((2, "y", true)).toDF("id", "name", "flag")
    val inter = Joins.harmonizedUnion(Seq(a, b), intersectOnly = true)
    assert(inter.columns.toSeq === Seq("id", "name") && inter.count() === 2)
    val fill = Joins.harmonizedUnion(Seq(a, b))
    assert(fill.columns.toSet === Set("id", "name", "score", "flag"))
    assert(fill.filter(col("flag").isNull).count() === 1)
    assert(fill.filter(col("score").isNull).count() === 1)
  }

  test("fallbackJoin: key1 matches win, misses retry on key2") {
    val l = Seq((1, "a", "x"), (2, "b", "y"), (3, "zz", "c"))
      .toDF("id", "k1", "k2")
    val r = Seq(("a", 100), ("c", 300)).toDF("rk", "rv")
    val out = Joins.fallbackJoin(l, r, ("k1", "rk"), ("k2", "rk"))
      .select("id", "rv").as[(Int, Int)].collect().toSet
    assert(out === Set((1, 100), (3, 300)))
  }

  test("closestDateMatch keeps min-distance candidates per anchor") {
    val cand = Seq((1, "a", 5), (1, "b", 2), (1, "c", 2), (2, "d", 7))
      .toDF("anchor", "tag", "dist")
    val out = Joins.closestDateMatch(cand, "anchor", "dist")
      .select("anchor", "tag").as[(Int, String)].collect().toSet
    assert(out === Set((1, "b"), (1, "c"), (2, "d")))
  }

  test("dateRangeJoin within [0, 30] days") {
    val l = Seq((1, "2023-01-01")).toDF("k", "ld")
      .withColumn("ld", col("ld").cast("date"))
    val r = Seq((1, "2023-01-15"), (1, "2023-02-15"), (1, "2022-12-31"))
      .toDF("k", "rd").withColumn("rd", col("rd").cast("date"))
    val out = Joins.dateRangeJoin(l, r, Seq("k"), col("ld"), col("rd"), 0, 30)
    assert(out.count() === 1)
  }

  // ------------------------------------------------------------- routing
  test("disposition is total and first-match-wins") {
    val df = Seq(("A", 1), ("B", 2), ("C", 99)).toDF("tag", "v")
    val routed = Routing.route(df, Seq(
      "one" -> (col("v") === 1),
      "small" -> (col("v") < 10)), "rest")
    val out = routed.select("tag", "disposition").as[(String, String)]
      .collect().toMap
    assert(out === Map("A" -> "one", "B" -> "small", "C" -> "rest"))
    // total: no nulls ever
    assert(routed.filter(col("disposition").isNull).count() === 0)
  }

  test("conservation holds across routed partitions") {
    val df = Seq.tabulate(20)(i => (i, i % 3)).toDF("id", "m")
    val routed = Routing.route(df, Seq(
      "a" -> (col("m") === 0), "b" -> (col("m") === 1)), "c")
    val parts = Seq("a", "b", "c").map(v => routed.filter(col("disposition") === v))
    assert(Routing.conservationHolds(df, parts))
  }

  // ------------------------------------------------------------- similarity
  test("cosine: orthogonal = 0, identical = 1, zero vector safe") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val r = df.as[Double].collect()
    assert(math.abs(r(0)) < 1e-12)
    assert(math.abs(r(1) - 1.0) < 1e-12)
    assert(r(2) === 0.0)
  }

  test("brute-force topK returns k best by cosine") {
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.9f, 0.1f, 0f)),
      (2L, Seq(0f, 1f, 0f)), (3L, Seq(-1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      Seq(1f, 0f, 0f), 2).select("vec_id").as[Long].collect().toSeq
    assert(top === Seq(0L, 1L))
  }

  test("LSH topK agrees with brute force on its own bucket contents") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val lsh = Similarity.lshTopK(vecs, "embedding", "vec_id", q, 5,
      bits = 8, probeHamming = 8) // probe everything => must equal brute force
    val brute = Similarity.bruteForceTopK(vecs, "embedding", "vec_id", q, 5)
    assert(lsh.select("vec_id").as[Long].collect().toSeq ===
      brute.select("vec_id").as[Long].collect().toSeq)
  }

  test("IVF topK: probing all cells reproduces brute force exactly") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val ivf = Similarity.ivfTopK(vecs, "embedding", "vec_id", q, 5,
      nCells = 8, nProbe = 8) // probe all cells => exact
    val brute = Similarity.bruteForceTopK(vecs, "embedding", "vec_id", q, 5)
    assert(ivf.select("vec_id").as[Long].collect().toSeq ===
      brute.select("vec_id").as[Long].collect().toSeq)
  }

  test("IVF topK with partial probing keeps recall on clustered data") {
    // two tight clusters; query near cluster A => top-5 all from A even
    // probing 1 of 4 cells
    val rnd = new scala.util.Random(5)
    def near(base: Float) = Seq.tabulate(8)(j =>
      base + (if (j == 0) 1f else 0f) + rnd.nextGaussian().toFloat * 0.01f)
    val vecs = ((0L until 50L).map(i => (i, near(1f))) ++
      (50L until 100L).map(i => (i, near(-1f)))).toDF("vec_id", "embedding")
    val q = near(1f)
    val ivf = Similarity.ivfTopK(vecs, "embedding", "vec_id", q, 5,
      nCells = 4, nProbe = 1)
    val ids = ivf.select("vec_id").as[Long].collect().toSeq
    assert(ids.size === 5 && ids.forall(_ < 50L))
  }

  test("embedding near-dup pairs finds parallel vectors only") {
    val vecs = Seq(
      (0L, Seq(1f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, Seq(2f, 2f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Seq(-1f, 4f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(vecs, "embedding", "vec_id",
      minCosine = 0.95, bands = 2, bitsPerBand = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("planEmbeddingBands: reference plan below the occupancy threshold, " +
      "occupancy-pinned bits + recall-compensated bands above, caps hold") {
    // small n: the exact reference plan (the oracle-replayed banding)
    assert(Similarity.planEmbeddingBands(2000L, 0.9) === (4, 16))
    assert(Similarity.planEmbeddingBands(2L * (1L << 16), 0.9) === (4, 16))
    // past the threshold: bits = ceil(log2(n/occ)), bands compensates
    val (b600k, w600k) = Similarity.planEmbeddingBands(600000L, 0.9)
    assert(w600k === 19, s"600k vectors should plan 19-bit bands, got $w600k")
    assert(b600k > 4 && b600k <= 8, s"bands should compensate three bits: $b600k")
    // bits monotone in n, bands monotone in bits
    val plans = Seq(1L << 20, 1L << 23, 1L << 26, 1L << 30)
      .map(Similarity.planEmbeddingBands(_, 0.9))
    assert(plans.map(_._2) === plans.map(_._2).sorted)
    assert(plans.map(_._1) === plans.map(_._1).sorted)
    // caps: a planet-scale corpus stays within maxBits/maxBands
    val (bCap, wCap) = Similarity.planEmbeddingBands(1L << 50, 0.9)
    assert(wCap === 30 && bCap === 32)
    // a tighter threshold needs fewer compensating bands (p is larger)
    val loose = Similarity.planEmbeddingBands(1L << 24, 0.90)._1
    val tight = Similarity.planEmbeddingBands(1L << 24, 0.99)._1
    assert(tight <= loose,
      s"cos 0.99 pairs agree on more planes, needs fewer bands: $tight vs $loose")
  }

  test("embeddingNearDupPairs autoPlan: identical result below the " +
      "threshold; above it (forced), exact dups always found, candidate " +
      "mass smaller, verified pair set comparable on planted near-dups") {
    val rnd = new scala.util.Random(7)
    def v64(): Seq[Float] = Seq.fill(64)(rnd.nextGaussian().toFloat)
    // 2000 random vectors + planted structure: every 40th vector gets an
    // exact x2 duplicate (cos = 1 exactly) and a noisy near-dup
    // (~cos 0.97) under shifted ids
    val base = (0L until 2000L).map(i => (i, v64()))
    val exactDups = base.filter(_._1 % 40 == 0)
      .map { case (i, v) => (10000L + i, v.map(_ * 2f)) }
    val noisyDups = base.filter(_._1 % 40 == 20)
      .map { case (i, v) => (20000L + i, v.map(x => x + rnd.nextGaussian().toFloat * 0.15f)) }
    val vecs = (base ++ exactDups ++ noisyDups).toDF("vec_id", "embedding")
    def run(auto: Boolean, occ: Double) =
      Similarity.embeddingNearDupPairs(vecs, "embedding", "vec_id",
        minCosine = 0.9, bands = 4, bitsPerBand = 16,
        autoPlan = auto, targetOccupancy = occ)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // below threshold (2120 rows, occupancy 8): autoPlan must be a no-op
    val ref = run(auto = false, occ = 8.0)
    assert(run(auto = true, occ = 8.0) === ref)
    // force the scale arm: occupancy 0.005 plans ~19-bit hyperplane bands
    val auto = run(auto = true, occ = 0.005)
    // exact dups (identical sign patterns under ANY banding) never drop
    val exactPairs = exactDups.map { case (id, _) => (id - 10000L, id) }.toSet
    assert(exactPairs.subsetOf(ref), "reference arm lost an exact dup")
    assert(exactPairs.subsetOf(auto), "auto arm lost an exact dup")
    // recall on the noisy planted pairs: comparable across arms (the
    // bands compensation holds it to the reference point; both corpora
    // and both plane families are deterministic, so these counts are
    // stable run to run)
    val noisyPlanted = noisyDups.map { case (id, _) => (id - 20000L, id) }.toSet
    val refHit = noisyPlanted.count(ref.contains)
    val autoHit = noisyPlanted.count(auto.contains)
    assert(refHit > noisyPlanted.size / 2, s"reference recall too low: $refHit")
    assert(autoHit >= refHit / 2,
      s"auto recall collapsed: $autoHit vs reference $refHit")
    // the point of the plan: candidate mass shrinks
    val cells = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
    def cand(auto: Boolean, occ: Double): Long =
      Similarity.embeddingCandidates(cells, 0.9, 4, 16, auto, occ).count()
    assert(cand(auto = true, occ = 0.005) < cand(auto = false, occ = 8.0),
      "forced auto plan should cut candidate mass on a random corpus")
  }

  test("planLshProbe: reference plan below threshold, recall-holding " +
      "radius above it, ball budget respected") {
    // small corpora: exact reference probe
    assert(Similarity.planLshProbe(2000L, 0.9) === (12, 1))
    assert(Similarity.planLshProbe(2L * (1L << 12), 0.9) === (12, 1))
    // 2M corpus: wider signature, radius re-picked to hold the binomial
    // recall at the (12, 1) reference point
    val (bits2m, h2m) = Similarity.planLshProbe(2000000L, 0.9)
    assert(bits2m === 20, s"2M corpus should plan 20-bit sigs, got $bits2m")
    assert(h2m >= 2, s"radius must widen with the signature: $h2m")
    // recall at the planned point >= recall at the reference point
    def cdfRecall(nb: Int, h: Int, t: Double): Double = {
      val q = math.acos(t) / math.Pi
      (0 to h).map(kk =>
        (BigInt(1) to BigInt(kk)).foldLeft(1.0)((a, i) =>
          a * (nb - i.toInt + 1) / i.toDouble) *
          math.pow(q, kk) * math.pow(1 - q, nb - kk)).sum
    }
    assert(cdfRecall(bits2m, h2m, 0.9) >= cdfRecall(12, 1, 0.9) - 1e-12)
    // ball budget: the explode factor stays within maxBall
    def ball(nb: Int, h: Int): Long =
      (0 to h).map(d => (BigInt(1) to BigInt(d)).foldLeft(BigInt(1))((a, i) =>
        a * (nb - i.toInt + 1) / i)).map(_.toLong).sum
    assert(ball(bits2m, h2m) <= 4096L)
    // per-query candidate fraction shrinks vs the reference
    val refFrac = ball(12, 1).toDouble / (1L << 12)
    val autoFrac = ball(bits2m, h2m).toDouble / (1L << bits2m)
    assert(autoFrac < refFrac / 2,
      s"planned probe should cut the scan fraction: $autoFrac vs $refFrac")
    // lshKnnJoin autoPlan below threshold: bit-identical to the default
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 500L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 5)
    def knn(auto: Boolean) =
      Similarity.lshKnnJoin(qs, vecs, "embedding", "vec_id", k = 3,
          autoPlan = auto)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(knn(auto = true) === knn(auto = false))
  }

  test("semDedup autoPlan: identical below the threshold; forced arm still " +
      "drops every exact planted dup and keeps the original") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 1500L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    // exact x2 copies: cos = 1, identical sign patterns AND identical
    // hyperplane signs (positive scaling), so they band together under
    // both the reference and any planned banding
    val copies = base.filter(_._1 % 50 == 0)
      .map { case (i, v) => (100000L + i, v.map(_ * 2f)) }
    val vecs = (base ++ copies).toDF("vec_id", "embedding")
    def run(auto: Boolean, occ: Double) =
      Similarity.semDedup(vecs, "embedding", "vec_id", minCosine = 0.9,
        signBits = 6, autoPlan = auto, targetOccupancy = occ)
        .select("id", "action").as[(Long, String)].collect().toMap
    val ref = run(auto = false, occ = 2.0)
    // below threshold: the auto arm is the same plan, same rows
    assert(run(auto = true, occ = 2.0) === ref)
    // forced scale arm (occupancy 0.005 -> hyperplane bands): every
    // planted copy drops, every planted original survives
    val forced = run(auto = true, occ = 0.005)
    copies.foreach { case (id, _) =>
      assert(forced(id) === "drop", s"planted copy $id not dropped")
      assert(forced(id - 100000L) === "keep", s"original ${id - 100000L} dropped")
    }
  }

  test("planIvfCells: reference cells below the occupancy threshold, " +
      "rows-per-cell pinned above, power-of-two, caps hold") {
    // small corpora: the exact explicit cell count (the oracle's plan)
    assert(Similarity.planIvfCells(5000L) === 16)
    assert(Similarity.planIvfCells(16L * 4096L) === 16)
    // past the threshold: nCells = 2^ceil(log2(n / targetCellRows)) —
    // rows per cell pinned at ~targetCellRows
    val c100m = Similarity.planIvfCells(100000000L)
    assert(c100m === 32768, s"100M vectors should plan 32768 cells: $c100m")
    assert((c100m & (c100m - 1)) === 0, "cells must stay a power of two")
    // monotone in n
    val plans = Seq(1L << 20, 1L << 24, 1L << 28).map(Similarity.planIvfCells(_))
    assert(plans === plans.sorted)
    // cap: planet scale stays within maxCells
    assert(Similarity.planIvfCells(1L << 50) === (1 << 20))
  }

  test("planIvfProbe: reference probe at/below refCells, recall-holding " +
      "growth with the cell count, probed fraction shrinks") {
    // at or below the reference cell count the plan IS the reference
    // probe — the no-op gate that keeps every oracle row bit-identical
    assert(Similarity.planIvfProbe(16) === 4)
    assert(Similarity.planIvfProbe(8) === 4)
    assert(Similarity.planIvfProbe(2) === 2) // never more probes than cells
    // finer planned cells need more probes to hold the modeled recall
    // (a fixed 4 over 128 cells covers a shrinking share of a true
    // neighbor's sign-flip displacement)
    val p128 = Similarity.planIvfProbe(128)
    val p1024 = Similarity.planIvfProbe(1024)
    assert(p128 > 4, s"128 cells should plan past the reference 4: $p128")
    assert(p1024 >= p128)
    // ...but the probed FRACTION of the corpus still shrinks as cells
    // grow — the plan trades a slowly-growing probe count for the
    // occupancy-pinned scan bound, it does not creep back to a full scan
    assert(p1024.toDouble / 1024 < p128.toDouble / 128)
    // tighter similarity targets flip fewer sign bits => fewer probes
    assert(Similarity.planIvfProbe(1024, targetCosine = 0.99) <=
      Similarity.planIvfProbe(1024, targetCosine = 0.9))
    // composed with planIvfCells: below the occupancy threshold the
    // planned (cells, probe) pair is exactly the reference operating
    // point — the end-to-end no-op gate
    assert(Similarity.planIvfProbe(Similarity.planIvfCells(5000L)) === 4)
  }

  test("ivfTopK + lshTopK autoPlan (the last fixed-parameter ANN entry " +
      "points): bit-identical below the threshold; forced plans still " +
      "self-hit and observably fire through the DEFAULT call") {
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 500L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].head()
    // ---- IVF: below threshold (500 rows << 16*4096) the default call is
    // the explicit plan, bit-for-bit (the ann_ivf_topk oracle's gate)
    def ivf(auto: Option[Boolean], cellRows: Long) = {
      val df = auto match {
        case None => Similarity.ivfTopK(vecs, "embedding", "vec_id", q,
          k = 5, nCells = 16, nProbe = 4, quantizer = "sign",
          targetCellRows = cellRows)
        case Some(a) => Similarity.ivfTopK(vecs, "embedding", "vec_id", q,
          k = 5, nCells = 16, nProbe = 4, quantizer = "sign",
          autoPlan = a, targetCellRows = cellRows)
      }
      df.select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    }
    assert(ivf(None, 4096L) === ivf(Some(false), 4096L))
    // forced plan (1 row/cell -> 512 sign-bit cells): the default call
    // routes to the planned arm (differs from the pinned 16-cell result
    // on this corpus) and the query still finds itself at cosine 1
    val forced = ivf(None, 1L)
    assert(forced === ivf(Some(true), 1L))
    assert(forced !== ivf(Some(false), 1L),
      "forced IVF plan must be observable through the default call")
    assert(forced.headOption.map(_._1) === Some(0L), s"IVF self-hit lost: $forced")
    // ---- lshTopK: same gate
    def lsh(auto: Option[Boolean], occ: Double) = {
      val df = auto match {
        case None => Similarity.lshTopK(vecs, "embedding", "vec_id", q,
          k = 5, targetOccupancy = occ)
        case Some(a) => Similarity.lshTopK(vecs, "embedding", "vec_id", q,
          k = 5, autoPlan = a, targetOccupancy = occ)
      }
      df.select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    }
    assert(lsh(None, 2.0) === lsh(Some(false), 2.0))
    val lshForced = lsh(None, 0.005) // plans a >12-bit ortho signature
    assert(lshForced === lsh(Some(true), 0.005))
    assert(lshForced !== lsh(Some(false), 0.005),
      "forced LSH plan must be observable through the default call")
    assert(lshForced.headOption.map(_._1) === Some(0L),
      s"lshTopK self-hit lost: $lshForced")
  }

  test("auto-plan PRODUCTION DEFAULTS (round 13): the occupancy-planned " +
      "arm fires through each default entry point at above-threshold n — " +
      "threshold exposed via targetOccupancy, like FuzzyMatchSpec's salt " +
      "knob — and the default call is bit-identical to explicit " +
      "autoPlan = true") {
    // deterministic corpus with noisy planted near-dups: the fixed
    // (4, 16) sign-of-dims banding and the planned hyperplane banding
    // catch DIFFERENT subsets of the ~cos 0.95 pairs, so the two arms'
    // outputs differ observably and "which arm ran" is decidable from
    // results alone — no plan-string inspection
    val rnd = new scala.util.Random(17)
    val base = (0L until 1200L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val noisy = base.filter(_._1 % 8 == 0).map { case (i, v) =>
      (50000L + i, v.map(x => x + rnd.nextGaussian().toFloat * 0.18f)) }
    val vecs = (base ++ noisy).toDF("vec_id", "embedding")
    val occ = 0.005 // 1350 rows >> occ * 2^16: far above the threshold
    // --- embeddingNearDupPairs
    def pairs(auto: Option[Boolean]) = {
      val df = auto match {
        case None => Similarity.embeddingNearDupPairs(vecs, "embedding",
          "vec_id", minCosine = 0.9, targetOccupancy = occ)
        case Some(a) => Similarity.embeddingNearDupPairs(vecs, "embedding",
          "vec_id", minCosine = 0.9, autoPlan = a, targetOccupancy = occ)
      }
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    val (pDefault, pAuto, pFixed) = (pairs(None), pairs(Some(true)), pairs(Some(false)))
    assert(pDefault === pAuto, "default call must route to the planned arm")
    assert(pDefault !== pFixed,
      "arms must differ on this corpus or the routing assert is vacuous")
    // --- semDedup
    def sem(auto: Option[Boolean]) = {
      val df = auto match {
        case None => Similarity.semDedup(vecs, "embedding", "vec_id",
          minCosine = 0.9, targetOccupancy = occ)
        case Some(a) => Similarity.semDedup(vecs, "embedding", "vec_id",
          minCosine = 0.9, autoPlan = a, targetOccupancy = occ)
      }
      df.select("id", "action").as[(Long, String)].collect().toSet
    }
    val (sDefault, sAuto, sFixed) = (sem(None), sem(Some(true)), sem(Some(false)))
    assert(sDefault === sAuto, "semDedup default must route to the planned arm")
    assert(sDefault !== sFixed,
      "semDedup arms must differ on this corpus or the routing assert is vacuous")
    // --- lshKnnJoin (occupancy knob likewise exposed; the planned probe
    // widens the signature, so neighbor sets differ on a noisy corpus)
    val qs = vecs.filter(col("vec_id") >= 50000L && col("vec_id") < 50200L)
    def knn(auto: Option[Boolean]) = {
      val df = auto match {
        case None => Similarity.lshKnnJoin(qs, vecs, "embedding", "vec_id",
          k = 3, targetOccupancy = occ)
        case Some(a) => Similarity.lshKnnJoin(qs, vecs, "embedding", "vec_id",
          k = 3, autoPlan = a, targetOccupancy = occ)
      }
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    }
    val (kDefault, kAuto, kFixed) = (knn(None), knn(Some(true)), knn(Some(false)))
    assert(kDefault === kAuto, "lshKnnJoin default must route to the planned arm")
    assert(kDefault !== kFixed,
      "lshKnnJoin arms must differ on this corpus or the routing assert is vacuous")
  }

  test("token shards: distributed prefix sum matches the global window") {
    val docs = (1L to 1000L).map(i => (i, (i % 37 + 1).toInt)).toDF("id", "ntok")
    val out = Sharding.tokenBudgetShards(docs, col("ntok"), "id", 100L)
    // truth: the single-task global-window formulation
    val truth = docs
      .withColumn("cum", sum(col("ntok"))
        .over(org.apache.spark.sql.expressions.Window.orderBy("id")))
      .select(col("id"), expr("(cum - ntok) div 100").as("tshard"))
    val mismatches = out.select(col("id"), col("shard"))
      .join(truth, Seq("id"))
      .filter(col("shard") =!= col("tshard")).count()
    assert(mismatches === 0)
    // soft cap: a shard never exceeds budget + one doc (max doc = 37 here)
    val maxShard = out.groupBy("shard").agg(sum(col("n_tokens")).as("s"))
      .agg(max(col("s"))).head().getLong(0)
    assert(maxShard <= 100L + 37L)
    // shards are dense from 0 (no doc here is bigger than the budget)
    val shards = out.select("shard").distinct().as[Long].collect().sorted.toSeq
    assert(shards === (0L until shards.length).toSeq)
  }

  test("packed shards: composite-order prefix sum matches the global window, " +
      "and sorted packing wastes less than arrival order") {
    val docs = (1L to 1000L).map(i => (i, ((i * 7) % 97 + 1).toInt)).toDF("id", "ntok")
    val out = Sharding.packedShards(docs, col("ntok"), "id", 100L)
    val truth = docs
      .withColumn("cum", sum(col("ntok"))
        .over(org.apache.spark.sql.expressions.Window
          .orderBy(col("ntok").desc, col("id"))))
      .select(col("id"), expr("(cum - ntok) div 100").as("tshard"))
    val mismatches = out.select(col("id"), col("shard"))
      .join(truth, Seq("id"))
      .filter(col("shard") =!= col("tshard")).count()
    assert(mismatches === 0)
    // waste = total overshoot beyond budget across shards; sorted packing
    // bounds each shard's overshoot by the SMALLEST doc in it, so total
    // waste must not exceed arrival-order packing's
    def waste(df: org.apache.spark.sql.DataFrame): Long = df
      .groupBy("shard").agg(sum(col("n_tokens")).as("s"))
      .agg(sum(greatest(col("s") - 100L, lit(0L)))).head().getLong(0)
    val arrival = Sharding.tokenBudgetShards(docs, col("ntok"), "id", 100L)
    assert(waste(out) <= waste(arrival))
  }

  test("id corrections: mapping + scrub + removal, conservation holds") {
    val feed = Seq(
      ("r1", "A1"),   // corrected to its full form
      ("r2", "A2"),   // corrected
      ("r3", "BAD"),  // scrub arm: mapped to null, row KEPT
      ("r4", null),   // null id rides through untouched
      ("r5", "A1"),   // same correction applied to a second row
      ("r6", "RM"),   // on the removal list -> dropped post-correction
      ("r7", "KEEP")) // no correction, not removed
      .toDF("rid", "gid")
    val corr = Seq(("A1", Some("A1-full")), ("A2", Some("A2-full")),
      ("BAD", None)).toDF("from_id", "to_id")
    val rem = Seq("RM").toDF("g")
    val out = Corrections.applyIdCorrections(feed, corr, "gid", Some(rem))
    // conservation: the correction join never changes the row count —
    // only the removal list drops rows (exactly one here)
    assert(Corrections.applyIdCorrections(feed, corr, "gid", None).count() === 7)
    assert(out.count() === 6)
    val m = out.select("rid", "gid").as[(String, Option[String])].collect().toMap
    assert(m === Map(
      "r1" -> Some("A1-full"), "r2" -> Some("A2-full"), "r3" -> None,
      "r4" -> None, "r5" -> Some("A1-full"), "r7" -> Some("KEEP")))
  }

  test("id corrections: duplicate correction keys resolve deterministically") {
    val feed = Seq(("r1", "A1")).toDF("rid", "gid")
    val corr = Seq(("A1", Some("B2")), ("A1", Some("B1")), ("A1", None))
      .toDF("from_id", "to_id")
    val out = Corrections.applyIdCorrections(feed, corr, "gid", None)
      .select("gid").as[Option[String]].collect()
    assert(out === Seq(Some("B1"))) // min non-null target wins
  }
}
