package graft

import graft.operators.{Dedup, LineDedup, RepeatedSpans, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Duplication stress smoke: replicate the documents table `copies` times
 * with distinct ids (each doc then belongs to a `copies`-sized exact-dup
 * cluster — the adversarial case for near-dup pair generation) and run
 * every near-dup variant. Validates each pair path stays
 * subquadratic-in-corpus (pairs concentrate inside real clusters: pair
 * count — and therefore verify work — tracks true-duplicate mass, not
 * corpus size squared) and reports wall time per variant.
 * Usage: runMain graft.ScaleSmoke [sfDir] [copies]
 */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sfDir, "documents")
    val big = (0 until copies).map { c =>
      base.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_.unionByName(_))
    val n = big.count()
    // every original doc forms a `copies`-clique: expect >= n_docs * C(copies,2)
    val minExpected = (n / copies) * (copies.toLong * (copies - 1) / 2)

    def timed(name: String)(pairsDf: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val pairs = pairsDf.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val ok = if (pairs >= minExpected) "ok" else "LOW"
      println(f"[scale-smoke] $name%-16s docs=$n pairs=$pairs (>=$minExpected expected, $ok) ${dt}%.1fs")
    }

    timed("minhash") {
      Dedup.minhashNearDupPairs(big, "text", "doc_id",
        shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
    }
    timed("simhash") {
      Dedup.simhashNearDupPairs(big, "text", "doc_id", maxHamming = 3)
    }
    // 0.98: the synthetic docs are template-generated — at 0.6 nearly every
    // doc pair is a TRUE near-dup (71k of 125k possible pairs at sf0.01;
    // 965k pairs at 0.9 on sf0.1, x100 under 10x duplication), so lower
    // thresholds make the smoke measure the size of the correct answer
    // rather than the blocking quality.
    timed("ngram-jaccard") {
      Dedup.ngramJaccardPairs(big, "text", "doc_id", 0.98)
    }

    // embedding variant: same construction over the embeddings table
    val ebase = Tables.load(spark, sfDir, "embeddings")
    val ebig = (0 until copies).map { c =>
      ebase.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"), col("embedding"))
    }.reduce(_.unionByName(_))
    val en = ebig.count()
    val eMinExpected = (en / copies) * (copies.toLong * (copies - 1) / 2)
    val t0 = System.nanoTime()
    val epairs = Similarity.embeddingNearDupPairs(ebig, "embedding", "vec_id",
      minCosine = 0.9).count()
    val dt = (System.nanoTime() - t0) / 1e9
    val ok = if (epairs >= eMinExpected) "ok" else "LOW"
    println(f"[scale-smoke] embedding        vecs=$en pairs=$epairs (>=$eMinExpected expected, $ok) ${dt}%.1fs")

    // full dedup chain: minhash pairs -> connected components -> survivors.
    // Every 10-copy clique must collapse to ONE survivor, so the survivor
    // count is <= the base doc count (near-dup merges may shrink further)
    // and every component must hold all `copies` replicas of its docs.
    val t1 = System.nanoTime()
    val edges = Dedup.minhashNearDupPairs(big, "text", "doc_id",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
      .select("id_a", "id_b")
    val comp = Dedup.dedupSurvivors(edges, Some(big.select(col("doc_id"))))
    val stats = comp.agg(
      count(lit(1)).as("n_comp"),
      sum(when(col("n_members") % copies === 0 || col("n_members") === 1, 0)
        .otherwise(1)).as("broken")).head()
    val dt1 = (System.nanoTime() - t1) / 1e9
    val nComp = stats.getLong(0)
    val broken = stats.getLong(1)
    val cOk = if (nComp <= n / copies && broken == 0) "ok" else "BAD"
    println(f"[scale-smoke] components       comps=$nComp (<=${n / copies}, partial-cliques=$broken, $cOk) ${dt1}%.1fs")

    // SemDeDup under duplication: every exact-copy clique collapses to one
    // kept member, so drops >= vecs - (distinct originals). Near-dup
    // merges only shrink component count further, which raises drops.
    val t2 = System.nanoTime()
    val sd = Similarity.semDedup(ebig, "embedding", "vec_id",
      minCosine = 0.9, signBits = 6)
    val drops = sd.filter(col("action") === "drop").count()
    val minDrops = en - en / copies
    val dt2 = (System.nanoTime() - t2) / 1e9
    val sdOk = if (drops >= minDrops) "ok" else "LOW"
    println(f"[scale-smoke] semdedup         vecs=$en drops=$drops (>=$minDrops expected, $sdOk) ${dt2}%.1fs")

    // Decontamination under duplication: every training doc sharing its
    // EXACT text with an eval doc must flag contaminated — an independent
    // lower bound computed by exact text join. Same operator as the
    // registry query (Decontaminate.ngramOverlap), not a re-derivation.
    val t3 = System.nanoTime()
    val evalSide = big.filter(col("doc_id") % 101 === 0)
    val train = big.filter(col("doc_id") % 101 =!= 0)
    val contaminated = graft.operators.Decontaminate
      .ngramOverlap(train, evalSide, "text", "doc_id", n = 5)
      .filter(col("contaminated") === 1).count()
    val lowerBound = train.select("doc_id", "text")
      .join(evalSide.select("text").distinct(), Seq("text"), "left_semi")
      .count()
    val dt3 = (System.nanoTime() - t3) / 1e9
    val dcOk = if (contaminated >= lowerBound && lowerBound > 0) "ok" else "LOW"
    println(f"[scale-smoke] decontaminate    train-flagged=$contaminated (>=$lowerBound exact-copy bound, $dcOk) ${dt3}%.1fs")

    // Repeated-span detection under duplication: every window of every doc
    // now repeats (copies-clique), so every doc with >= windowTokens tokens
    // must collapse to exactly ONE whole-doc span — the output stays
    // doc-bounded (one row per doc) no matter how duplicated the corpus
    // is, because spans merge per doc instead of materializing pairs.
    val t4 = System.nanoTime()
    val spans = RepeatedSpans.repeatedSpans(big, "text", "doc_id",
      windowTokens = 20, minDf = 2)
    val sStats = spans.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("doc_id")).as("docs")).head()
    val dt4 = (System.nanoTime() - t4) / 1e9
    val spanRows = sStats.getLong(0)
    val spanDocs = sStats.getLong(1)
    val spOk = if (spanRows == spanDocs && spanRows > 0) "ok" else "BAD"
    println(f"[scale-smoke] repeated-spans   rows=$spanRows docs=$spanDocs (1 whole-doc span each, $spOk) ${dt4}%.1fs")

    // Line dedup under duplication: every chunk repeats across the clique,
    // so every doc empties (clean='', n_dropped=n_chunks) — and the row
    // count stays exactly the corpus size (linear reassembly, no pair
    // blowup).
    val t5 = System.nanoTime()
    val ld = LineDedup.removeRepeatedChunks(big, "text", "doc_id",
      chunkTokens = 10, maxDf = 1)
    val lStats = ld.agg(
      count(lit(1)).as("rows"),
      sum(when(col("clean") === "", 0).otherwise(1)).as("nonEmpty")).head()
    val dt5 = (System.nanoTime() - t5) / 1e9
    val ldOk = if (lStats.getLong(0) == n && lStats.getLong(1) == 0) "ok" else "BAD"
    println(f"[scale-smoke] line-dedup       rows=${lStats.getLong(0)} non-emptied=${lStats.getLong(1)} (expect $n/0, $ldOk) ${dt5}%.1fs")

    // The composed curation chain end-to-end on the duplicated corpus:
    // gate -> chunk dedup -> minhash survivors -> decontaminate ->
    // mixture. Under total duplication the chunk-dedup stage empties
    // every doc (all chunks repeat), so the chain must drain to zero
    // WITHOUT a blowup anywhere in between — the adversarial proof that
    // composition inherits each stage's boundedness.
    val t6 = System.nanoTime()
    val src = big.withColumn("source",
      concat(lit("src"), (col("doc_id") % 20).cast("string")))
    // the 20 sources are constructed literals — build the weights table
    // from range(20), not a corpus-wide distinct inside the timed section
    val weights = spark.range(20)
      .select(concat(lit("src"), col("id").cast("string")).as("source"),
        lit(1.0).as("weight"))
    val report = graft.pipelines.Curation.attritionReport(
      src.filter(col("doc_id") % 101 =!= 0),
      src.filter(col("doc_id") % 101 === 0),
      weights, "text", "doc_id", "source",
      onStage = (stage, sec) =>
        println(f"[scale-smoke]   curation-stage $stage%-14s ${sec}%.1fs"))
      .orderBy("stage_order")
      .collect()
    val dt6 = (System.nanoTime() - t6) / 1e9
    val monotone = report.map(_.getLong(2)).sliding(2)
      .forall(w => w.length < 2 || w(1) <= w(0))
    // the drain-to-zero invariant needs actual duplication (every chunk
    // repeating across a clique); at copies=1 only monotone attrition is
    // asserted — same copies=1 carve-out as the dist-drift check below
    val drained = copies == 1 || report.last.getLong(2) == 0
    val cOk2 = if (report.length == 6 && monotone && drained) "ok" else "BAD"
    println(f"[scale-smoke] curation-chain   stages=${report.map(r => s"${r.getString(0)}:${r.getLong(2)}").mkString(",")} ($cOk2) ${dt6}%.1fs")

    // Gopher gate under duplication: a pure projection pass — row count
    // must equal the corpus size (no shuffle, no blowup), and clique
    // copies share text, so the kept count must be EXACTLY copies x the
    // base corpus's kept count (computed independently on the base).
    val t7 = System.nanoTime()
    val gf = graft.functions.GopherRules.withGopherFlags(big, "text")
    val gStats = gf.agg(count(lit(1)), sum(when(col("gopher_keep"), 1L).otherwise(0L))).head()
    val dt7 = (System.nanoTime() - t7) / 1e9
    val gKept = gStats.getLong(1)
    val baseKept = graft.functions.GopherRules.withGopherFlags(base, "text")
      .filter(col("gopher_keep")).count()
    val gOk = if (gStats.getLong(0) == n && gKept == copies * baseKept) "ok" else "BAD"
    println(f"[scale-smoke] gopher-gate      rows=${gStats.getLong(0)} kept=$gKept (rows=$n, kept == $copies x $baseKept, $gOk) ${dt7}%.1fs")

    // DSIR under duplication: both LM tables stay vocab-bounded no matter
    // the duplication factor, and the Gumbel-top-k cut returns EXACTLY k
    // rows (TakeOrderedAndProject, never corpus-sized).
    val t8 = System.nanoTime()
    val dsirRows = graft.operators.Dsir.resampleTopK(
      big.filter(col("doc_id") % 101 =!= 0),
      big.filter(col("doc_id") % 101 === 0), "text", "doc_id", k = 100).count()
    val dt8 = (System.nanoTime() - t8) / 1e9
    val dsOk = if (dsirRows == 100L) "ok" else "BAD"
    println(f"[scale-smoke] dsir-resample    selected=$dsirRows (expect 100, $dsOk) ${dt8}%.1fs")

    // Domain cap under duplication: 20 synthetic domains over the whole
    // duplicated corpus — every one a mega-domain (n/20 rows >> 10x the
    // cap), so ALL of them take the salted pre-cut, and the output is
    // exactly cap x domains rows.
    val t9 = System.nanoTime()
    val domDocs = big.select(col("doc_id"),
      concat(lit("d"), (col("doc_id") % 20).cast("string"), lit(".com")).as("domain"))
    val cappedN = graft.operators.UrlCuration
      .capPerDomain(domDocs, "domain", "doc_id", maxPerDomain = 5).count()
    val dt9 = (System.nanoTime() - t9) / 1e9
    val capOk = if (cappedN == 5L * 20) "ok" else "BAD"
    println(f"[scale-smoke] url-domain-cap   kept=$cappedN (expect ${5 * 20} over 20 mega-domains, $capOk) ${dt9}%.1fs")

    // Distribution drift under duplication: split the duplicated corpus
    // into the first and the second half of every doc's copies — two
    // snapshots with IDENTICAL token multisets (copies/2 of each base
    // doc each), so every smoothed probability is bit-identical on both
    // sides and KL and JS must be EXACTLY zero for every source.
    // (Comparing base vs the 20x corpus would NOT be zero: add-k
    // smoothing is not scale-invariant — equal halves is the exact
    // invariant.)
    val t11 = System.nanoTime()
    val srcBig = big.withColumn("source",
      concat(lit("s"), (col("doc_id") % 10000000L % 10).cast("string")))
    val copyIdx = (col("doc_id") / 10000000L).cast("long")
    // EQUAL halves, dropping the odd remainder copy: the exact-zero
    // invariant needs both snapshots to hold the same number of copies
    // of every doc — an even/odd parity split under an odd CLI `copies`
    // would give the sides different copy counts, nonzero smoothed
    // divergence, and a spurious BAD for a correct result. (copies=1
    // has no two equal halves; the check is skipped.)
    val half = copies / 2
    if (half == 0)
      println("[scale-smoke] dist-drift       skipped (copies=1: no equal halves to compare)")
    else {
      val driftRows = graft.operators.CorpusStats.distributionDrift(
        srcBig.filter(copyIdx < half),
        srcBig.filter(copyIdx >= half && copyIdx < 2L * half),
        "text", "source")
      val maxDrift = driftRows.agg(max(greatest(abs(col("kl_ab")), col("js"))))
        .head().getDouble(0)
      val dt11 = (System.nanoTime() - t11) / 1e9
      val drOk = if (maxDrift == 0.0) "ok" else "BAD"
      println(f"[scale-smoke] dist-drift       max|KL|/JS first-vs-second $half-copy halves = $maxDrift%.6f (expect 0, $drOk) ${dt11}%.1fs")
    }

    // Hash split under duplication: one projection, row-for-row, and the
    // fractions hold on 100k ids
    val t12 = System.nanoTime()
    val splits = graft.operators.Mixture.hashSplit(
      big.select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dt12 = (System.nanoTime() - t12) / 1e9
    val trainFrac = splits("train").toDouble / n
    val spOk2 = if (splits.values.sum == n && math.abs(trainFrac - 0.9) < 0.01)
      "ok" else "BAD"
    println(f"[scale-smoke] hash-split       total=${splits.values.sum} train=$trainFrac%.3f (expect $n/0.900, $spOk2) ${dt12}%.1fs")

    // Soft dedup under duplication: every canonical-text cluster has
    // exactly `copies` x its base multiplicity members, each surviving
    // with probability 1/n — expected keeps = n_clusters with binomial
    // SD ~ sqrt(n_clusters·(1 - 1/n)), so the accept window is a
    // computed ±5 SD (≈ ±358 on 5,000 clusters): tight enough that a
    // systematic keep-probability bug of even ~1.15/n lands outside it.
    // Every survivor must report a cluster size divisible by `copies`
    // (its base-cluster multiplied).
    val t17 = System.nanoTime()
    val soft = Dedup.softDedup(big, "text", "doc_id").cache()
    val softKept = soft.count()
    val nClusters = soft.select("fp").distinct().count()
    val badSize = soft.filter(col("n_docs") % copies =!= 0).count()
    val allClusters = big.select(graft.functions.TextFunctions
      .fingerprint(col("text")).as("fp")).distinct().count()
    soft.unpersist()
    val dt17 = (System.nanoTime() - t17) / 1e9
    val sd5 = (5 * math.sqrt(allClusters.toDouble)).toLong + 5
    val softOk = if (badSize == 0L && softKept >= allClusters - sd5 &&
        softKept <= allClusters + sd5) "ok" else "BAD"
    println(f"[scale-smoke] soft-dedup       kept=$softKept clusters=$allClusters surviving-clusters=$nClusters non-multiple-sizes=$badSize (expect ~1/cluster, $softOk) ${dt17}%.1fs")

    // Epoch schedule under duplication: budget 2.5x the duplicated corpus
    // -> base 2 epochs for every doc plus a hash-assigned third; row count
    // must land in [2.4, 2.6]x corpus and epochs must be exactly {1,2} or
    // {1,2,3} per doc (sequence from 1, no gaps).
    val t18 = System.nanoTime()
    val bigTok = big.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("__nt"))
    val totTok = bigTok.agg(sum("__nt")).collect()(0).getLong(0)
    val sched = graft.operators.Mixture.epochSchedule(
      bigTok, "doc_id", col("__nt"), budgetTokens = totTok * 5 / 2, maxEpochs = 4)
    val schedStats = sched.agg(count(lit(1)), max(col("epoch")), min(col("epoch")))
      .collect()(0)
    val schedRows = schedStats.getLong(0)
    val dt18 = (System.nanoTime() - t18) / 1e9
    val schedOk = if (schedRows >= n * 24 / 10 && schedRows <= n * 26 / 10 &&
        schedStats.getInt(1) == 3 && schedStats.getInt(2) == 1) "ok" else "BAD"
    println(f"[scale-smoke] epoch-schedule   rows=$schedRows (expect [${n * 24 / 10}, ${n * 26 / 10}], epochs 1..${schedStats.getInt(1)}, $schedOk) ${dt18}%.1fs")

    // Component split under duplication: CC labels over the minhash pair
    // graph — every `copies`-clique must travel WHOLE into one split
    // (zero components straddling splits; that straddle is exactly the
    // train/test near-dup leakage the operator exists to prevent), and
    // the split stays a projection: row-for-row with the corpus.
    val t16 = System.nanoTime()
    val ccLabels = Dedup.connectedComponents(edges, Some(big.select(col("doc_id"))))
    val cSplit = graft.operators.Mixture.splitByComponent(
      big.select("doc_id"), "doc_id", ccLabels,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val straddle = cSplit
      .join(ccLabels.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .groupBy("component").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    val cSplitRows = cSplit.count()
    val dt16 = (System.nanoTime() - t16) / 1e9
    val csOk = if (straddle == 0L && cSplitRows == n) "ok" else "BAD"
    println(f"[scale-smoke] component-split  rows=$cSplitRows straddling-components=$straddle (expect $n/0, $csOk) ${dt16}%.1fs")

    // Quality-policy survivors under duplication: clique members share
    // text, so scores tie and the keep goes to the SMALLEST id — which is
    // always the original (copies add c*10^7). Every keep_id must be an
    // original id and the survivor count can't exceed the base corpus.
    val t13 = System.nanoTime()
    val bestEdges = Dedup.minhashNearDupPairs(big, "text", "doc_id",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
      .select("id_a", "id_b")
    val best = Dedup.dedupSurvivorsBest(bestEdges,
      big.select(col("doc_id"),
        length(col("text")).cast("long").as("score")),
      "doc_id", "score", Some(big.select(col("doc_id").as("id"))))
    val bStats = best.agg(count(lit(1)),
      sum(when(col("keep_id") >= 10000000L, 1L).otherwise(0L))).head()
    val dt13 = (System.nanoTime() - t13) / 1e9
    val bOk = if (bStats.getLong(0) <= n / copies && bStats.getLong(1) == 0L)
      "ok" else "BAD"
    println(f"[scale-smoke] best-survivors   comps=${bStats.getLong(0)} non-original-keeps=${bStats.getLong(1)} (<=${n / copies}/0, $bOk) ${dt13}%.1fs")

    // CCNet buckets under duplication: clique members share text AND
    // source, so they land in the same bucket — every bucket count is a
    // multiple of `copies` and the scoreable total is copies x the base's
    val t14 = System.nanoTime()
    val bkts = graft.operators.NgramLm.perplexityBuckets(srcBig, "text",
      "doc_id", "source", graft.operators.NgramLm.train(srcBig, "text"))
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dt14 = (System.nanoTime() - t14) / 1e9
    // NOT bkts.size == 3: under heavy score duplication a source's
    // tercile boundaries can tie (b1 == b2), legitimately emptying the
    // 'middle' bucket — only the bucket NAMES and the copy-divisibility
    // are invariants here
    val bkOk = if (bkts.values.forall(_ % copies == 0) &&
        bkts.keySet.subsetOf(Set("head", "middle", "tail")) && bkts.nonEmpty)
      "ok" else "BAD"
    println(f"[scale-smoke] ccnet-buckets    ${bkts.map(kv => s"${kv._1}:${kv._2}").mkString(",")} (each %% $copies == 0, $bkOk) ${dt14}%.1fs")

    // Semantic decontamination under duplication: eval = the %101
    // ORIGINAL vectors; train keeps every other row INCLUDING the 19
    // exact copies of each eval vector (cosine 1.0), so at least
    // (copies-1) x |eval| train docs must flag.
    val t15 = System.nanoTime()
    val evalVecs = ebig.filter(col("vec_id") < 10000000L && col("vec_id") % 101 === 0)
    val nEval = evalVecs.count()
    val semFlagged = graft.operators.Decontaminate.semanticOverlap(
      ebig.join(evalVecs.select("vec_id"), Seq("vec_id"), "left_anti"),
      evalVecs, "embedding", "vec_id", minCosine = 0.99)
      .filter(col("contaminated") === 1).count()
    val dt15 = (System.nanoTime() - t15) / 1e9
    val semOk = if (semFlagged >= (copies - 1) * nEval) "ok" else "LOW"
    println(f"[scale-smoke] sem-decontam     flagged=$semFlagged (>=${(copies - 1) * nEval} exact-copy bound, $semOk) ${dt15}%.1fs")

    // Batched LSH k-NN join under duplication: every 10th ORIGINAL vector
    // queries the duplicated corpus. Each query's own clique (`copies`
    // identical vectors) shares its exact signature, so its bucket always
    // holds >= min(k, copies) candidates and the join returns EXACTLY
    // that many rows per query — per-query output stays k-bounded however
    // duplicated the corpus. k is capped at `copies` so the guarantee
    // holds for any CLI duplication factor.
    val t10 = System.nanoTime()
    val knnK = math.min(10, copies)
    val knnQueries = ebig.filter(col("vec_id") < 10000000L && col("vec_id") % 10 === 0)
    val nQ = knnQueries.count()
    val knnRows = Similarity.lshKnnJoin(knnQueries, ebig,
      "embedding", "vec_id", k = knnK).count()
    val dt10 = (System.nanoTime() - t10) / 1e9
    val knnOk = if (knnRows == nQ * knnK) "ok" else "BAD"
    println(f"[scale-smoke] lsh-knn-join     queries=$nQ rows=$knnRows (expect ${nQ * knnK}, $knnOk) ${dt10}%.1fs")

    spark.stop()
  }
}
