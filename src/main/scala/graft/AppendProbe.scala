package graft

import graft.operators.AnnIndex
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * One-shot A/B for the round-14 incremental appends: the claim is that
 * a daily-crawl batch joins a persisted index at ~O(batch) cost, where
 * the only alternative used to be a full-corpus rebuild (O(n) scan +
 * corpus-wide shuffle for a <1% batch). Measured here, in ONE JVM on a
 * clustered hash-gaussian corpus (the recall table's geometry):
 *
 *  - `rebuild` arm: one-shot build over the full n (what a 1%-batch
 *    ingest without appends costs);
 *  - `append` arm: build over n - batch, then `appendLsh`/`appendIvfPq`
 *    of the 1% batch — ONLY the append is timed (the base build is the
 *    sunk cost of yesterday's index).
 *
 * Equivalence is asserted, not assumed: the deterministic sign/±1
 * geometries make half-build + append BIT-IDENTICAL to the rebuild
 * (AnnAppendSpec proves it at spec scale); here a batched kNN join over
 * 40 queries must return the same (query_id, vec_id) sets from both
 * indexes, and the row counts must match. Within-session A/B, same
 * README measurement-caveat convention as KmFitProbe / EmbPlanProbe.
 * Usage: runMain graft.AppendProbe [n]
 */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 600000L
    val batchN = math.max(1L, n / 100L) // the 1% daily batch
    val dims = 64
    val perCluster = 25
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def unif(seed: Column, salt: Int): Column =
      (pmod(xxhash64(seed, lit(salt)), lit(1000000L)).cast("double") + 0.5) /
        1000000.0
    def gauss(seed: Column, salt: Int): Column =
      sqrt(lit(-2.0) * log(unif(seed, salt))) *
        cos(lit(2.0 * math.Pi) * unif(seed, salt + 1))
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), j => {
        val cSeed = (col("id") / perCluster).cast("long") * dims + j
        val pSeed = col("id") * dims + j
        (gauss(cSeed, 11) + lit(0.05) * gauss(pSeed, 13)).cast("float")
      }).as("embedding")).localCheckpoint(true)
    // the "yesterday" base and the daily batch: a hash split, so the
    // batch is distribution-matched (appends don't get a skew discount)
    val isBatch = pmod(xxhash64(col("vec_id"), lit(7)), lit(100L)) === 0
    val base = corpus.filter(!isBatch).localCheckpoint(true)
    val batch = corpus.filter(isBatch).localCheckpoint(true)
    val queries = corpus.filter(col("vec_id") % perCluster === 0 &&
        col("vec_id") < 40L * perCluster)
      .localCheckpoint(true)
    def knnSets(idx: String): Map[Long, Set[Long]] =
      AnnIndex.lshKnnJoin(spark, idx, queries, "embedding", "vec_id", k = 10)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def knnSetsPq(idx: String): Map[Long, Set[Long]] =
      AnnIndex.ivfPqKnnJoin(spark, idx, queries, corpus,
          "embedding", "vec_id", k = 10, overFetch = 4)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // ------------------------------------------------------------- LSH
    val lshFull = Tables.freshScratch("append_lsh_full") + "/idx"
    val lshInc = Tables.freshScratch("append_lsh_inc") + "/idx"
    val (_, tLshRebuild) = timed(AnnIndex.buildLsh(
      corpus, "embedding", "vec_id", lshFull, dims = dims))
    AnnIndex.buildLsh(base, "embedding", "vec_id", lshInc, dims = dims)
    val (_, tCount) = timed(spark.read.parquet(lshInc).count())
    println(f"[append] decompose: bare index count()=${tCount}%.2fs")
    val (lshAppended, tLshAppend) = timed(AnnIndex.appendLsh(
      batch, "embedding", "vec_id", lshInc))
    val lshSame = knnSets(lshInc) == knnSets(lshFull) &&
      spark.read.parquet(lshInc).count() == n
    println(f"[append] lsh n=$n batch=$lshAppended " +
      f"rebuild=${tLshRebuild}%.1fs append=${tLshAppend}%.1fs " +
      f"speedup=${tLshRebuild / tLshAppend}%.1fx same=$lshSame")

    // ------------------------------------------------------ compaction
    // fragment further (simulate a week of daily batches against the
    // same index — each append adds files to every touched group dir),
    // then measure the batched probe on the fragmented vs compacted
    // layout; answers must be identical (geometry untouched).
    (0 until 6).foreach { d =>
      AnnIndex.appendLsh(
        corpus.filter(pmod(xxhash64(col("vec_id"), lit(31)), lit(600)) === d),
        "embedding", "vec_id", lshInc)
    }
    val (fragK, tFrag) = timed(knnSets(lshInc))
    val ((filesBefore, filesAfter), tCompact) =
      timed(AnnIndex.compactIndex(spark, lshInc))
    val (compK, tComp) = timed(knnSets(lshInc))
    println(f"[append] compact files=$filesBefore->$filesAfter " +
      f"wall=${tCompact}%.1fs knn frag=${tFrag}%.1fs " +
      f"compacted=${tComp}%.1fs same=${fragK == compK}")

    // ---------------------------------------------------------- IVF-PQ
    // Equivalence here is CONTENT identity (one checksum job): the sign
    // cells and codes are geometry-deterministic, so half-build + append
    // must write the exact rows the rebuild writes. kNN sets are NOT
    // asserted equal — the frozen contract means the inc arm's centroid
    // VALUES are yesterday's member means while the rebuild's include
    // the batch, so probe RANKINGS may differ at the margin (the
    // documented drift); the mean overlap is printed as the drift
    // measurement instead.
    val pqFull = Tables.freshScratch("append_pq_full") + "/idx"
    val pqInc = Tables.freshScratch("append_pq_inc") + "/idx"
    val (_, tPqRebuild) = timed(AnnIndex.buildIvfPq(
      corpus, "embedding", "vec_id", pqFull, nCells = 16, m = 8,
      quantizer = "sign"))
    AnnIndex.buildIvfPq(base, "embedding", "vec_id", pqInc, nCells = 16,
      m = 8, quantizer = "sign")
    val (_, tCents) = timed(AnnIndex.ivfCentroids(spark, pqInc))
    val (_, tPqCount) = timed(spark.read.parquet(pqInc).count())
    println(f"[append] decompose: ivfCentroids=${tCents}%.2fs " +
      f"ivfpq count()=${tPqCount}%.2fs")
    val (pqAppended, tPqAppend) = timed(AnnIndex.appendIvfPq(
      batch, "embedding", "vec_id", pqInc))
    def contentSum(idx: String): Long = spark.read.parquet(idx)
      .select(xxhash64(col("vec_id"), col("code"),
        col("cell").cast("long")).as("h"))
      .agg(expr("bit_xor(h)").as("s")) // overflow-free, order-independent
      .head().getLong(0)
    val pqSame = contentSum(pqInc) == contentSum(pqFull) &&
      spark.read.parquet(pqInc).count() == n
    val (incK, fullK) = (knnSetsPq(pqInc), knnSetsPq(pqFull))
    val overlap = fullK.map { case (q, s) =>
      incK.getOrElse(q, Set.empty[Long]).intersect(s).size / 10.0
    }.sum / fullK.size
    println(f"[append] ivfpq n=$n batch=$pqAppended " +
      f"rebuild=${tPqRebuild}%.1fs append=${tPqAppend}%.1fs " +
      f"speedup=${tPqRebuild / tPqAppend}%.1fx contentSame=$pqSame " +
      f"knnOverlap=$overlap%.3f")

    val pass = lshSame && pqSame && overlap >= 0.95 &&
      tLshAppend < tLshRebuild && tPqAppend < tPqRebuild
    println(s"[append] ${if (pass) "ok" else "BAD"}")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
