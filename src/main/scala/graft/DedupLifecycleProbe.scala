package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale A/B for the minhash index lifecycle (round 15): against indexes
 * of ¼ / ½ / 1× of a documents corpus, measure
 *
 *  - the per-batch PROBE cost (`incrementalNearDupPairs` of a fixed
 *    held-out batch) — expected to track the index scan plus collision
 *    mass: the batch side broadcasts, so the slope against index size
 *    is the honest price of the stored-shingle verify design;
 *  - the takedown cost (`deleteFromMinhashIndex` of a fixed id set) —
 *    expected O(ids), flat against index size;
 *  - the compaction cost (`compactMinhashIndex`) — expected O(index),
 *    the full-rewrite slope that motivates running it at maintenance
 *    cadence rather than per delete.
 *
 * Correctness rides along: at the full size a tombstoned doc must
 * vanish from the probe's pairs, and the post-compaction probe must
 * match the pre-compaction survivor pairs exactly. Exits nonzero on
 * violation.
 *
 * Usage: runMain graft.DedupLifecycleProbe <dir-with-documents.parquet>
 *        [batchDocs] [deleteIds]
 * (point it at /root/testdata/sf0.1 or a ScaleCorpus-derived dir)
 */
object DedupLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchDocs = if (args.length > 1) args(1).toInt else 1000
    val nDel = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    // fixed held-out batch + fixed corpus: the batch replicates corpus
    // docs under fresh ids so the probe has guaranteed cross-matches
    val isBatchSrc = pmod(xxhash64(col("doc_id"), lit(3)), lit(50L)) === 0
    val corpus = docs.filter(!isBatchSrc).localCheckpoint(true)
    val batch = docs.filter(isBatchSrc).limit(batchDocs)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val nCorpus = corpus.count()
    val nBatch = batch.count()
    println(s"[probe] dedup_lifecycle corpus=$nCorpus batch=$nBatch " +
      s"delete=$nDel dir=$dir")

    def fraction(den: Long) =
      if (den == 1L) corpus
      else corpus.filter(pmod(xxhash64(col("doc_id"), lit(5)), lit(den)) === 0)

    val walls = Seq(4L, 2L, 1L).map { den =>
      val sub = fraction(den)
      val n = sub.count()
      val idx = Tables.freshScratch(s"dlprobe_$den") + "/idx"
      val (_, tBuild) = timed(Dedup.buildMinhashIndex(sub, "text",
        "doc_id", idx, shingleK = 5, numHashes = 16, bands = 4))
      val (pairs, tProbe) = timed(
        Dedup.incrementalNearDupPairs(batch, "text", "doc_id", idx,
          shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
          .collect())
      val (_, tCompact) = timed(Dedup.compactMinhashIndex(spark, idx))
      println(f"[probe] dedup_lifecycle size=$n build=$tBuild%.1fs " +
        f"probe=$tProbe%.1fs pairs=${pairs.length} compact=$tCompact%.1fs")
      (n, idx, pairs, tProbe, tCompact)
    }

    // correctness at the full size: tombstone the corpus twins of some
    // matched pairs -> those pairs must vanish from the probe, and the
    // post-compaction probe must equal the survivor set exactly
    val (nFull, fullIdx, fullPairs, _, _) = walls.last
    val matchedCorpusIds = fullPairs
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .filter(_ < 1000000000L).distinct.take(nDel)
    import spark.implicits._
    val doomed = matchedCorpusIds.toSeq.toDF("doc_id")
    val (nTomb, tDel) = timed(Dedup.deleteFromMinhashIndex(spark, fullIdx,
      doomed, idCol = "doc_id"))
    val (afterDel, tProbeDel) = timed(
      Dedup.incrementalNearDupPairs(batch, "text", "doc_id", fullIdx,
        shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
        .collect())
    val dead = matchedCorpusIds.toSet
    val leak = afterDel.exists(r => dead(r.getLong(0)) || dead(r.getLong(1)))
    val (_, tVacCompact) = timed(Dedup.compactMinhashIndex(spark, fullIdx))
    val afterCompact = Dedup.incrementalNearDupPairs(batch, "text",
      "doc_id", fullIdx, shingleK = 5, numHashes = 16, bands = 4,
      minJaccard = 0.5).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1))
    val same = afterCompact.map(key).toSet == afterDel.map(key).toSet
    println(f"[probe] dedup_lifecycle delete ids=$nTomb wall=$tDel%.1fs " +
      f"probe_with_tombstones=$tProbeDel%.1fs " +
      f"compact_after_delete=$tVacCompact%.1fs size=$nFull")
    println(s"[probe] dedup_lifecycle no_leak=${!leak} " +
      s"compact_identical=$same " + (if (!leak && same) "ok" else "BAD"))
    spark.stop()
    if (leak || !same) sys.exit(1)
  }
}
