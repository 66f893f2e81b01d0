package graft

import graft.operators.{AnnIndex, Similarity}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * One-shot A/B for the round-14 bounded-sample quantizer training
 * (judge ask #5): `buildIvfPq(kmeans)` previously ran the coarse fit +
 * m sub-fits as iterative WHOLE-CORPUS scans; they now train on a
 * deterministic 256k hash-sample ([[AnnIndex.KmeansFitSampleCap]]) while
 * the encode pass still covers the full corpus. This probe measures, in
 * ONE JVM on a 600k clustered corpus (24k hash-gaussian clusters × 25
 * points, σ = 0.05 — the recall table's geometry at scale):
 *
 *  - build wall, sampled fit vs full-corpus fit (cap = Long.MaxValue);
 *  - batched recall@10 vs brute force (40 one-per-cluster queries via
 *    [[AnnIndex.ivfPqKnnJoin]]) under EACH index — the sampled fit must
 *    land within 0.02 of the full fit (the "codebooks converge on a
 *    sample" claim, measured).
 *
 * Within-session A/B, same README measurement-caveat convention as
 * EmbPlanProbe. Usage: runMain graft.KmFitProbe [n]
 */
object KmFitProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 600000L
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
    val queries = corpus.filter(col("vec_id") % perCluster === 0 &&
        col("vec_id") < 40L * perCluster)
      .localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__cos").desc, col("vec_id").asc)
    val brute = corpus.crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("__qv"))))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("__qv")).as("__cos"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 10)
      .select("query_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def arm(tag: String, cap: Long): (Double, Double) = {
      val idx = Tables.freshScratch(s"kmfit_$tag") + "/idx"
      val (_, tBuild) = timed(AnnIndex.buildIvfPq(
        corpus, "embedding", "vec_id", idx, nCells = 16, m = 8,
        quantizer = "kmeans", fitSampleCap = cap))
      val got = AnnIndex.ivfPqKnnJoin(spark, idx, queries, corpus,
          "embedding", "vec_id", k = 10, overFetch = 4)
        .select("query_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = brute.map { case (q, b) =>
        got.getOrElse(q, Set.empty[Long]).intersect(b).size / 10.0
      }.sum / brute.size
      println(f"[kmfit] $tag build=${tBuild}%.1fs recall@10=$recall%.3f")
      (tBuild, recall)
    }
    val (tSampled, rSampled) = arm("sampled", AnnIndex.KmeansFitSampleCap)
    val (tFull, rFull) = arm("full", Long.MaxValue)
    val pass = rSampled >= rFull - 0.02 && tSampled < tFull
    println(f"[kmfit] n=$n sampled=${tSampled}%.1fs/$rSampled%.3f " +
      f"full=${tFull}%.1fs/$rFull%.3f speedup=${tFull / tSampled}%.2fx " +
      (if (pass) "ok" else "BAD"))
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
