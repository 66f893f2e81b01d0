package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Duplication stress smoke: replicate the documents table `copies` times
 * with distinct ids (each doc then belongs to a `copies`-sized exact-dup
 * cluster — the adversarial case for near-dup pair generation) and run
 * MinHash dedup. Validates the pair path stays subquadratic-in-corpus
 * (pairs concentrate inside real clusters) and reports wall time.
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
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashNearDupPairs(big, "text", "doc_id",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5).count()
    val dt = (System.nanoTime() - t0) / 1e9
    // every original doc forms a `copies`-clique: expect >= n_docs * C(copies,2)
    val minExpected = (n / copies) * (copies.toLong * (copies - 1) / 2)
    println(f"[scale-smoke] docs=$n pairs=$pairs (>=$minExpected expected) ${dt}%.1fs")
    spark.stop()
  }
}
