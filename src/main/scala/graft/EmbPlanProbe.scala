package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Within-session A/B for embeddingNearDupPairs' occupancy-targeted
 * banding plan (Similarity.planEmbeddingBands): loads an embeddings
 * table, plants a deterministic noisy near-dup for every 97th vector
 * (additive ±0.04·|v| per dim from the id/dim hash — scale-free; noise
 * norm = 0.32·|v|, so cos ≈ 0.95, above the 0.9 threshold, and unlike a
 * multiplicative perturbation it CAN flip coordinate signs, so it
 * stresses the sign-of-dims reference banding too), then times the
 * reference arm (4 bands × 16 sign bits) and the auto arm on the SAME
 * corpus in the SAME JVM, reporting candidate mass, verified pair
 * count, and planted-pair recall per arm.
 * Usage: runMain graft.EmbPlanProbe <sfDir> [targetOccupancy]
 */
object EmbPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val occ = if (args.length > 1) args(1).toDouble else 8.0
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[embplan] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 97 === 0)
      .withColumn("__nrm", Similarity.norm(col("embedding")).cast("float"))
      .select((col("vec_id") + lit(5000000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x + lit(0.04f) * col("__nrm") *
            (pmod(hash(col("vec_id") * 64 + j), lit(2))
              .cast("float") * 2f - 1f)).as("embedding"))
    // materialize the corpus so generation cost stays out of both arms
    val corpus = emb.unionByName(planted).localCheckpoint(true)
    val n = corpus.count()
    val nPlanted = planted.count()
    val (bands, bits) = Similarity.planEmbeddingBands(n, 0.9, targetOccupancy = occ)
    println(s"[embplan] corpus=$n planted=$nPlanted occ=$occ plan=($bands bands, $bits bits)")

    val cells = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
    Seq(("ref", false), ("auto", true)).foreach { case (tag, auto) =>
      timed(s"candidates-$tag")(println("[embplan]   cand=" +
        Similarity.embeddingCandidates(cells, 0.9, 4, 16, auto, occ).count()))
      timed(s"e2e-$tag") {
        val row = Similarity.embeddingNearDupPairs(corpus, "embedding",
            "vec_id", minCosine = 0.9, bands = 4, bitsPerBand = 16,
            autoPlan = auto, targetOccupancy = occ)
          .agg(count(lit(1)),
            coalesce(sum(when(col("id_b") === col("id_a") + 5000000L &&
              pmod(col("id_a"), lit(97)) === 0, 1L).otherwise(0L)), lit(0L)))
          .head()
        val found = row.getLong(1)
        println(s"[embplan]   pairs=${row.getLong(0)} plantedFound=$found" +
          f"/$nPlanted (recall=${found.toDouble / nPlanted}%.3f)")
      }
    }
    // the same A/B through semDedup (cluster-folded banding): planted
    // noisy dups land in the same sign-cluster as their original often
    // enough to measure recall shift; report drop counts + wall
    Seq(("ref", false), ("auto", true)).foreach { case (tag, auto) =>
      timed(s"semdedup-$tag") {
        val acts = Similarity.semDedup(corpus, "embedding", "vec_id",
            minCosine = 0.9, signBits = 6,
            autoPlan = auto, targetOccupancy = occ)
          .groupBy("action").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        println(s"[embplan]   keep=${acts.getOrElse("keep", 0L)} " +
          s"drop=${acts.getOrElse("drop", 0L)}")
      }
    }
    spark.stop()
  }
}
