package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted ANN indexes — the scale path the in-memory variants in
 * [[Similarity]] document: the expensive per-vector work (k-means cell
 * assignment / hyperplane signature) happens ONCE at build time and lands
 * in a parquet table PARTITIONED BY the cell/signature, so a query reads
 * only its probed partitions (static partition pruning — the scan lists
 * nProbe directories, not the corpus). Centroids live under `_centroids`
 * inside the index directory: underscore-prefixed paths are invisible to
 * the main table's file listing (the `_metadata` convention), so the
 * index is one self-contained directory.
 *
 * 100 TB shape: build is one pass + one partitioned write (shuffle by
 * cell); each query is a driver-side centroid ranking (nCells rows) plus
 * a scan of nProbe/nCells of the data. Queries never recompute
 * signatures and never touch unprobed partitions.
 */
object AnnIndex {

  import Similarity.{cosine, hyperplaneSig}

  // ------------------------------------------------------------------ IVF

  /**
   * Build an IVF index at `path`: k-means quantizer (seeded,
   * deterministic), vectors parquet-partitioned by their nearest-centroid
   * cell, centroids persisted alongside.
   */
  def buildIvf(embeddings: DataFrame, vecCol: String, idCol: String,
      path: String, nCells: Int = 16, seed: Long = 42L): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    val prepared = embeddings
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("__features", array_to_vector(col("vec").cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("cell")
      .fit(prepared)
    model.transform(prepared)
      .select(col("vec_id"), col("vec"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    import spark.implicits._
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
  }

  /**
   * IVF search: rank the persisted centroids against the query on the
   * driver (nCells rows), then exact cosine top-k over ONLY the nProbe
   * best cells — the isin literal list prunes at the partition level, so
   * the scan touches nProbe directories.
   */
  def searchIvf(spark: SparkSession, path: String, query: Seq[Float],
      k: Int, nProbe: Int = 4): DataFrame = {
    val q = query.map(_.toDouble).toArray
    val nq = math.sqrt(q.map(x => x * x).sum)
    val probeCells = spark.read.parquet(s"$path/_centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .map { case (i, c) =>
        val d = c.zip(q).map { case (a, b) => a * b }.sum
        val nc = math.sqrt(c.map(x => x * x).sum)
        (i, if (nc > 0 && nq > 0) d / (nc * nq) else 0.0)
      }
      .sortBy(-_._2).take(nProbe).map(_._1).toSeq
    val qCol = array(query.map(v => lit(v)): _*)
    // unrounded cosine — bit-identical ordering to the in-memory ivfTopK
    // twin (lshTopK/searchLsh round because their ORACLE does; rounding
    // only one IVF twin would let a 6dp near-tie at the k boundary
    // return different top-k sets)
    spark.read.parquet(path)
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), cosine(col("vec"), qCol).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  // ------------------------------------------------------------------ LSH

  /** Build a hyperplane-LSH index at `path`: signature computed once per
    * vector, table partitioned by it. */
  def buildLsh(embeddings: DataFrame, vecCol: String, idCol: String,
      path: String, dims: Int, bits: Int = 12): Unit =
    embeddings
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("sig", hyperplaneSig(col("vec"), dims, bits))
      .write.mode("overwrite").partitionBy("sig").parquet(path)

  /** All signatures within hamming distance `h` of `sig` — the multiprobe
    * expansion, enumerated on the driver (sum of C(bits, <=h) values). */
  private[graft] def probeSigs(sig: Long, bits: Int, h: Int): Seq[Long] = {
    def flips(start: Int, left: Int, cur: Long): Seq[Long] =
      if (left == 0) Seq(cur)
      else (start until bits).flatMap(i => flips(i + 1, left - 1, cur ^ (1L << i)))
    (0 to h).flatMap(d => flips(0, d, sig)).distinct
  }

  /**
   * LSH search: the query's signature neighborhood (hamming <=
   * probeHamming) is a literal partition list — scan prunes to those
   * directories, then exact cosine top-k inside.
   */
  def searchLsh(spark: SparkSession, path: String, query: Seq[Float],
      k: Int, bits: Int = 12, probeHamming: Int = 2): DataFrame = {
    val qCol = array(query.map(v => lit(v)): _*)
    // query signature via a 1-row plan — same expression tree as the build
    val qSig = spark.range(1)
      .select(hyperplaneSig(qCol, query.length, bits).as("s"))
      .head().getLong(0)
    val probes = probeSigs(qSig, bits, probeHamming)
    spark.read.parquet(path)
      .filter(col("sig").isin(probes: _*))
      .select(col("vec_id"), round(cosine(col("vec"), qCol), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }
}
