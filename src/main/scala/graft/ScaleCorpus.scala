package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Derived scale-up corpus generator for the scaling-slope measurement:
 * multiplies the `documents` and `embeddings` tables of a base testdata
 * dir by an integer factor into a NEW dir with the same layout, so the
 * exact same Bench harness (same JVM recipe, same registry queries) can
 * time the same rows at 1x vs Nx and the README can record measured
 * sf0.1→sf1.0 ratios instead of a design-read scaling claim.
 *
 * The construction preserves the workload's GEOMETRY at Nx instead of
 * manufacturing a pathological one (that adversarial case is
 * [[ScaleSmoke]]'s job — exact replicas make every doc an N-clique and
 * pair mass grows ~N² per base pair):
 *
 *  - documents: copy c > 0 token-renames the text (every token gets a
 *    copy-tagged suffix) — a BIJECTIVE rename of the shingle space, so
 *    each copy's internal near-dup structure is exactly the base
 *    corpus's, while cross-copy Jaccard is 0 (no shared tokens). True
 *    near-dup pair mass therefore scales LINEARLY (N x base), the
 *    realistic shape for a corpus N times the size.
 *  - embeddings: copy c > 0 applies a per-copy deterministic diagonal
 *    ±1 sign flip — an orthogonal transform, so every within-copy
 *    cosine is bit-preserved while cross-copy vectors decorrelate
 *    (expected cosine ~0 under independent sign patterns). Same linear
 *    pair-mass scaling on the embedding side.
 *
 * Ids shift by c·10^7 per copy (the ScaleSmoke convention — base ids
 * stay identical to the source dir). All other tables are copied
 * verbatim (the heavy rows under measurement read only documents /
 * embeddings; the copies keep every registry query runnable against the
 * derived dir).
 *
 * Usage: runMain graft.ScaleCorpus <baseSfDir> <outDir> <mult>
 */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ScaleCorpus <baseSfDir> <outDir> <mult>")
    val base = args(0)
    val out = args(1)
    val mult = args(2).toInt
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, base, "documents")
    val bigDocs = (0 until mult).map { c =>
      val txt =
        if (c == 0) col("text")
        else concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("·" + c.toString))))
      docs.select(
        (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        txt.as("text"), col("lang"), col("source"),
        length(txt).cast("long").as("n_chars"))
    }.reduce(_.unionByName(_))
    bigDocs.repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.load(spark, base, "embeddings")
    val bigEmb = (0 until mult).map { c =>
      val vec =
        if (c == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          x * when(pmod(hash(j + lit(c * 37)), lit(2)) === 0, lit(1.0f))
            .otherwise(lit(-1.0f)))
      emb.select(
        (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.reduce(_.unionByName(_))
    bigEmb.repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // verbatim copies via Tables.load — the events loader normalizes the
    // generator's physical timestamp encoding, so the copy re-reads clean
    Tables.names.filterNot(n => n == "documents" || n == "embeddings")
      .foreach { name =>
        Tables.load(spark, base, name)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
      }

    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"[scale-corpus] $out: documents=$nd embeddings=$ne (mult=$mult from $base)")
    spark.stop()
  }
}
