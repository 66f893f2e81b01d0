package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental corpus statistics via mergeable HLL sketches (Spark's
 * DataSketches bindings): per-source distinct-token cardinality where
 * each ingest batch contributes a SKETCH, and corpus-wide numbers come
 * from unioning stored sketches — never from rescanning the corpus.
 * HLL union is a register-wise max, so the estimate is independent of
 * batch order and batch boundaries: sketch(A ∪ B) == union(sketch(A),
 * sketch(B)) exactly, which is what makes the incremental path safe.
 *
 * Scale shape (100 TB lens): one explode + hash-agg per batch (shuffle
 * carries (source, token) then (source, fixed-size sketch)); stored
 * state is one ~KB sketch per source per batch; the merge is
 * source-count-sized work, no corpus access at all.
 */
object CorpusStats {

  /** One HLL sketch of the distinct tokens per source for this batch:
    * (sourceCol, sketch binary). lgConfigK=12 ≈ 1.6% relative standard
    * error. */
  def tokenSketches(docs: DataFrame, textCol: String, sourceCol: String,
      lgConfigK: Int = 12): DataFrame =
    docs
      .select(col(sourceCol), tokens(col(textCol)).as("__toks"))
      .select(col(sourceCol), explode_outer(col("__toks")).as("__tok"))
      .groupBy(sourceCol)
      .agg(hll_sketch_agg(col("__tok"), lit(lgConfigK)).as("sketch"))

  /** Union stored per-batch sketches into one per source. */
  def mergeSketches(sketches: DataFrame, sourceCol: String): DataFrame =
    sketches.groupBy(sourceCol)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Cardinality estimates from merged sketches. */
  def estimates(merged: DataFrame, sourceCol: String): DataFrame =
    merged.select(col(sourceCol),
      hll_sketch_estimate(col("sketch")).as("n_distinct_est"))

  /**
   * Per-source token-distribution drift between two corpus snapshots —
   * the mix-monitoring signal a curation team watches between crawls:
   * a source whose unigram distribution moved (new boilerplate, a
   * scraper regression, topic shift) shows a high divergence. Computes
   * add-k-smoothed KL(A || B) and the symmetric Jensen-Shannon
   * divergence per source over the UNION vocabulary of both sides.
   *
   * Scale shape: two vocabulary-bounded token-count aggregations, one
   * full-outer join on (source, token) — vocab-sized, never corpus-sized
   * — and one per-source regroup; no broadcast of anything corpus-scale.
   * Values are 6dp-rounded after the ln-sums (order-dependent double
   * accumulation dies in the rounding, per the repo's determinism
   * convention), so the report replays in any engine.
   *
   * @return (sourceCol, n_tokens_a, n_tokens_b, kl_ab, js) — one row per
   *         source present on either side
   */
  def distributionDrift(corpusA: DataFrame, corpusB: DataFrame,
      textCol: String, sourceCol: String, addK: Double = 0.5): DataFrame = {
    def counts(df: DataFrame): DataFrame = df
      .select(col(sourceCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(sourceCol, "__tok").agg(count(lit(1)).as("__c"))
    val a = counts(corpusA).withColumnRenamed("__c", "__ca")
    val b = counts(corpusB).withColumnRenamed("__c", "__cb")
    // the union-vocab frame fans out to the totals aggregation AND the
    // probability projection — checkpoint it so the full-outer join (the
    // operator's heaviest stage) executes once, not once per consumer
    // (the Dsir/BloomDedup fan-out rule)
    val joined = a.join(b, Seq(sourceCol, "__tok"), "full_outer")
      .select(col(sourceCol),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .localCheckpoint()
    // per-source totals + union-vocab size: a tiny table (one row per
    // source) broadcast back onto the vocab-sized frame
    val totals = joined.groupBy(sourceCol)
      .agg(sum("__ca").as("n_tokens_a"), sum("__cb").as("n_tokens_b"),
        count(lit(1)).as("__v"))
    val k = lit(addK)
    val withP = joined.join(broadcast(totals), Seq(sourceCol))
      .withColumn("__pa",
        (col("__ca") + k) / (col("n_tokens_a") + k * col("__v")))
      .withColumn("__pb",
        (col("__cb") + k) / (col("n_tokens_b") + k * col("__v")))
      .withColumn("__pm", (col("__pa") + col("__pb")) / 2)
    withP.groupBy(sourceCol)
      .agg(first(col("n_tokens_a")).as("n_tokens_a"),
        first(col("n_tokens_b")).as("n_tokens_b"),
        round(sum(col("__pa") * log(col("__pa") / col("__pb"))), 6).as("kl_ab"),
        round((sum(col("__pa") * log(col("__pa") / col("__pm"))) +
          sum(col("__pb") * log(col("__pb") / col("__pm")))) / 2, 6).as("js"))
  }
}
