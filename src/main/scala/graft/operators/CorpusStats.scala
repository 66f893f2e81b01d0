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
}
