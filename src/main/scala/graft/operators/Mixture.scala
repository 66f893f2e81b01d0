package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic data-mixture sampling — the training-data assembly step
 * that downsamples each source to hit a target token budget at given
 * mixture weights (the Pile/Dolma "source weights" shape). Each source
 * gets keep fraction min(1, budget·w_s / tokens_s); membership is
 * decided by a multiplicative hash of the document id, so the sample is
 * reproducible run-to-run, independent of partitioning, and replayable
 * by any engine with 64-bit integer arithmetic (no RNG state).
 *
 * Scale shape (100 TB lens): one aggregation shuffle keyed by source
 * computes per-source token totals; the (source, fraction) table is
 * source-count-sized and BROADCASTS back; the sample itself is a
 * map-side filter — no second corpus shuffle, no driver-side rows
 * beyond the source-level table.
 */
object Mixture {

  /** Deterministic hash of an id to [0, 1): (id * 2654435761) mod 10^6
    * scaled — Knuth's multiplicative constant, integer-exact in any
    * engine. Not cryptographic; collision-free enough for sampling. */
  def idHashUnit(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(1000000L))
      .cast("double") / lit(1000000.0)

  /**
   * Sample `docs` so each source contributes ~budgetTokens·w_s tokens.
   *
   * @param weights (sourceCol, "weight") rows; weights are normalized
   *                internally so callers pass any positive ratios.
   * @return the kept subset of `docs` (original columns).
   */
  def sampleByTokenBudget(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, weights: DataFrame, budgetTokens: Long): DataFrame = {
    val totals = docs
      .select(col(sourceCol), tokenCount.as("__n"))
      .groupBy(sourceCol).agg(sum("__n").as("__tot"))
    val norm = weights
      .crossJoin(broadcast(weights.agg(sum("weight").as("__wsum"))))
      .select(col(sourceCol), (col("weight") / col("__wsum")).as("__w"))
    val fractions = totals
      .join(norm, Seq(sourceCol))
      .select(col(sourceCol),
        least(lit(1.0), lit(budgetTokens) * col("__w") / col("__tot"))
          .as("__keep_frac"))
    docs
      .join(broadcast(fractions), Seq(sourceCol))
      .filter(idHashUnit(col(idCol)) < col("__keep_frac"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }
}
