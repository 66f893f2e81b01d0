package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection by importance resampling (Xie et al. 2023,
 * arXiv:2302.03169): score every raw document under a TARGET-domain
 * n-gram LM and under the RAW-corpus LM, take the log importance ratio
 * log w(x) = log p_target(x) - log p_raw(x), and Gumbel-top-k resample
 * — documents that look more like the target domain than like the raw
 * corpus are preferentially selected. Both models are the add-k bigram
 * LM of [[NgramLm]]; the Gumbel noise derives from the deterministic
 * multiplicative id hash, so the selected subset is reproducible
 * run-to-run, partitioning-independent, and replayable by any engine
 * (the `text_dsir_sample` oracle replays models, ratios, noise and the
 * cut value-for-value).
 *
 * Scale shape (100 TB lens): two model trainings (hash aggregations to
 * vocabulary-bounded tables), two scoring passes over the raw corpus
 * (gram-explode + model joins — AQE broadcasts the model tables when
 * small — and one per-doc regroup each), then a k-bounded
 * TakeOrderedAndProject for the selection: no corpus-sized sort, no
 * driver-side rows beyond k. Documents with fewer than two tokens have
 * no bigram likelihood and are excluded by construction (as in
 * [[NgramLm.scoreNll]]).
 */
object Dsir {

  /** Deterministic standard-Gumbel noise from the multiplicative id
    * hash: u = (hash(id) + 0.5) / 10^6 lies strictly inside (0, 1) — the
    * +0.5 keeps ln() off 0 and 1, where Spark returns null and DuckDB
    * raises — then g = -ln(-ln(u)). */
  def gumbelNoise(id: Column): Column = {
    val u = (pmod(pmod(id, lit(1000000L)) * lit(2654435761L), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    -log(-log(u))
  }

  /**
   * Per-document log importance weight:
   * log w = n_bigrams * (avg_nll_raw - avg_nll_target), i.e. the total
   * log-likelihood ratio (avg_nll values are the 6dp-rounded outputs of
   * [[NgramLm.scoreNll]], so the product is integer x rounded-double —
   * exact and engine-independent).
   *
   * @return (idCol, n_bigrams, nll_raw, nll_target, log_weight)
   */
  def logImportance(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, addK: Double = 1.0): DataFrame = {
    val rawScores = NgramLm.scoreNll(raw, textCol, idCol,
      NgramLm.train(raw, textCol), addK)
      .withColumnRenamed("avg_nll", "nll_raw")
    val tgtScores = NgramLm.scoreNll(raw, textCol, idCol,
      NgramLm.train(target, textCol), addK)
      .select(col(idCol), col("avg_nll").as("nll_target"))
    rawScores.join(tgtScores, Seq(idCol))
      .select(col(idCol), col("n_bigrams"), col("nll_raw"), col("nll_target"),
        round(col("n_bigrams") * (col("nll_raw") - col("nll_target")), 6)
          .as("log_weight"))
  }

  /**
   * Gumbel-top-k resampling: select the k documents maximizing
   * log w(x) + Gumbel(id) — equivalent to sampling k docs without
   * replacement with probability proportional to w, with the noise
   * fixed by the id hash. The sampling KEY is rounded to 6dp (the
   * Gumbel passes through ln, whose last ulp differs across engines)
   * and ties break on id, so the cut is identical everywhere.
   *
   * @return the k selected rows of [[logImportance]] plus `sample_key`
   */
  def resampleTopK(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, k: Int, addK: Double = 1.0): DataFrame =
    logImportance(raw, target, textCol, idCol, addK)
      .withColumn("sample_key",
        round(col("log_weight") + gumbelNoise(col(idCol)), 6))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
}
