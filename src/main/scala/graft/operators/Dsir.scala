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

  /** Deterministic standard-Gumbel PSEUDO-noise from the multiplicative
    * id hash ([[Mixture.guardedIdHash]] — same hash, same null/cast
    * fail-fast): u = (hash(id) + 0.5) / (2^31 - 1) lies strictly inside
    * (0, 1) — the +0.5 keeps ln() off 0 and 1, where Spark returns null
    * and DuckDB raises — then g = -ln(-ln(u)). The hash period is
    * [[Mixture.HashMod]] = 2^31 - 1 in the id (overflow-safe modular
    * multiplication keeps ((id mod m)·C) under Long.MaxValue), so draws
    * stay distinct within any window of ~2.1e9 consecutive ids; a corpus
    * whose id range exceeds that (ids can reach ~3.5e9 at full 100 TB —
    * see the overflow note on the hash) shares draws between ids exactly
    * 2^31-1 apart, 2147x finer than the old 10^6 modulus. Still
    * deterministic pseudo-noise (the point: run-to-run and
    * engine-replayable selection), not iid randomness. */
  def gumbelNoise(id: Column): Column = {
    val u = (Mixture.guardedIdHash(id).cast("double") + lit(0.5)) /
      lit(Mixture.HashMod.toDouble)
    -log(-log(u))
  }

  /**
   * Per-document log importance weight:
   * log w = n_bigrams * (avg_nll_raw - avg_nll_target), i.e. the total
   * log-likelihood ratio (avg_nll values are 6dp-rounded per
   * [[NgramLm.scoreNll]]'s convention, so the product is integer x
   * rounded-double — exact and engine-independent).
   *
   * The corpus-wide work — tokenize, bigram explode, per-doc regroup —
   * runs ONCE: a single exploded-gram frame left-joins both models'
   * vocabulary-bounded tables and one groupBy computes both NLLs (two
   * separate scoreNll passes would double the dominant shuffles; the
   * DuckDB oracle shares its gram CTE across the two scoring arms the
   * same way). An EMPTY model corpus fails fast instead of silently
   * returning Infinity weights for every doc (the typo'd-source-filter
   * trap).
   *
   * @return (idCol, n_bigrams, nll_raw, nll_target, log_weight)
   */
  def logImportance(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, addK: Double = 1.0): DataFrame = {
    import graft.functions.TextFunctions.{tokens, wordNgramsFromTokens}
    val rawModel = NgramLm.train(raw, textCol)
    val tgtModel = NgramLm.train(target, textCol)
    require(rawModel.vocabSize > 0, "Dsir.logImportance: raw corpus has " +
      "an empty vocabulary (no docs, or all text empty/null)")
    require(tgtModel.vocabSize > 0, "Dsir.logImportance: target corpus " +
      "has an empty vocabulary (no docs, or all text empty/null) — " +
      "every importance weight would be Infinity")
    val docGrams = raw
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol),
        explode(wordNgramsFromTokens(col("__toks"), 2)).as("gram"))
      .withColumn("__w1", substring_index(col("gram"), " ", 1))
    def nll(c12: Column, c1: Column, vocab: Long): Column =
      -log((coalesce(c12, lit(0L)) + lit(addK)) /
        (coalesce(c1, lit(0L)) + lit(addK) * vocab))
    docGrams
      .join(rawModel.grams.withColumnRenamed("__c12", "__rc12"),
        Seq("gram"), "left")
      .join(rawModel.contexts.withColumnRenamed("__c1", "__rc1"),
        Seq("__w1"), "left")
      .join(tgtModel.grams.withColumnRenamed("__c12", "__tc12"),
        Seq("gram"), "left")
      .join(tgtModel.contexts.withColumnRenamed("__c1", "__tc1"),
        Seq("__w1"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(nll(col("__rc12"), col("__rc1"), rawModel.vocabSize)), 6)
          .as("nll_raw"),
        round(avg(nll(col("__tc12"), col("__tc1"), tgtModel.vocabSize)), 6)
          .as("nll_target"))
      .select(col(idCol), col("n_bigrams"), col("nll_raw"), col("nll_target"),
        round(col("n_bigrams") * (col("nll_raw") - col("nll_target")), 6)
          .as("log_weight"))
  }

  /**
   * Gumbel-top-k resampling: select the k documents maximizing
   * log w(x) + Gumbel(id) — with iid noise this samples k docs without
   * replacement with probability proportional to w; here the noise is
   * the deterministic hash-derived pseudo-noise of [[gumbelNoise]]
   * (see its periodicity caveat), trading exact sampling statistics for
   * reproducibility and engine replay. The sampling KEY is rounded to
   * 6dp (the Gumbel passes through ln, whose last ulp differs across
   * engines) and ties break on id, so the cut is identical everywhere.
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
