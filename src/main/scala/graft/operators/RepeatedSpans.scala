package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Repeated-substring span detection — the token-window approximation of
 * exact-substring training-data dedup (Lee et al. 2021, "Deduplicating
 * Training Data Makes Language Models Better"): any `windowTokens`-token
 * window whose content occurs in at least `minDf` distinct documents
 * marks a repeated region; overlapping/adjacent repeated windows merge
 * into maximal spans per document. Where [[LineDedup]] only sees
 * chunk-ALIGNED repeats, this catches copies at any offset — the
 * shifted-quote / republished-article case.
 *
 * Scale shape (100 TB lens): windows are hashed to md5 before the
 * document-frequency count, so the corpus-wide shuffle carries
 * (16-byte hash, doc id, int pos) rows — never window text. The span
 * merge is a per-document gaps-and-islands pass: one shuffle keyed by
 * document id, lag + running-count windows INSIDE each document
 * partition (never a global window), then a min/max per island. Cost is
 * linear in corpus tokens; a pathologically duplicated corpus grows the
 * repeated-window row count, which stays distributed by document.
 */
object RepeatedSpans {

  /** All `w`-token sliding-window strings of an ALREADY-MATERIALIZED
    * token array (same HOF rule as wordNgramsFromTokens); empty when the
    * document is shorter than the window. */
  def windowStrings(ts: Column, w: Int): Column =
    when(size(ts) >= w,
      transform(sequence(lit(0), size(ts) - w),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(w)))))
      .otherwise(array().cast("array<string>"))

  /**
   * Maximal repeated spans per document.
   *
   * @return (idCol, span_start, span_end, n_windows) — token offsets,
   *         end exclusive: the span covers tokens [span_start, span_end).
   *         n_windows = repeated windows merged into the span.
   */
  def repeatedSpans(docs: DataFrame, textCol: String, idCol: String,
      windowTokens: Int = 20, minDf: Int = 2): DataFrame = {
    val wins = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(windowStrings(col("__toks"), windowTokens))
          .as(Seq("__pos", "__win")))
      .select(col(idCol), col("__pos"),
        md5(col("__win").cast("binary")).as("__h"))
    val repeated = wins
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__h"))
    // Windows [i, i+w) and [j, j+w), i < j, form one contiguous repeated
    // region iff j <= i + w; a larger step leaves an uncovered gap.
    val byDoc = Window.partitionBy(idCol).orderBy(col("__pos"))
    wins
      .join(repeated, Seq("__h"))
      .withColumn("__prev", lag(col("__pos"), 1).over(byDoc))
      .withColumn("__new_island",
        when(col("__prev").isNull ||
          col("__pos") - col("__prev") > windowTokens, 1).otherwise(0))
      .withColumn("__island", sum(col("__new_island")).over(
        Window.partitionBy(idCol).orderBy(col("__pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg(
        min(col("__pos")).as("span_start"),
        (max(col("__pos")) + windowTokens).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__island")
  }
}
