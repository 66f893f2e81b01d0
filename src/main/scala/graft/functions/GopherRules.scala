package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The Gopher document-quality rule battery (Rae et al. 2021,
 * arXiv:2112.11446, Appendix A) — the published heuristic set most
 * large-corpus curation pipelines start from, composed here as pure
 * expression trees over one materialized token column:
 *
 *  - word count within [minWords, maxWords]
 *  - mean word length within [minMeanWordLen, maxMeanWordLen]
 *  - symbol-to-word ratio <= maxSymbolWordRatio for '#' AND for '...'
 *    SEPARATELY (the paper tests each symbol's ratio against 0.1 on its
 *    own, not a pooled count)
 *  - fraction of lines starting with a bullet <= maxBulletLineFrac
 *    (paper default 0.9: remove docs that are >90% bullet lines)
 *  - fraction of lines ending with an ellipsis <= maxEllipsisLineFrac
 *  - fraction of words containing an alphabetic char >= minAlphaWordFrac
 *  - at least minStopWords DISTINCT stop words present
 *
 * Scale shape: one projection pass, zero shuffles — the flags are
 * per-document expressions (`text_gopher_rules` exercises every rule in
 * both directions and replays in DuckDB).
 *
 * CONSUMER TRAP (same as Curation.withDisposition): don't `.filter`
 * directly on `gopher_keep` from the lazy output — predicate pushdown
 * inlines the whole battery into an interpreted, CSE-less Filter that
 * re-tokenizes per rule per row. Materialize first, then filter the
 * attribute.
 */
object GopherRules {

  case class Config(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9, maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8, minStopWords: Int = 2)

  /** The paper's stop-word probe set. */
  val stopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Append the per-rule boolean flag columns and the composed
   * `gopher_keep` (AND of all rules) to `docs`. Null text fails every
   * rule (flags false, keep false) — a null doc is not a keepable doc.
   */
  def withGopherFlags(docs: DataFrame, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val t = col(textCol)
    val scored = docs
      .withColumn("__toks", TextFunctions.tokens(t))
      .withColumn("__lines", split(coalesce(t, lit("")), "\n"))
    val nWords = size(col("__toks"))
    val meanLen = aggregate(col("__toks"), lit(0L),
      (a, x) => a + length(x)).cast("double") / nWords
    // '#' chars and '...' runs, counted by length deltas (split-free:
    // replace semantics are identical across engines); the paper tests
    // each symbol's word ratio separately, never a pooled count
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEllipsis =
      (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val nLines = size(col("__lines"))
    val bulletLines = size(filter(col("__lines"),
      l => l.rlike("^\\s*[-*•]")))
    val ellipsisLines = size(filter(col("__lines"),
      l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    val alphaWords = size(filter(col("__toks"), x => x.rlike("[a-z]")))
    val nStops = size(array_intersect(col("__toks"),
      array(stopWords.map(lit): _*)))
    def rule(c: Column): Column = coalesce(t.isNotNull && c, lit(false))
    val flagCols = Seq(
      "flag_word_count" ->
        rule(nWords >= cfg.minWords && nWords <= cfg.maxWords),
      "flag_mean_word_len" ->
        rule(meanLen >= cfg.minMeanWordLen && meanLen <= cfg.maxMeanWordLen),
      "flag_symbol_ratio" ->
        rule(nHash.cast("double") / nWords <= cfg.maxSymbolWordRatio &&
          nEllipsis.cast("double") / nWords <= cfg.maxSymbolWordRatio),
      "flag_bullet_lines" ->
        rule(bulletLines.cast("double") / nLines <= cfg.maxBulletLineFrac),
      "flag_ellipsis_lines" ->
        rule(ellipsisLines.cast("double") / nLines <= cfg.maxEllipsisLineFrac),
      "flag_alpha_words" ->
        rule(alphaWords.cast("double") / nWords >= cfg.minAlphaWordFrac),
      "flag_stop_words" -> rule(nStops >= cfg.minStopWords))
    flagCols.foldLeft(scored) { case (d, (n, c)) => d.withColumn(n, c) }
      .withColumn("gopher_keep",
        flagCols.map(f => col(f._1)).reduce(_ && _))
      .drop("__toks", "__lines")
  }
}
