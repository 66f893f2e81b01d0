package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BM25 lexical relevance scoring — the retrieval-side complement to the
 * embedding ANN family: score every document against a bag of query
 * terms with Okapi BM25 (k1/b defaults from the literature, the
 * Lucene-style non-negative idf ln(1 + (N - df + 0.5)/(df + 0.5))).
 *
 * Scale shape (100 TB lens): the term-frequency aggregation filters to
 * the query terms BEFORE grouping, so the corpus-wide explode feeds a
 * shuffle bounded by |query terms| x |matching docs|, not the token
 * count; document length and corpus stats (N, avgdl) reduce to one
 * scan with a two-value aggregate; per-term df and idf live in a
 * query-terms-sized table that BROADCASTS into the scoring join. The
 * final top-k is TakeOrderedAndProject (limit pushdown), never a full
 * sort. Scores are rounded to 6 decimals BEFORE ranking so last-ulp
 * libm differences can't reorder the cut line between engines.
 */
object Bm25 {

  /**
   * Per-document BM25 scores for `terms` (docs containing none of the
   * terms are omitted — their score is 0 by definition).
   *
   * @return (idCol, score) with score rounded to 6 decimals.
   */
  def score(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
    val lens = toks.select(col(idCol), size(col("__toks")).as("__dl"))
    // N and avgdl: integers summed exactly, one driver-side row.
    val stats = lens.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val tf = toks
      .select(col(idCol), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val df = tf
      .groupBy(col("__term"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .crossJoin(broadcast(stats))
      .select(col("__term"),
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))).as("__idf"))
    tf
      .join(broadcast(df), Seq("__term"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (col("__idf") * col("__tf") * (lit(k1) + 1.0) /
          (col("__tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__s"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 6).as("score"))
  }

  /** Top-k by (score desc, id asc) — the id tiebreak plus pre-rounding
    * makes the cut deterministic across engines. */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int): DataFrame =
    score(docs, textCol, idCol, terms)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}
