package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-wide repeated-span removal — the C4/RefinedWeb curation step
 * that strips boilerplate repeated across documents (nav bars, cookie
 * banners, license footers) while keeping each document's unique
 * content. Documents are cut into non-overlapping fixed-token chunks
 * ("lines" for corpora without newline structure); a chunk that occurs
 * in more than `maxDf` distinct documents is dropped from every
 * document, and the survivors are reassembled in original order.
 *
 * Scale shape (100 TB lens): two shuffles total — one keyed by the
 * chunk's md5 (the document-frequency count groups 16-byte hashes, not
 * chunk text), one keyed by document id for reassembly. The join back
 * to chunks is on the same md5 key, so the DF table side of the
 * shuffle carries (hash, count) only; chunk text rides the chunk side
 * exactly once. No driver-side state, no all-pairs anything — cost is
 * linear in corpus tokens regardless of how duplicated the corpus is.
 */
object LineDedup {

  /** Non-overlapping `chunk`-token windows of an ALREADY-MATERIALIZED
    * token array, each rendered back to a space-joined string (same
    * HOF-inlining rule as [[graft.functions.TextFunctions.wordNgramsFromTokens]]:
    * pass an attribute, not an inline `tokens(...)`). An empty token
    * array yields an empty chunk array. */
  def tokenChunksFromTokens(ts: Column, chunk: Int): Column =
    when(size(ts) > 0,
      transform(
        sequence(lit(0), ceil(size(ts) / lit(chunk.toDouble)).cast("int") - 1),
        i => concat_ws(" ", slice(ts, i * chunk + lit(1), lit(chunk)))))
      .otherwise(array().cast("array<string>"))

  /**
   * Remove chunks whose document frequency exceeds `maxDf` and rebuild
   * each document from the kept chunks (space-joined, original order).
   *
   * @return one row per input document: (idCol, clean = reassembled
   *         text, n_dropped = chunks removed, n_chunks = chunks total).
   *         A document whose every chunk was dropped keeps its row with
   *         clean = "" — an audit reads absence as a bug, not a signal.
   */
  def removeRepeatedChunks(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int = 10, maxDf: Int = 1): DataFrame = {
    val chunked = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode_outer(tokenChunksFromTokens(col("__toks"), chunkTokens))
          .as(Seq("__pos", "__line")))
    // Document frequency per distinct chunk, keyed by md5 so the shuffle
    // carries fixed-width hashes (chunk text can be arbitrarily long).
    val dfCounts = chunked
      .filter(col("__line").isNotNull)
      .groupBy(md5(col("__line").cast("binary")).as("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
    chunked
      .withColumn("__h", md5(col("__line").cast("binary")))
      .join(dfCounts, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__df") <= maxDf,
              struct(col("__pos"), col("__line"))))),
            s => s.getField("__line")),
          " ").as("clean"),
        count(when(col("__df") > maxDf, lit(1))).as("n_dropped"),
        count(col("__pos")).as("n_chunks"))
  }
}
