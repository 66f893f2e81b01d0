package graft.operators

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.BinaryType

/**
 * Incremental exact dedup with a Bloom pre-filter — the daily-ingest
 * shape at corpus scale: "which of today's documents are NEW?" without
 * shuffling the whole batch against the corpus fingerprint table. The
 * filter is Spark's OWN runtime-filter machinery (`BloomFilterAggregate`
 * / `BloomFilterMightContain`, the codegen'd expressions behind
 * InjectRuntimeFilter) driven explicitly — no UDF, no per-row JVM
 * boundary.
 *
 * Correctness: a Bloom filter has NO false negatives, so every true
 * duplicate reaches the verification join; false positives are
 * eliminated there. The result is therefore EXACTLY the anti-join — the
 * bloom only shrinks the join's build input.
 *
 * Scale shape (100 TB lens): the bloom build is one corpus aggregation
 * to a single binary value (sized by numBits, e.g. 2^27 bits ≈ 16 MB for
 * ~10^7 items at ~1% fpp — size it to the CORPUS fingerprint count); the
 * batch-side might-contain is a map-side filter against the broadcast
 * literal; only might-contain survivors (true dups + fpp of the batch)
 * pay the verification shuffle. Rebuild the bloom from the fingerprint
 * table on corpus growth, or keep per-partition blooms when one filter
 * would exceed driver memory.
 */
object BloomDedup {

  /** Serialized bloom over xxhash64(valueCol); null when `df` is empty. */
  def buildBloom(df: DataFrame, valueCol: Column,
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(xxhash64(valueCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(GraftSqlShim.column(agg).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd might-contain probe of a serialized bloom. */
  def mightContain(bloomBytes: Array[Byte], valueCol: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      GraftSqlShim.expression(xxhash64(valueCol))))

  /**
   * Batch documents whose content fingerprint does NOT appear in the
   * corpus fingerprint table — exactly the anti-join, bloom-accelerated.
   *
   * The verification anti-join is keyed on the FINGERPRINT, never on a
   * batch id: duplicate or null batch ids cannot drop a genuinely-new
   * row, and null fingerprints (null text) survive like the oracle's
   * `NOT EXISTS` with equality. Rows the bloom clears skip the join
   * entirely (no false negatives); only might-contain survivors — true
   * dups plus the fpp sliver of the batch — pay the shuffle.
   *
   * The fingerprinted batch is localCheckpoint'ed before it fans out to
   * the cleared/suspect branches: the md5 + canonicalization projection
   * and the bloom probe run ONCE per row; both branches then filter the
   * materialized blocks instead of re-scanning the source (without the
   * checkpoint, a union of two filters over the same projection
   * recomputes it per branch). The blocks are GC-tracked and freed with
   * the frame.
   *
   * @param corpusFps one row per known fingerprint (fpCol, hex md5 of
   *                  canonical text — [[graft.functions.TextFunctions.fingerprint]])
   */
  def newDocs(batch: DataFrame, corpusFps: DataFrame,
      textCol: String, fpCol: String = "fp",
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23): DataFrame = {
    val bloom = buildBloom(corpusFps, col(fpCol), expectedItems, numBits)
    if (bloom == null) return batch // empty corpus: all new
    val withFp = batch
      .withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__mc", mightContain(bloom, col("__fp")))
      .localCheckpoint()
    val knownFps = corpusFps.select(col(fpCol).as("__fp"))
    withFp.filter(!col("__mc"))
      .unionByName(withFp.filter(col("__mc"))
        .join(knownFps, Seq("__fp"), "left_anti"))
      .drop("__fp", "__mc")
  }
}
