package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for 100 TB-scale corpora. All variants avoid the
 * O(n^2) cross product: exact dedup is a hash aggregation; near-dup variants
 * generate candidate pairs only within LSH buckets / fingerprint groups, so
 * the shuffle key is the bucket id and the pair expansion happens
 * per-bucket (AQE handles skewed buckets).
 */
object Dedup {

  /**
   * Exact dedup, deterministic keep-first: survivor per content fingerprint
   * is the row with the smallest tie-break key (SURVEY A10 — R's
   * order-dependent `distinct(.keep_all=TRUE)` made deterministic with
   * row_number, SURVEY §7.4#2).
   */
  def exactDedup(df: DataFrame, contentCol: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(md5(contentCol.cast("binary"))).orderBy(tieBreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Exact near-dup at the canonical-form level: same text modulo case,
   * punctuation and whitespace. Returns (fingerprint, n_docs, keep_id) per
   * duplicate group.
   */
  def fingerprintGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /**
   * MinHash+LSH near-duplicate candidate pairs: shingle -> minhash signature
   * -> band keys -> self-join per band bucket -> verified Jaccard over the
   * shingle sets. The self-join key is (band index, band key), so only
   * documents agreeing on a full band collide; the verify step prunes false
   * positives. Scale shape: one shuffle on the band key; bucket sizes are
   * ~collision counts, not corpus size.
   */
  def minhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 5, numHashes: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.8, cacheShingles: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    // Each stage materializes its intermediate as a column: the canonical
    // text, shingle set, and signature are attributes by the time a lambda
    // or repeated reference consumes them, so nothing re-evaluates per
    // array element (the inlined-expression-in-lambda trap).
    //
    // Explicit repartition to defaultParallelism first: the signature
    // computation is the CPU-heavy part and runs BEFORE any shuffle — a
    // small parquet input (single row group) would otherwise pin the whole
    // minhash pass on one core, and AQE's byte-based coalescing would
    // shrink an un-numbered repartition right back (CPU-heavy but
    // byte-light). At 100 TB the input arrives pre-partitioned and this
    // exchange is round-off; on small inputs it buys full parallelism.
    val shingled0 = docs
      .select(col(idCol).as("id"), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), canonicalText(col(textCol)).as("__canon"))
      .select(col("id"),
        array_distinct(charShinglesCanon(col("__canon"), shingleK)).as("shingles"))
    // The shingle table feeds THREE consumers (band keys + both sides of
    // the verify join). Recomputing the canon+shingle pipeline per
    // consumer measured FASTER here than caching it (columnar cache build
    // on millions of short strings costs more than the regex+slice
    // recompute) — so default off; cacheShingles=true is for corpora
    // where text normalization dominates (heavy regexes, long docs).
    val shingled =
      if (cacheShingles)
        shingled0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else shingled0
    val withSig = shingled
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("bandkeys", minhashBandKeys(col("sig"), bands, rows))
      .drop("sig")
    // posexplode_OUTER: the non-outer generate gets an inferred
    // `size(bandkeys) > 0` filter (InferFiltersFromGenerate) which predicate
    // pushdown re-expands through the aliases into the FULL signature
    // pipeline and pushes below the repartition — re-running the whole
    // minhash chain single-partition at the scan. bandkeys is never
    // null/empty, so outer is semantically identical and keeps the plan
    // clean of the inferred filter.
    //
    // Pair generation: bucket-collect IDs ONLY (tiny rows), expand id
    // pairs per bucket, dedup, then join the shingle sets back and verify
    // Jaccard with the work hash-distributed BY PAIR. Collecting shingles
    // into buckets and verifying in-bucket would serialize a hot bucket
    // into one task (a 747-doc bucket = 278k Jaccards on one core).
    val exploded = withSig
      .select(col("id"), posexplode_outer(col("bandkeys")).as(Seq("band", "key")))
    val idPairs = exploded
      .groupBy("band", "key")
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(
        transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))),
            y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    val sa = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    idPairs
      .join(sa, Seq("id_a"))
      .join(sb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /**
   * SimHash near-dup: 32-bit simhash over the token stream; candidate pairs
   * share one of four 8-bit sub-bands (guarantees recall for hamming<=3 on
   * at least one band by pigeonhole when distance concentrates); verify by
   * full hamming distance <= maxHamming.
   */
  def simhashNearDupPairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), col(textCol))
      // explicit partition count: AQE would coalesce a byte-light shuffle
      // to ~1 partition, serializing the CPU-heavy hash work
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), tokenHashes(tokens(col(textCol))).as("__hashes"))
      .select(col("id"), simhash32FromHashes(col("__hashes")).as("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(0xffL)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * N-gram Jaccard near-dup with cheap blocking: candidates share the same
   * (token count band, first token), then verified token-set Jaccard.
   */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.6): DataFrame = {
    val prepared = docs
      .select(col(idCol).as("id"), col(textCol))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), tokens(col(textCol)).as("__toks0"))
      .select(
        col("id"),
        array_distinct(col("__toks0")).as("toks"),
        element_at(col("__toks0"), 1).as("first_tok"),
        floor(size(col("__toks0")) / 10).cast("int").as("len_band"))
    val a = prepared.select(col("len_band"), col("first_tok"),
      col("id").as("id_a"), col("toks").as("t_a"))
    val b = prepared.select(col("len_band"), col("first_tok"),
      col("id").as("id_b"), col("toks").as("t_b"))
    a.join(b, Seq("len_band", "first_tok"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("t_a"), col("t_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
