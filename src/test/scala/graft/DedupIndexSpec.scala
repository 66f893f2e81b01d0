package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Lifecycle of the persisted minhash index (round 15, late): tombstone
  * takedown (a deleted doc must stop suppressing fresh content as its
  * duplicate), physical drop + batch-dir collapse at compaction, the
  * mixed-layout write guards, and the tombstoned-re-ingest WARN. */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val t1 =
    "the quick brown fox jumps over the lazy dog again and again today"
  private def corpus = Seq(
    (1L, t1),
    (2L, "completely different text about spark parquet lifecycle rewrites"),
    (3L, "yet another unrelated document carrying its own words entirely"))
    .toDF("doc_id", "text")
  private def batch = Seq(
    (10L, t1), // exact copy of doc 1 -> guaranteed pair at jaccard 1.0
    (11L, "nothing like the others at all in any way whatsoever truly"))
    .toDF("doc_id", "text")
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/idx"
  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pairsOf(idx: String): Set[(Long, Long)] =
    Dedup.incrementalNearDupPairs(batch, "text", "doc_id", idx,
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("takedown: a tombstoned doc stops matching immediately; compaction " +
      "makes the delete physical, clears the sidecar, answers unchanged") {
    val idx = tmp("mhdel")
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx,
      shingleK = 5, numHashes = 16, bands = 4)
    assert(pairsOf(idx).contains((1L, 10L)))
    val n = Dedup.deleteFromMinhashIndex(spark, idx,
      Seq(1L).toDF("doc_id"), idCol = "doc_id")
    assert(n === 1L)
    val afterDelete = pairsOf(idx)
    assert(!afterDelete.contains((1L, 10L)),
      "tombstoned doc still suppresses/matches fresh content")
    val (before, after) = Dedup.compactMinhashIndex(spark, idx)
    assert(after <= before)
    assert(!fsOf(idx).exists(
      new org.apache.hadoop.fs.Path(s"$idx/_tombstones")))
    assert(spark.read.parquet(idx).filter(col("id") === 1L).count() === 0L,
      "compaction did not drop the tombstoned rows physically")
    assert(pairsOf(idx) === afterDelete)
    // the flat band= partitioning survives the rewrite
    assert(fsOf(idx).listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).count(_.startsWith("band=")) === 4)
  }

  test("compaction collapses a streaming batch= tree into one batch=-1 " +
      "generation with live content preserved") {
    val idx = tmp("mhbatch")
    Dedup.ingestBatch(corpus.filter(col("doc_id") =!= 3L), "text",
      "doc_id", None, s"$idx/batch=0", shingleK = 5, numHashes = 16,
      bands = 4, minJaccard = 0.5)
    Dedup.ingestBatch(corpus.filter(col("doc_id") === 3L), "text",
      "doc_id", Some(idx), s"$idx/batch=1", shingleK = 5, numHashes = 16,
      bands = 4, minJaccard = 0.5)
    val content = (p: String) => spark.read.parquet(p)
      .select(col("id"), col("band").cast("int"),
        col("key").cast("string")).as[(Long, Int, String)].collect().toSet
    val beforeContent = content(idx)
    Dedup.compactMinhashIndex(spark, idx)
    val dirs = fsOf(idx).listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("batch="))
    assert(dirs.toSeq === Seq("batch=-1"),
      s"expected one compacted generation, got ${dirs.toSeq}")
    assert(content(idx) === beforeContent)
    assert(pairsOf(idx).contains((1L, 10L)))
  }

  test("mixed-layout writes are refused BEFORE anything lands: batch= " +
      "dirs into a flat tree, band= appends into a batch tree") {
    val flat = tmp("mhflat")
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", flat,
      shingleK = 5, numHashes = 16, bands = 4)
    val e1 = intercept[IllegalStateException](
      Dedup.ingestBatch(batch, "text", "doc_id", Some(flat),
        s"$flat/batch=0", shingleK = 5, numHashes = 16, bands = 4,
        minJaccard = 0.5))
    assert(e1.getMessage.contains("partition"))
    assert(!fsOf(flat).exists(
      new org.apache.hadoop.fs.Path(s"$flat/batch=0")))
    val batched = tmp("mhbatched")
    Dedup.ingestBatch(corpus, "text", "doc_id", None, s"$batched/batch=0",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
    val e2 = intercept[IllegalStateException](
      Dedup.appendToMinhashIndex(batch, "text", "doc_id", batched,
        shingleK = 5, numHashes = 16, bands = 4))
    assert(e2.getMessage.contains("partition"))
    // the batch tree is still readable (nothing was written at its root)
    assert(spark.read.parquet(batched).count() > 0)
  }

  test("compacting a fully-tombstoned index is refused — the swap would " +
      "leave an empty, unreadable tree") {
    val idx = tmp("mhempty")
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx,
      shingleK = 5, numHashes = 16, bands = 4)
    Dedup.deleteFromMinhashIndex(spark, idx,
      corpus.select("doc_id"), idCol = "doc_id")
    val e = intercept[IllegalStateException](
      Dedup.compactMinhashIndex(spark, idx))
    assert(e.getMessage.contains("tombstoned"))
    // the index is untouched and still answering (empty, via tombstones)
    assert(pairsOf(idx).forall { case (a, b) => a >= 10L && b >= 10L })
  }

  test("minhashIndexHealth: a fresh build is healthy; accumulated batch " +
      "generations flag fragmented; tombstones past the floor flag heavy; " +
      "compaction restores health") {
    val flat = tmp("mhh_flat")
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", flat,
      shingleK = 5, numHashes = 16, bands = 4)
    val h0 = Dedup.minhashIndexHealth(spark, flat)
    assert(h0.layout === "flat" && h0.bands === 4)
    assert(!h0.fragmented && !h0.tombstoneHeavy)
    assert(h0.prescription === "healthy")

    val idx = tmp("mhh_batch")
    (0 until 3).foreach(i => Dedup.ingestBatch(
      corpus.filter(col("doc_id") % 3 === i), "text", "doc_id",
      if (i == 0) None else Some(idx), s"$idx/batch=$i", shingleK = 5,
      numHashes = 16, bands = 4, minJaccard = 0.5))
    Dedup.deleteFromMinhashIndex(spark, idx, Seq(1L).toDF("doc_id"),
      idCol = "doc_id")
    val h1 = Dedup.minhashIndexHealth(spark, idx, tombstoneFloor = 1L)
    assert(h1.layout === "batch" && h1.batches === 3)
    assert(h1.fragmented, s"3 generations should flag at factor 2: $h1")
    assert(h1.tombstoneHeavy && h1.tombstones === 1L)
    assert(h1.prescription === "compactMinhashIndex")
    Dedup.compactMinhashIndex(spark, idx)
    val h2 = Dedup.minhashIndexHealth(spark, idx, tombstoneFloor = 1L)
    assert(h2.batches === 1 && !h2.fragmented && h2.tombstones === 0L)
    assert(h2.prescription === "healthy")
  }

  test("dedupIngest(maintainEvery): the stream compacts its own index " +
      "when health prescribes — and a mid-stream takedown goes physical " +
      "at that compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dmnt").toString
    val idx = s"$dir/idx"
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.dedupIngest(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
      idx, s"$dir/pairs", s"$dir/ckpt", minJaccard = 0.5,
      maintainEvery = 1)
    try {
      mem.addData(corpus.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable() // generation 1 — healthy, no compact
      Dedup.deleteFromMinhashIndex(spark, idx, Seq(1L).toDF("doc_id"),
        idCol = "doc_id")
      mem.addData((20L, "some fresh unrelated content streaming in now"))
      q.processAllAvailable() // generation 2 — still under the factor
      mem.addData((21L, "and one more batch to cross the generation bar"))
      q.processAllAvailable() // generation 3 -> in-stream compact
    } finally q.stop()
    val h = Dedup.minhashIndexHealth(spark, idx)
    assert(h.batches === 1, s"in-stream compaction did not run: $h")
    assert(h.tombstones === 0L)
    assert(spark.read.parquet(idx).filter(col("id") === 1L).count() === 0L,
      "the takedown did not go physical at the in-stream compaction")
    assert(!pairsOf(idx).contains((1L, 10L)))
  }

  test("maintainMinhashIndex: healthy untouched, prescribed compaction " +
      "executed and health restored — the one-call executor") {
    val idx = tmp("mhmaint")
    Dedup.buildMinhashIndex(corpus, "text", "doc_id", idx,
      shingleK = 5, numHashes = 16, bands = 4)
    assert(Dedup.maintainMinhashIndex(spark, idx) === Seq.empty)
    Dedup.deleteFromMinhashIndex(spark, idx, Seq(1L).toDF("doc_id"),
      idCol = "doc_id")
    assert(Dedup.maintainMinhashIndex(spark, idx, tombstoneFloor = 1L)
      === Seq("compactMinhashIndex"))
    assert(spark.read.parquet(idx).filter(col("id") === 1L).count() === 0L)
    assert(Dedup.minhashIndexHealth(spark, idx, tombstoneFloor = 1L)
      .prescription === "healthy")
  }

  test("delete refuses a directory that is not a minhash index layout") {
    val p = tmp("mhnotidx")
    corpus.write.parquet(p) // plain unpartitioned parquet
    val e = intercept[IllegalStateException](
      Dedup.deleteFromMinhashIndex(spark, p, Seq(1L).toDF("doc_id"),
        idCol = "doc_id"))
    assert(e.getMessage.contains("layout"))
  }

  test("re-ingesting a tombstoned id WARNs (written but invisible until " +
      "compaction) — the replace-a-doc footgun gets a signal") {
    val idx = tmp("mhrewarn")
    Dedup.ingestBatch(corpus, "text", "doc_id", None, s"$idx/batch=0",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
    Dedup.deleteFromMinhashIndex(spark, idx, Seq(1L).toDF("doc_id"),
      idCol = "doc_id")
    val err = new java.io.ByteArrayOutputStream()
    val old = System.err
    try {
      System.setErr(new java.io.PrintStream(err, true))
      Dedup.ingestBatch(corpus.filter(col("doc_id") === 1L), "text",
        "doc_id", Some(idx), s"$idx/batch=1", shingleK = 5,
        numHashes = 16, bands = 4, minJaccard = 0.5)
    } finally System.setErr(old)
    assert(err.toString.contains("TOMBSTONED"), err.toString)
    // and indeed: the re-ingested doc stays invisible to probes
    assert(!pairsOf(idx).contains((1L, 10L)))
  }
}
