package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * Fixed-vs-marginal cost split for the streaming ingest (round 12): the
 * bench row `stream_dedup_ingest` is dominated by micro-batch machinery
 * (checkpointed FileStreamSource at maxFilesPerTrigger=1), under which a
 * probe-cost regression in the GROWING incremental index is invisible.
 * This probe stages `nBatches` EQUAL-sized batches plus one trailing
 * 1-doc batch, runs the production [[graft.streaming.Streams.dedupIngest]]
 * with a StreamingQueryListener recording each batch's triggerExecution
 * wall, and separates:
 *
 *  - FIXED per-batch overhead: the trailing 1-doc batch's wall — all
 *    machinery + a full-index probe of a single doc;
 *  - MARGINAL per-doc cost: (full-batch wall − fixed) / batch rows,
 *    reported for the FIRST batch (empty index) and LAST full batch
 *    (index = nBatches−1 batches).
 *
 * Expected shape: batch k probes an index of k−1 batches, so per-batch
 * wall grows with a bounded slope (the LSH bucket join reads the index
 * once per batch — linear in index size with a small constant), and the
 * last/first full-batch ratio stays modest. The regression bound is
 * last/first <= 3x at 8 batches (an O(index) re-sign or an O(index^2)
 * bucket fan-out blows straight past it; the honest linear probe sits
 * well under). Prints ok / BAD lines (ScaleSmoke convention).
 *
 * Usage: runMain graft.StreamCostProbe [sfDir] [nBatches]
 */
object StreamCostProbe {

  /** The probe's bound and measurements — consumed by [[ProbeSuite]]'s
    * per-round record as well as this main. */
  final case class StreamCostResult(
      ratio: Double, bound: Double, fixedSec: Double,
      marginalFirstMs: Double, marginalLastMs: Double) {
    def pass: Boolean = ratio <= bound
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, dir, nBatches)
    spark.stop()
    if (!r.pass) sys.exit(1)
  }

  def run(spark: SparkSession, dir: String, nBatches: Int = 8): StreamCostResult = {
    require(nBatches >= 3, s"need >= 3 full batches, got $nBatches")
    val root = Tables.freshScratch("stream_cost")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    // nBatches equal slices by id-hash + one trailing single-doc batch;
    // each staged as ONE parquet file so maxFilesPerTrigger=1 delivers
    // them as ordered micro-batches
    val stage = s"$root/stage"
    (0 until nBatches).foreach(i =>
      docs.filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === i)
        .coalesce(1).write.mode("append").parquet(stage))
    docs.orderBy(col("doc_id")).limit(1)
      .coalesce(1).write.mode("append").parquet(stage)
    val batchRows = docs.count() / nBatches

    // Progress events arrive ASYNCHRONOUSLY on the listener-bus thread —
    // processAllAvailable() returns when the DATA is processed, not when
    // the bus has drained, so the map is (a) guarded by its own lock
    // against a mid-update read and (b) polled below until the expected
    // nBatches + 1 entries land (bounded), instead of asserting on
    // whatever had been delivered by the time the main thread looked.
    val walls = scala.collection.mutable.SortedMap[Long, (Double, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) walls.synchronized {
          walls(p.batchId) =
            (p.durationMs.get("triggerExecution").toDouble / 1000,
              p.numInputRows)
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val q = graft.streaming.Streams.dedupIngest(src, "text", "doc_id",
      s"$root/idx", s"$root/pairs", s"$root/ckpt", minJaccard = 0.5)
    try q.processAllAvailable() finally q.stop()
    val drainDeadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (walls.synchronized(walls.size) < nBatches + 1 &&
        System.nanoTime() < drainDeadline)
      Thread.sleep(100)
    spark.streams.removeListener(listener)

    val series = walls.synchronized(walls.toSeq)
    series.foreach { case (b, (t, n)) =>
      println(f"[stream-cost] batch $b%2d: $t%6.2fs  rows=$n%,d") }
    val full = series.filter(_._2._2 > 1)
    val tiny = series.filter(_._2._2 == 1).lastOption
    require(full.size >= 3 && tiny.nonEmpty,
      s"expected >= 3 full batches + 1 tiny batch, got ${series.size}")
    val first = full.head._2._1
    val last = full.last._2._1
    val fixed = tiny.get._2._1
    val mFirst = math.max(0, first - fixed) / batchRows * 1e3
    val mLast = math.max(0, last - fixed) / batchRows * 1e3
    println(f"[stream-cost] fixed per-batch overhead (1-doc, full index): $fixed%.2fs")
    println(f"[stream-cost] marginal per-doc: first batch $mFirst%.3f ms, " +
      f"last full batch $mLast%.3f ms")
    // Baseline = the MINIMUM full-batch wall, not batch 0: the first
    // batch carries the young JVM's JIT (measured 3x its steady state),
    // which would flatter the ratio. A superlinear probe regression
    // inflates LATE batches, so the min lands early and the bound bites.
    val base = full.map(_._2._1).min
    val ratio = last / math.max(base, 1e-9)
    val verdict = if (ratio <= 3.0) "ok " else "BAD"
    println(f"[stream-cost] $verdict last/min full-batch wall = $ratio%.2fx (bound 3.0x at $nBatches batches)")
    StreamCostResult(ratio, 3.0, fixed, mFirst, mLast)
  }
}
