package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix sums and token-budget sharding for training-data
 * assembly: a corpus is cut into contiguous shards of ~`budget` tokens
 * each (the unit a tokenizer/packer consumes downstream). The naive
 * expression — `sum(tok) over (order by id)` — is a SINGLE-TASK global
 * window; this implementation gets the same answer with a range
 * partitioning and a two-level prefix sum, so it holds at corpus scale.
 */
object Sharding {

  /**
   * Global running total of `valueCol` in `orderCol` order, computed
   * scalably:
   *
   *  1. `repartitionByRange(orderCol)` — contiguous, ascending ranges
   *     per partition (the sampled boundaries affect only the split
   *     points, never the result, because the sum is order-defined);
   *  2. per-partition running totals (window within each partition —
   *     parallel);
   *  3. per-partition GRAND totals offset-summed (one row per
   *     partition — driver-scale; the only non-parallel step is a
   *     window over ~hundreds of rows) and broadcast-joined back.
   *
   * `orderCol` must be unique and non-null (ties would make "running
   * total" ill-defined).
   */
  def runningTotal(df: DataFrame, valueCol: Column, orderCol: String,
      cumName: String = "cum"): DataFrame =
    runningTotalBy(df, valueCol, Seq(col(orderCol)), cumName)

  /** [[runningTotal]] over a COMPOSITE ordering (e.g. length-desc with an
    * id tiebreak for packing). The ordering must be total — make the
    * last column unique. */
  def runningTotalBy(df: DataFrame, valueCol: Column, orderCols: Seq[Column],
      cumName: String = "cum"): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val ranged = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(par, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    // MATERIALIZE the per-partition sums before fanning out to the two
    // consumers (offset table + final join): repartitionByRange SAMPLES
    // its boundaries, and a re-executed plan fragment may sample
    // DIFFERENT boundaries — offsets computed for one partitioning
    // joined against sums computed for another silently corrupts the
    // totals (observed at sf0.1: 468 shifted shard assignments). The
    // checkpoint pins one partitioning for both consumers; it is
    // GC-tracked and costs one pass over data the range shuffle already
    // moved.
    val inCum = ranged.withColumn("__incum", sum(col("__v")).over(wIn))
      .localCheckpoint(true)
    // one row per partition; the unpartitioned window here is bounded by
    // the partition COUNT, not the data
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = inCum.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__ptot"))
      .withColumn("__offset", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))
    inCum
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumName, col("__incum") + col("__offset"))
      .drop("__pid", "__incum", "__offset", "__v")
  }

  /**
   * Token-budget shard assignment: docs keep their `orderCol` order and
   * shard k covers the docs whose running token total STARTS in
   * [k*budget, (k+1)*budget). Budget is a soft cap — a shard can exceed
   * it by at most one document (a doc longer than the whole budget still
   * lands in exactly one shard); shards are contiguous and dense from 0.
   * Integral division (`div`) keeps the assignment exact for totals
   * beyond 2^53.
   */
  def tokenBudgetShards(docs: DataFrame, tokenCountCol: Column,
      orderCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    runningTotal(docs.withColumn("__tok", tokenCountCol.cast("long")),
        col("__tok"), orderCol, "__cum")
      .withColumn("shard", expr(s"(__cum - __tok) div $budget"))
      .withColumn("n_tokens", col("__tok"))
      .drop("__tok", "__cum")
  }

  /**
   * Length-sorted packing (sorted next-fit): same contiguous shard
   * assignment as [[tokenBudgetShards]], but over the (tokens desc,
   * id asc) order — placing long documents first concentrates the
   * hard-to-place mass early, so shard-boundary overshoot comes from
   * the SHORT tail and per-shard waste drops (the classic
   * first-fit-decreasing intuition, kept contiguous so the assignment
   * stays one distributed prefix-sum pass instead of a sequential
   * bin-packer).
   */
  def packedShards(docs: DataFrame, tokenCountCol: Column,
      idCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    runningTotalBy(docs.withColumn("__tok", tokenCountCol.cast("long")),
        col("__tok"), Seq(col("__tok").desc, col(idCol)), "__cum")
      .withColumn("shard", expr(s"(__cum - __tok) div $budget"))
      .withColumn("n_tokens", col("__tok"))
      .drop("__tok", "__cum")
  }
}
