package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Relational-side sibling of [[ScaleCorpus]] (round 12): derives
 * 10×/30× customer/supplier/orders corpora with a HOT blocking-key
 * distribution, so the reference's own workload shape — the template
 * pipeline, the blocked fuzzy join, the QA batteries — can be timed at
 * 1×/10×/30× under the unmodified Bench harness and the auto-salt path
 * can be observed firing on a measured mega-block.
 *
 * The hot key mirrors the reference's birth-year skew
 * (docs/notebooks/fuzzy.Rmd:562-579: cohort years carry orders of
 * magnitude more rows than the tail — the entire motivation for its
 * blocked PSOCK fan-out): here the fuzzy block key is the nation key
 * (the J8 registry rows' block), and every derived copy re-draws it
 * per row — `hotPct`% of BOTH sides land in block 0, the rest spread
 * uniformly over blocks 1..24. A block's join work is the product of
 * its two side counts, so at hotPct=20 the hot block carries ~39× a
 * cold block's pair mass — while the hot partition's BYTES stay tiny
 * (tens of MB at 30×), which is exactly why AQE's byte-based skew
 * split never fires on it and the measured salt plan must.
 *
 * Keys shift by c·10^7 per copy (the [[ScaleCorpus]] convention);
 * names are re-derived from the shifted key in the TPC-H shape
 * (`Customer#%09d`) so the J8 id-suffix fuzzy semantics carry over
 * unchanged; orders keep per-copy FK consistency (o_custkey shifts
 * with its copy) so the qa_battery's within-batch dup structure is
 * exactly the base's in every copy. All other tables copy verbatim —
 * every registry query stays runnable against the derived dir.
 *
 * The skew is applied at EVERY mult including 1, so the 1× arm of a
 * slope run shares the derived geometry and the ratios are pure scale.
 *
 * Usage: runMain graft.ScaleRel <baseSfDir> <outDir> <mult> [hotPct=20]
 */
object ScaleRel {

  /** Deterministic hot-block draw: hotPct% to block 0, rest uniform over
    * 1..24. Seeded off the (already copy-shifted) key — same key, same
    * block, across reruns. */
  private[graft] def hotBlock(key: Column, hotPct: Int): Column =
    when(pmod(xxhash64(key, lit(9173)), lit(100)) < hotPct, lit(0))
      .otherwise(pmod(xxhash64(key, lit(577)), lit(24)) + lit(1))
      .cast("int")

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleRel <baseSfDir> <outDir> <mult> [hotPct]")
    val base = args(0)
    val out = args(1)
    val mult = args(2).toInt
    val hotPct = if (args.length > 3) args(3).toInt else 20
    require(mult >= 1 && mult <= 300, s"mult must be in [1,300], got $mult")
    require(hotPct >= 1 && hotPct <= 90, s"hotPct must be in [1,90], got $hotPct")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shift = 10000000L

    val cust = Tables.load(spark, base, "customer")
    (0 until mult).map { c =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(c * shift))
        .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
        .withColumn("c_nationkey", hotBlock(col("c_custkey"), hotPct))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    val supp = Tables.load(spark, base, "supplier")
    (0 until mult).map { c =>
      supp.withColumn("s_suppkey", col("s_suppkey") + lit(c * shift))
        .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
        .withColumn("s_nationkey", hotBlock(col("s_suppkey"), hotPct))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    val ord = Tables.load(spark, base, "orders")
    (0 until mult).map { c =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(c * shift))
        .withColumn("o_custkey", col("o_custkey") + lit(c * shift))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    Tables.names
      .filterNot(n => n == "customer" || n == "supplier" || n == "orders")
      .foreach { name =>
        Tables.load(spark, base, name)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
      }

    val nc = spark.read.parquet(s"$out/customer.parquet").count()
    val ns = spark.read.parquet(s"$out/supplier.parquet").count()
    val no = spark.read.parquet(s"$out/orders.parquet").count()
    println(s"[scale-rel] $out: customer=$nc supplier=$ns orders=$no " +
      s"(mult=$mult hotPct=$hotPct from $base)")
    spark.stop()
  }
}
