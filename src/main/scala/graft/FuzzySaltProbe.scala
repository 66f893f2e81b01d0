package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Skewed-fuzzy-join slope probe (round 12): on a [[ScaleRel]]-derived
 * corpus, (1) measures every block's pair mass (the quantity wall time
 * must track), (2) prints the [[FuzzyJoin.planSalts]] decision, and
 * (3) times the production [[FuzzyJoin.fuzzyNameMatch]] path with
 * autoSalt ON vs OFF, asserting the two runs' result sets are
 * hash-identical (order-insensitive count + xxhash64 sum over the pair
 * identity) — the "planSalts observed choosing salts>1 on the hot
 * block with a hash-identical result" evidence the scaling record
 * needs, measured rather than spec'd.
 *
 * The join is the J8 registry shape (customer × supplier on the nation
 * block, id-suffix names) through the full two-pass fuzzyNameMatch
 * (straight ≤2 ∪ flipped ≤1, window dedup) — the reference's real
 * matcher semantics (fuzzy_matching_functions.R:9,41).
 *
 * Usage: runMain graft.FuzzySaltProbe <sfDir> [skipUnsalted]
 *   skipUnsalted=true runs only the auto-salted arm (the unsalted arm
 *   serializes the hot block's entire pair mass through one task by
 *   construction — minutes at 30×; run it when the A/B is the point).
 */
object FuzzySaltProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val skipUnsalted = args.length > 1 && args(1).toBoolean
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_COALESCE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BCAST", "10485760"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val l = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("block"),
        substring(col("c_name"), 10, 100).as("cid"))
    val r = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").as("block"),
        substring(col("s_name"), 10, 100).as("sid"))

    // per-block pair mass: the work the join must do, and the quantity
    // the README slope rows track wall time against
    val mass = l.groupBy("block").agg(count(lit(1)).as("ln"))
      .join(r.groupBy("block").agg(count(lit(1)).as("rn")), Seq("block"))
      .select(col("block"), col("ln"), col("rn"),
        (col("ln") * col("rn")).as("pairs"))
      .orderBy(col("pairs").desc)
      .collect()
    val totalPairs = mass.map(_.getLong(3)).sum
    println(f"[salt-probe] total pair mass: $totalPairs%,d over ${mass.length} blocks")
    mass.take(5).foreach(m => println(
      f"[salt-probe]   block ${m.getInt(0)}%2d: ${m.getLong(1)}%,9d x ${m.getLong(2)}%,7d = ${m.getLong(3)}%,15d pairs"))

    val plan = FuzzyJoin.planSalts(l, r, "block")
    println(s"[salt-probe] planSalts: salts=${plan.salts} " +
      s"hotBlocks=${plan.hotBlocks.sortBy(_.toString)} global=${plan.global}")

    // Bench discipline in miniature: one warmup run per arm (JIT/codegen
    // + parquet footers) before the timed run, so the first arm doesn't
    // carry the young JVM's compiler time into the A/B.
    def runArm(autoSalt: Boolean): org.apache.spark.sql.Row =
      FuzzyJoin.fuzzyNameMatch(
          l, substring(col("cid"), 1, 4), substring(col("cid"), 5, 100),
          r, substring(col("sid"), 1, 4), substring(col("sid"), 5, 100),
          "block", maxDist = 2, flippedMaxDist = 1, autoSalt = autoSalt)
        // decimal sum: order-insensitive fingerprint without ANSI Long
        // overflow (xxhash64 values sum past 2^63 after ~2 rows)
        .agg(count(lit(1)).as("n"),
          coalesce(sum(xxhash64(col("c_custkey"), col("s_suppkey"),
            col("distance")).cast("decimal(38,0)")), lit(0)).as("h"))
        .head()
    def timedArm(name: String, autoSalt: Boolean): Unit = {
      runArm(autoSalt) // warmup
      val t0 = System.nanoTime()
      val row = runArm(autoSalt)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[salt-probe] $name%-10s ${t}%8.1fs  rows=${row.getLong(0)}%,d  hash=${row.get(1)}")
    }
    timedArm("salted", autoSalt = true)
    if (!skipUnsalted) timedArm("unsalted", autoSalt = false)
    spark.stop()
  }
}
