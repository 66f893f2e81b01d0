package graft

import org.apache.spark.sql.SparkSession

/** Run one registry query and count — for profiling. Repeats in ONE
  * session (cache-leak detection: prints the CacheManager state after
  * each run). Usage: runMain graft.QuickRun <name> [sfDir] [reps]
  * — pass reps = "show" to print the first 20 rows instead. */
object QuickRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val show = args.length > 2 && args(2) == "show"
    val reps = if (args.length > 2 && !show) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (show) Registry.queries(name)(spark, sfDir).show(20, truncate = false)
    else (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = Registry.queries(name)(spark, sfDir).count()
      val cached = !spark.sharedState.cacheManager.isEmpty
      println(f"[quickrun] $name run=$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs cachedPlans=$cached")
    }
    spark.stop()
  }
}
