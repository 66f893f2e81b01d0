package graft

import org.apache.spark.sql.SparkSession

/** Run one registry query and count — for profiling. Usage:
  * runMain graft.QuickRun <name> [sfDir] */
object QuickRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = Registry.queries(name)(spark, sfDir).count()
    println(f"[quickrun] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
