package graft

import org.apache.spark.sql.SparkSession

/**
 * Diagnostic main: run one registry query against a table dir and print
 * its row count — the cheap geometry check for scaling runs (pair-mass
 * linearity, survivor counts) without a bench or a full Verify dump.
 * Usage: runMain graft.QueryCount <sfDir> <queryName> [queryName ...]
 */
object QueryCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryCount <sfDir> <queryName>...")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val q = Registry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[qcount] $name%-28s rows=$n%-12d ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
