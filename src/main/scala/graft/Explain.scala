package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dump formatted physical plans for the given queries
  * (default: the Bench headline set) to stdout for pushdown / broadcast /
  * codegen inspection. Usage: runMain graft.Explain [sfDir] [q1 q2 ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.filter(Registry.queries.contains).foreach { name =>
      println(s"\n========== $name ==========")
      try println(Registry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
