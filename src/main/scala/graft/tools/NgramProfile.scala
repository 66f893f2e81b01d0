package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the ngram dedup phases. Not part of the library
  * surface — run via `runMain graft.tools.NgramProfile [sfDir]`. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 2).foreach { pass =>
      time(s"pass$pass auto")(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8).count())
      time(s"pass$pass size")(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8, "size").count())
      time(s"pass$pass prefix")(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8, "prefix").count())
    }
    spark.stop()
  }
}
