package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"value":...,"queries":{...}}.
 * Queries run twice each; the timed pass is the second, so JIT/codegen
 * warmup and file-listing noise don't dominate — the driver's comparison
 * is against steady-state engine throughput.
 */
object Bench {
  // Headline set: heavy scan-agg, joins (broadcast + shuffled), window
  // dedup, fuzzy join, minhash dedup, ANN, sessionization.
  val headline: Seq[String] = Seq(
    "q1_agg", "j1_left_join", "j3_enrich_coalesce", "j9_range_join",
    "a10_dedup_first", "j8_fuzzy_osa", "dedup_minhash", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_embedding", "ann_cosine_topk",
    "ev_sessionize", "qa_battery", "text_token_stats", "text_lang_id",
    "a3_pivot", "j7_snapshot_diff", "mm_frame_sample",
    "j13_composite_key_join", "q7_keepna_expiry")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink, NOT count(): count() lets ColumnPruning strip the
    // computed columns from projection-only queries, timing a parquet
    // row-count instead of the advertised kernels. The noop writer
    // materializes every output column.
    def run(name: String): Unit =
      Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val qs = headline.filter(Registry.queries.contains)
    // warmup pass (codegen + parquet footer caching)
    qs.foreach { name =>
      val t0 = System.nanoTime()
      try run(name)
      catch { case e: Throwable => System.err.println(s"[bench] $name warmup failed: $e") }
      System.err.println(f"[bench] warmup $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val results = qs.map { name =>
      val t0 = System.nanoTime()
      try run(name)
      catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] timed  $name $dt%.2fs")
      name -> dt
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
