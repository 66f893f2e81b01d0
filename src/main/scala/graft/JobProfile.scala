package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level wall profile of one registry query (r18 optimization
  * tooling, guide §1.1/§7): run the query once to warm the JVM and page
  * cache, then once under a listener recording each Spark job's wall
  * time and submitting call site, and print the timeline including the
  * DRIVER GAPS between jobs — at bench scale the composed lifecycle
  * rows are sums of many small jobs plus driver-side sidecar work, and
  * this is the measurement that says which. The timed action is the
  * noop sink, same as Bench. Usage: runMain graft.JobProfile <name>
  * [sfDir]. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Unit = Registry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    run() // warm pass: JIT, footers, scratch dirs
    spark.catalog.clearCache()
    final case class J(id: Int, t0: Long, site: String) {
      @volatile var t1: Long = 0L
    }
    val jobs = scala.collection.concurrent.TrieMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // prefer the submitting call site; fall back to the result
        // stage's name (actions submitted off-thread lose properties)
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobs(e.jobId) = J(e.jobId, System.nanoTime(),
          site + " [" + e.stageInfos.map(_.numTasks).sum + " tasks/" +
            e.stageInfos.size + " stages]")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = System.nanoTime())
    }
    spark.sparkContext.addSparkListener(listener)
    val w0 = System.nanoTime()
    run()
    val w1 = System.nanoTime()
    spark.sparkContext.removeSparkListener(listener)
    val js = jobs.values.toSeq.sortBy(_.t0)
    println(f"[jobprofile] $name total ${(w1 - w0) / 1e9}%.2fs over ${js.size} jobs")
    var prevEnd = w0
    js.foreach { j =>
      val gap = math.max(0L, j.t0 - prevEnd) / 1e9
      val dur = (j.t1 - j.t0) / 1e9
      println(f"[jobprofile] job=${j.id}%4d gap=$gap%7.3f dur=$dur%7.3f  ${j.site}")
      prevEnd = math.max(prevEnd, j.t1)
    }
    val tail = math.max(0L, w1 - prevEnd) / 1e9
    println(f"[jobprofile] trailing driver time $tail%.3fs")
    spark.stop()
  }
}
