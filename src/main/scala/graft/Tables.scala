package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
      // default. Read it as raw nanos and truncate to microseconds — the
      // same truncation DuckDB applies — keeping `ts` a TimestampType for
      // every consumer. The conf only matters while the schema is being
      // resolved here, so save/restore it instead of leaking a changed
      // parquet-timestamp policy into the whole session.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /**
   * Per-PROCESS scratch directory for registry queries that build a
   * throwaway index: unique per JVM (concurrent sessions — a background
   * bench beside a verify run — can't overwrite each other's index
   * mid-read, the race a fixed path had) and deleted on JVM exit (no
   * accumulation across runs, the leak a fresh temp dir per run had).
   * Repeated calls with the same tag in one JVM reuse the path —
   * overwrite-mode writes replace it, matching single-session reruns.
   */
  def scratchDir(tag: String): String = {
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"),
      s"graft_${tag}_${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(dir)
    scratchRegistered.computeIfAbsent(dir.toString, { d =>
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        val p = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(p)) {
          scala.util.Using.resource(java.nio.file.Files.walk(p)) { s =>
            s.iterator().asScala.toSeq.reverse
              .foreach(f => java.nio.file.Files.deleteIfExists(f))
          }
        }
      }
      java.lang.Boolean.TRUE
    })
    dir.toString
  }
  private val scratchRegistered =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** A FRESH per-invocation directory under the per-process scratch root:
    * unique every call (reruns in one JVM get a clean tree instead of
    * replaying against leftover state) but still deleted at JVM exit via
    * the [[scratchDir]] shutdown hook — unlike a bare
    * `Files.createTempDirectory`, which leaked one state dir per builder
    * invocation across repeated correctness/bench runs. */
  def freshScratch(tag: String): String = {
    val root = java.nio.file.Paths.get(
      scratchDir(tag), java.util.UUID.randomUUID().toString)
    java.nio.file.Files.createDirectories(root)
    root.toString
  }
}
