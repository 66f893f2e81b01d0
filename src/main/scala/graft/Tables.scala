package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /**
   * Events loader resilient to the testdata generator's physical timestamp
   * encoding, which has changed between rounds (TIMESTAMP(NANOS) → plain
   * timestamp[us]). Read under the legacy nanos conf — a no-op for non-nanos
   * files — then dispatch on the type Spark actually inferred for `ts`:
   *
   *  - `LongType`: the file is TIMESTAMP(NANOS) surfaced as raw nanos under
   *    the conf → truncate to micros (same truncation DuckDB applies).
   *  - `TimestampNTZType`: plain timestamp without UTC-adjust metadata
   *    (pyarrow's default for naive timestamps) → cast to session-TZ
   *    TimestampType; the session TZ is UTC so instants are unchanged.
   *  - `TimestampType`: use as-is.
   *
   * Every consumer sees `ts: TimestampType` regardless of the file's
   * physical encoding. The conf only matters while the schema is being
   * resolved here, so save/restore it instead of leaking a changed
   * parquet-timestamp policy into the whole session.
   */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val raw =
      try spark.read.parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other at $path")
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
