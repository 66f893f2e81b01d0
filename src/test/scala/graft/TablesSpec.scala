package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Loader drift guard. Round 8 lost 21 correctness rows when the driver
 * regenerated /root/testdata and events.ts silently changed physical type
 * (TIMESTAMP(NANOS) → plain timestamp[us]) under a loader hard-coded for
 * nanos. These specs pin [[Tables.loadEvents]] against BOTH physical
 * encodings via tiny committed fixtures, and assert every table at sf0.001
 * loads with the expected logical schema — so the next generator change
 * fails loudly in `sbt test`, not silently in the driver's verify.
 */
class TablesSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/graft/$name").toString

  private def eventInstants(path: String): Seq[(Long, String)] = {
    val df = Tables.loadEvents(spark, path)
    assert(df.schema("ts").dataType === TimestampType,
      s"ts must surface as TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
  }

  test("loadEvents reads a micros-encoded file (current generator)") {
    val got = eventInstants(fixture("events_micros.parquet"))
    assert(got === Seq(
      1L -> "2024-01-01 00:00:00.123456",
      2L -> "2024-01-02 12:30:00.654321",
      3L -> "2024-01-03 23:59:59.999999"))
  }

  test("loadEvents reads a nanos-encoded file (pre-r8 generator)") {
    // Identical logical content as the micros fixture; the nanos→micros
    // truncation is exact here because the fixtures carry micro precision.
    val got = eventInstants(fixture("events_nanos.parquet"))
    assert(got === eventInstants(fixture("events_micros.parquet")))
  }

  test("loadEvents does not leak the legacy nanos conf into the session") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    Tables.loadEvents(spark, fixture("events_micros.parquet")).count()
    assert(spark.conf.getOption(key) === before)
  }

  test("all 10 tables load at sf0.001 with the expected logical schema") {
    val sfDir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)),
      "driver testdata not present in this environment")
    // Column names + the types queries lean on; a regen that changes any
    // of these must fail here rather than in the driver's verify run.
    val expected = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
        "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    Tables.names.foreach { name =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.columns.toSeq === expected(name), s"$name column drift")
      assert(df.limit(1).count() === 1, s"$name is empty or unreadable")
    }
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val emb = Tables.load(spark, sfDir, "embeddings")
    assert(emb.schema("embedding").dataType ===
      ArrayType(FloatType, containsNull = true))
  }
}
