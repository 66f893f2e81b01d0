package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registry integration: custom expressions callable from spark.sql. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("osa_distance and minhash_signature are SQL-callable via extensions") {
    // Extensions apply only at session BUILD time; getOrCreate would
    // silently return the suite-shared session, so clear the default
    // first (the new session shares any existing SparkContext) and
    // restore it after.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = spark.sql("SELECT osa_distance('AB', 'BA') AS d")
        .collect().head.getInt(0)
      assert(d === 1)
      val sig = spark.sql(
        "SELECT minhash_signature(array('abcde', 'bcdef'), 4) AS s")
        .collect().head.getSeq[Long](0)
      assert(sig.length === 4)
      val jac = spark.sql(
        "SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j")
        .collect().head.getDouble(0)
      assert(math.abs(jac - 0.5) < 1e-12)
      val sj = spark.sql(
        "SELECT sorted_jaccard(array('a','b','c'), array('b','c','d')) AS j")
        .collect().head.getDouble(0)
      assert(sj === jac) // merge kernel agrees with the hash-set kernel
      // null elements are skipped, same as jaccard_sim (SQL callers can
      // pass un-sanitized arrays; sort_array places nulls first)
      val sjNull = spark.sql(
        "SELECT sorted_jaccard(array(CAST(NULL AS STRING),'a'), array('a')) AS j")
        .collect().head.getDouble(0)
      assert(sjNull === 1.0)
      val hs = spark.sql(
        "SELECT hyperplane_sig(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 8) AS s")
        .collect().head.getLong(0)
      assert(hs >= 0L && hs < 256L)
      // matches the Column-API expression
      import graft.functions.TextFunctions.minhashSignature
      import org.apache.spark.sql.functions._
      val viaCol = spark.range(1)
        .select(minhashSignature(array(lit("abcde"), lit("bcdef")), 4).as("s"))
        .collect().head.getSeq[Long](0)
      assert(sig === viaCol)
    } finally {
      // do NOT stop(): that would kill the SparkContext shared with the
      // SparkSpec suites. Just restore the prior default session.
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
