package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join on skewed data, spread across salt buckets. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals plain inner join") {
    // heavily skewed: 900 rows of key 1, 100 spread over 2..11
    val left = ((1 to 900).map(i => (1, s"l$i")) ++
      (1 to 100).map(i => (2 + i % 10, s"x$i"))).toDF("key", "lv")
    val right = (1 to 11).map(k => (k, s"r$k")).toDF("key", "rv")

    val plain = left.join(right, Seq("key"))
      .select("key", "lv", "rv").as[(Int, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(left, right, "key", salts = 8,
        saltBy = Seq(col("lv")))
      .select("key", "lv", "rv").as[(Int, String, String)].collect().toSet
    assert(salted === plain)
  }

  test("salt actually spreads the hot key") {
    val left = (1 to 1000).map(i => (1, s"l$i")).toDF("key", "lv")
    val salts = left.withColumn("__salt", pmod(hash(col("lv")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts === 8)
  }
}
