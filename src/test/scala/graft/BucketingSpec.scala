package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed tables: the recurring match join runs with zero shuffles. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans without exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val subs = (1 to 1000).map(i => (s"ACC$i", s"payload$i"))
        .toDF("accession", "payload")
      val wdrs = (1 to 1000).filter(_ % 3 == 0)
        .map(i => (s"ACC$i", i.toLong)).toDF("accession", "case_id")
      Bucketing.writeBucketed(subs, "subs_b", "accession", 8)
      Bucketing.writeBucketed(wdrs, "wdrs_b", "accession", 8)

      val joined = Bucketing.bucketedJoin(spark, "subs_b", "wdrs_b", "accession")
      assert(joined.count() === 333)
      joined.collect() // force final plan under AQE
      assert(Bucketing.isShuffleFree(joined),
        s"expected no exchanges:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS subs_b")
      spark.sql("DROP TABLE IF EXISTS wdrs_b")
    }
  }
}
