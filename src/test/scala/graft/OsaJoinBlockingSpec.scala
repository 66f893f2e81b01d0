package graft

import graft.functions.osa_distance
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The osa-join blocking rule: a naive fuzzy-distance join must plan as
  * a banded equi-join (no nested-loop) with identical results. */
class OsaJoinBlockingSpec extends AnyFunSuiteWithExtSession {

  test("osa<=k join: nested loop without the rule, equi join + same rows with it") {
    import extSession.implicits._
    val l = Seq("SMITH_JOHN", "DOE_JANE", "WILSON_MARY", "WU_AL")
      .toDF("lname").withColumn("lid", monotonically_increasing_id())
    val r = Seq("SMTIH_JOHN", "DOE_JAN", "WILSON_M", "TOTALLY_DIFFERENT_NAME")
      .toDF("rname").withColumn("rid", monotonically_increasing_id())

    val fuzzy = l.join(r, osa_distance(col("lname"), col("rname")) <= 2)
    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"expected the banded equi-join rewrite:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"))

    // ground truth: cross join + filter (planner can't avoid BNLJ here,
    // tiny data) computed WITHOUT the osa predicate in the join condition
    val truth = l.crossJoin(r)
      .filter(osa_distance(col("lname"), col("rname")) <= 2)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val got = fuzzy.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === truth)
    assert(got.nonEmpty) // SMITH/SMTIH at OSA 1, DOE_JANE/DOE_JAN at 1
  }

  test("rule stays out of joins that already have an equi key") {
    import extSession.implicits._
    val l = Seq((1980, "SMITH_JOHN")).toDF("by", "lname")
    val r = Seq((1980, "SMTIH_JOHN"), (1981, "SMITH_JOHN")).toDF("rby", "rname")
    val joined = l.join(r, col("by") === col("rby") &&
      osa_distance(col("lname"), col("rname")) <= 2)
    // no Generate injected: the plan has no explode of band probes
    assert(!joined.queryExecution.optimizedPlan.toString.contains("__osa_probe"))
    assert(joined.count() === 1)
  }

  test("rewritten join ≡ cross-filter ground truth on randomized names") {
    import extSession.implicits._
    val rnd = new scala.util.Random(99)
    def name() = (0 until 3 + rnd.nextInt(8))
      .map(_ => ('A' + rnd.nextInt(4)).toChar).mkString // tiny alphabet -> many near-misses
    val l = (1 to 40).map(i => (i.toLong, name())).toDF("lid", "lname")
    val r = (1 to 40).map(i => (i.toLong, name())).toDF("rid", "rname")
    for (k <- Seq(1, 3)) {
      val got = l.join(r, osa_distance(col("lname"), col("rname")) <= k)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val truth = l.crossJoin(r)
        .filter(osa_distance(col("lname"), col("rname")) <= k)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got === truth, s"rewrite lost/added pairs at k=$k")
      assert(truth.nonEmpty)
    }
  }

  test("registry j8_fuzzy_osa_rewritten goes through the rewrite: no nested loop") {
    // the exact query the correctness gate runs — end-to-end through the
    // rule, on real testdata, with the banded plan
    val q = Registry.queries("j8_fuzzy_osa_rewritten")(
      extSession, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"registry query did not take the banded rewrite:\n$plan")
    assert(plan.contains("__osa_probe") || plan.contains("__osa_band"),
      s"expected the band/probe helper columns in the plan:\n$plan")
    assert(q.count() > 0)
  }

  test("left outer keeps unmatched left rows exactly once") {
    import extSession.implicits._
    val l = Seq("SMITH_JOHN", "ZZZZZZZZZZZZZZZZZZZZZZZZZ").toDF("lname")
    val r = Seq("SMTIH_JOHN", "SMITH_JOHNS").toDF("rname")
    val out = l.join(r, osa_distance(col("lname"), col("rname")) <= 2, "left")
    assert(out.queryExecution.optimizedPlan.toString.contains("__osa_probe"))
    val rows = out.select(col("lname"), col("rname"))
      .as[(String, Option[String])].collect()
    assert(rows.count(_._1 == "SMITH_JOHN") === 2)        // both fuzzy matches
    assert(rows.filter(_._1.startsWith("Z")) ===
      Array(("ZZZZZZZZZZZZZZZZZZZZZZZZZ", None)))          // preserved once
  }
}

/** Shared session WITH GraftExtensions for plan-rule specs (the SparkSpec
  * session is built without extensions; extensions only apply at session
  * build time). */
trait AnyFunSuiteWithExtSession
    extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None

  protected lazy val extSession: SparkSession = {
    prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-osarule-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    // do NOT stop(): the SparkContext is shared with the other suites
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    prior.foreach(SparkSession.setDefaultSession)
    prior.foreach(SparkSession.setActiveSession)
    super.afterAll()
  }
}
