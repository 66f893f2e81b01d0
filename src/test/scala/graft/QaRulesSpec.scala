package graft

import graft.qa.QaRules
import graft.qa.QaRules.Rule
import org.apache.spark.sql.functions._

/** QA rule-engine coverage (SURVEY §2.8): flags are 1/0, qa_sum adds up,
  * dup flags mark ALL group members, report sums per column. */
class QaRulesSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("1", "OK", "k1"), ("2", "BAD", "k2"), ("", "OK", "k2"), ("x4", "OK", "k3"))
    .toDF("id", "status", "key")

  test("applyBattery adds flags and row-wise qa_sum") {
    val rules = Seq(
      Rule("qa_id", QaRules.required(col("id"))),
      Rule("qa_digits", QaRules.notDigitsOnly(col("id"))),
      Rule("qa_vocab", QaRules.notInVocab(col("status"), Seq("OK"))),
      Rule("qa_dup", QaRules.dupWithinBatch(col("key"))))
    val out = QaRules.applyBattery(df, rules)
      .select("id", "qa_id", "qa_digits", "qa_vocab", "qa_dup", "qa_sum")
      .as[(String, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("1") === ("1", 0, 0, 0, 0, 0))
    assert(out("2") === ("2", 0, 0, 1, 1, 2))  // dup flags BOTH k2 members
    assert(out("") === ("", 1, 1, 0, 1, 3))
    assert(out("x4") === ("x4", 0, 1, 0, 0, 1))
  }

  test("report: one row of per-rule totals") {
    val rules = Seq(
      Rule("qa_id", QaRules.required(col("id"))),
      Rule("qa_vocab", QaRules.notInVocab(col("status"), Seq("OK"))))
    val flagged = QaRules.applyBattery(df, rules)
    val r = QaRules.report(flagged, Seq("qa_id", "qa_vocab"))
      .as[(Long, Long)].head()
    assert(r === ((1L, 1L)))
  }

  test("sentinelHit scans across columns null-safely") {
    val d = Seq(("ok", "QA CHECK FAIL: x"), ("ok", null), ("QA CHECK FAIL", "ok"))
      .toDF("a", "b")
    val hits = d.filter(QaRules.sentinelHit(Seq(col("a"), col("b")), "QA CHECK FAIL"))
    assert(hits.count() === 2)
  }

  test("outsideDateWindow: ±14 days") {
    val d = Seq(("2023-01-01", "2023-01-10"), ("2023-01-01", "2023-02-01"),
      (null, "2023-01-01")).toDF("a", "b")
      .select(QaRules.outsideDateWindow(
        col("a").cast("date"), col("b").cast("date"), 14).as("out"))
    assert(d.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      === Seq(false, true, false))
  }
}
