package graft.qa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's rule-engine pattern (SURVEY §2.8): batteries of named
 * flag columns valued 1 (violation) / 0, a row-wise error sum, and a
 * column-sum visibility report (scripts/Roster_scripts/quality_filters.R:
 * 55-202, scripts/QA/wdrs_qa/wdrs_qa_functions.R:44-228). Flags are plain
 * Column expressions — whole-stage-codegen'd, no UDFs — and the within-batch
 * duplicate flags are window counts, so the only shuffle is per flagged key.
 */
object QaRules {

  /** A named QA rule: flag column is 1 when the predicate (violation) holds. */
  case class Rule(name: String, violation: Column) {
    def flag: Column = when(violation, lit(1)).otherwise(lit(0)).as(name)
  }

  /** Null-or-blank check (QA_CASE_ID style). */
  def required(c: Column): Column = c.isNull || trim(c) === ""

  /** Value not in a small controlled vocabulary (QA_SEQ_STAT style). */
  def notInVocab(c: Column, vocab: Seq[String]): Column =
    c.isNotNull && !c.isin(vocab: _*)

  /** String contains a character outside [0-9] (CASE_ID digits-only rule,
    * quality_filters.R:163). */
  def notDigitsOnly(c: Column): Column = c.isNotNull && !c.rlike("^[0-9]+$")

  /** Member of a duplicate group within the batch (SURVEY A8 — R's
    * `x %in% x[duplicated(x)]` flags ALL members). */
  def dupWithinBatch(key: Column*): Column =
    count(lit(1)).over(Window.partitionBy(key: _*)) > 1

  /** Date outside +-tol days of a reference date (QA_COLLECT_DATE). */
  def outsideDateWindow(d: Column, ref: Column, tolDays: Int): Column =
    d.isNotNull && ref.isNotNull && abs(datediff(d, ref)) > tolDays

  /** Apply a battery: adds every flag column plus `qa_sum`. */
  def applyBattery(df: DataFrame, rules: Seq[Rule],
      sumCol: String = "qa_sum"): DataFrame = {
    val flagged = rules.foldLeft(df)((d, r) => d.withColumn(r.name, r.flag))
    flagged.withColumn(sumCol,
      rules.map(r => col(r.name)).reduce(_ + _))
  }

  /** Column-sum visibility report: one row of per-rule violation totals
    * (quality_filters.R:195-199). */
  def report(df: DataFrame, ruleNames: Seq[String]): DataFrame =
    df.agg(sum(col(ruleNames.head)).as(ruleNames.head),
      ruleNames.tail.map(n => sum(col(n)).as(n)): _*)

  /** Sentinel scan (SURVEY Q5, elr.Rmd:558-584): any of the given string
    * columns contains the sentinel. */
  def sentinelHit(cols: Seq[Column], sentinel: String): Column =
    exists(array(cols: _*), c => c.isNotNull && c.contains(sentinel))
}
