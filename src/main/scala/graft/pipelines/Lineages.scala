package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The lineage-list transform (scripts/Auto_seq/Lineages/lineages_pull
 * .Rmd:36-140, in-engine half — the HTTP pull itself is acquisition and
 * out of scope per SURVEY §2.1): parse the raw pango lineage-notes text
 * into (lineage, description, status), survive the file's known defects
 * (stray spaces instead of tabs, `*` markers on withdrawn lineages,
 * duplicate rows), gate on the lineage-shape QA check, and resolve
 * WITHDRAWN ALIASES to their active replacements so the F9 vocabulary
 * validation can accept a record annotated with a withdrawn name.
 *
 * Scale note: the lineage list is reference-data-sized (thousands of
 * rows) — every consumer broadcasts it; these transforms exist for
 * correctness and provenance, not throughput.
 */
object Lineages {

  /** Shape every lineage must match (lineages_pull.Rmd:85-101) — the
    * reference aborts the run on any violation. */
  val lineageShape = "^[A-Z]+(\\.[0-9]+)*$"

  /**
   * Parse raw lineage-notes lines (one row per text line, `lineCol`):
   * tab-split into lineage + description, header and fully-empty rows
   * dropped, status derived from a case-blind "withdrawn" in the
   * description, lineage trimmed to its first whitespace-free token (the
   * file sometimes carries a space where the tab belongs) and stripped
   * of the `*` withdrawn marker. The header is dropped BY VALUE
   * ("Lineage"/"Description") rather than by position — same effect as
   * the reference's row-1 slice, but order-independent (a distributed
   * read has no stable row 1).
   */
  def parseNotes(lines: DataFrame, lineCol: String): DataFrame =
    lines
      .select(split(col(lineCol), "\t", 2).as("__parts"))
      .select(
        coalesce(try_element_at(col("__parts"), lit(1)), lit("")).as("__raw_lin"),
        coalesce(try_element_at(col("__parts"), lit(2)), lit("")).as("description"))
      .filter(!(col("__raw_lin") === "" && col("description") === ""))
      .filter(!(col("__raw_lin") === "Lineage" && col("description") === "Description"))
      .withColumn("status",
        when(lower(col("description")).contains("withdrawn"), "Withdrawn")
          .otherwise("Active"))
      .withColumn("lineage_extracted",
        regexp_replace(regexp_extract(col("__raw_lin"), "^\\S+", 0), "\\*", ""))
      .select("lineage_extracted", "description", "status")

  /** Rows failing the lineage-shape gate. The reference emails and
    * aborts on any hit; callers assert isEmpty before publishing. */
  def violations(parsed: DataFrame): DataFrame =
    parsed.filter(!col("lineage_extracted").rlike(lineageShape))

  /**
   * Deduplicate (lineages_pull.Rmd:117-140): one row per (lineage,
   * status) — deterministic keep-first over `tieBreak` instead of the
   * reference's order-dependent `distinct(.keep_all)` (SURVEY §7.4#2) —
   * then, when a lineage carries BOTH statuses, the Withdrawn row wins
   * (the reference anti-joins the duplicated Active rows away).
   */
  def dedupe(parsed: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("lineage_extracted"), col("status"))
      .orderBy(col("description"))
    val d1 = parsed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val wBoth = Window.partitionBy(col("lineage_extracted"))
    d1.withColumn("__ns", size(collect_set(col("status")).over(wBoth)))
      .filter(!(col("__ns") === 2 && col("status") === "Active"))
      .drop("__ns")
  }

  /**
   * Withdrawn-alias table: a withdrawn lineage whose description names
   * its replacement ("Withdrawn: Reassigned to B.1.1.529", "Withdrawn:
   * Duplicate of B.1.631", ...) maps to the first lineage-shaped token
   * in the description. Withdrawals without a named successor yield no
   * row. The dotted-number requirement keeps prose words ("Withdrawn",
   * "Reassigned") from matching.
   */
  def withdrawnAliases(deduped: DataFrame): DataFrame =
    deduped
      .filter(col("status") === "Withdrawn")
      .withColumn("alias_target",
        nullif(regexp_extract(col("description"),
          "([A-Z]+(?:\\.[0-9]+)+)", 1), lit("")))
      .filter(col("alias_target").isNotNull)
      .select(col("lineage_extracted").as("withdrawn"), col("alias_target"))

  /**
   * The F9 validation vocabulary with alias expansion: (lineage,
   * canonical) — every ACTIVE lineage maps to itself, and every
   * withdrawn alias whose target is active maps to that target. A
   * record annotated with a withdrawn name resolves to the replacement
   * instead of failing validation against the flat active list.
   */
  def vocabulary(deduped: DataFrame): DataFrame = {
    val active = deduped.filter(col("status") === "Active")
      .select(col("lineage_extracted").as("lineage"))
    val aliases = withdrawnAliases(deduped)
      .join(active.select(col("lineage").as("alias_target")), Seq("alias_target"))
      .select(col("withdrawn").as("lineage"), col("alias_target").as("canonical"))
    active.select(col("lineage"), col("lineage").as("canonical"))
      .unionByName(aliases)
  }
}
