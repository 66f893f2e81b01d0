package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gap-report assembly (SURVEY Q8/S10, scripts/QA/gap_data.Rmd:160-460):
 * sequences present in the public repositories (GISAID / GenBank) but
 * missing from WDRS, attributed to a submitting lab via the virus-name ID
 * parts, and summarized per lab x collection year for the outreach email.
 *
 * Scale shape: the repository extract is the big side; the WDRS accession
 * set projects to one lowercase column before both anti-joins (broadcast
 * at reference scale, shuffle-hash beyond), and lab attribution is a pure
 * expression tree — no UDFs, no driver loops.
 */
object GapReport {

  /** Case-insensitive anti-membership: repository rows whose accession is
    * NOT in WDRS (gap_data.Rmd:179-180). */
  def gapAgainstWdrs(repo: DataFrame, nameCol: String,
      wdrsAccessions: DataFrame, accCol: String): DataFrame =
    repo.join(
      wdrsAccessions.select(lower(col(accCol)).as("__wdrs_acc")),
      lower(col(nameCol)) === col("__wdrs_acc"), "left_anti")

  /**
   * UW alternate-ID synthesis (gap_data.Rmd:183-195): three UW virus-name
   * formats historically carried a collection-date fragment (yyMM or
   * yyMMdd) injected after the lab token; the alt id reconstructs that
   * form so a second anti-pass can catch WDRS rows stored under it.
   * Null when the name matches no UW format.
   */
  def uwAltId(name: Column, collectionDate: Column): Column = {
    val yymm = date_format(collectionDate, "yyMM")
    val yymmdd = date_format(collectionDate, "yyMMdd")
    when(length(name) === 22 && name.rlike("^USA/WA-UW-[0-9]{7}/202[0-9]$"),
      concat(lit("USA/WA-UW-"), yymm,
        regexp_extract(name, "^USA/WA-UW-([0-9]{7}/202[0-9])$", 1)))
      .when(length(name) === 23 && name.rlike("^USA/WA-CDC-UW[0-9]{5}/202[0-9]$"),
        concat(lit("USA/WA-CDC-UW"), yymmdd,
          regexp_extract(name, "^USA/WA-CDC-UW([0-9]{5}/202[0-9])$", 1)))
      .when(length(name) === 24 && name.rlike("^USA/WA-CDC-UW-[0-9]{5}/202[0-9]$"),
        concat(lit("USA/WA-CDC-UW"), yymmdd,
          regexp_extract(name, "^USA/WA-CDC-UW-([0-9]{5}/202[0-9])$", 1)))
      .otherwise(lit(null).cast("string"))
  }

  /** Second gap pass (gap_data.Rmd:197): drop rows whose UW alt id IS in
    * WDRS; rows without an alt id always survive (null never equi-joins). */
  def removeAltMatches(gap: DataFrame, altCol: String,
      wdrsAccessions: DataFrame, accCol: String): DataFrame =
    gap.join(
      wdrsAccessions.select(lower(col(accCol)).as("__wdrs_acc")),
      lower(col(altCol)) === col("__wdrs_acc"), "left_anti")

  /**
   * VIRUS_ID_PART1/2 extraction (gap_data.Rmd:199-207): split the virus
   * name on '-', collapse CONSECUTIVE duplicate segments (R's rle()
   * idiom), take segments 2 and 3, strip to letters/underscore (the
   * reference's sloppy [^A-z] range keeps '_' — load-bearing for the
   * MG_LHLV_O token), except a literal "2" in part 2 survives (the
   * CDC-2 PHL format). Adds `__parts` is materialized as an attribute
   * first so the indexed filter lambda doesn't re-evaluate the split per
   * element.
   */
  def withVirusIdParts(df: DataFrame, nameCol: String): DataFrame = {
    // try_element_at, not element_at: ANSI mode (Spark 4 default) makes
    // element_at THROW on out-of-range indexes — names with fewer than 3
    // segments must yield "" instead. In the rle lambda, i is the 0-based
    // element index, so try_element_at(parts, i) is the PREVIOUS element
    // (1-based access) and null exactly at i=0, where the || arm keeps it.
    val collapsed = df
      .withColumn("__parts", split(col(nameCol), "-"))
      .withColumn("__rle", filter(col("__parts"),
        (x, i) => i === 0 || x =!= try_element_at(col("__parts"), i)))
    collapsed
      .withColumn("VIRUS_ID_PART1", coalesce(
        regexp_replace(try_element_at(col("__rle"), lit(2)), "[^A-Za-z_]", ""),
        lit("")))
      .withColumn("VIRUS_ID_PART2", coalesce(
        when(try_element_at(col("__rle"), lit(3)) === "2", lit("2"))
          .otherwise(
            regexp_replace(try_element_at(col("__rle"), lit(3)), "[^A-Za-z_]", "")),
        lit("")))
      .drop("__parts", "__rle")
  }

  /**
   * Lab attribution from the ID parts (gap_data.Rmd:268-327): the fixed
   * token→lab table shared by the GISAID and GenBank arms; `cdcFallback`
   * resolves a bare -CDC- with no part 2 (originating lab in the GISAID
   * arm), `defaultFallback` everything unrecognized (submitting /
   * cleaned lab).
   */
  def gapLab(p1: Column, p2: Column,
      cdcFallback: Column, defaultFallback: Column): Column = {
    val table: Seq[(Column, String)] = Seq(
      (p1 === "ASC" || p2 === "ASC") -> "Aegis",
      (p1 === "CDC" && p2 === "STM") -> "Helix",
      (p1 === "CDC" && p2 === "VSX") -> "Helix",
      (p1 === "CDC" && p2 === "LC") -> "Labcorp",
      (p1 === "QDX") -> "Quest",
      (p1 === "CDC" && p2 === "QDX") -> "Quest",
      (p1 === "UW" || p1 === "MG_LHLV_O") -> "UW Virology",
      (p1 === "CDC" && p2 === "UW") -> "UW Virology",
      (p1 === "PHL") -> "PHL",
      (p1 === "CDC" && p2 === "2") -> "PHL/CDC",
      (p1 === "ASU") -> "ASU",
      (p1 === "Curative") -> "Curative",
      (p1 === "CDC" && p2 === "IBX") -> "Infinity Biologix",
      (p1 === "IVY") -> "Lauring lab",
      (p1 === "S") -> "Seattle Flu Study",
      (p1 === "USAFSAM") -> "USAFSAM",
      (p1 === "CDC" && p2 === "MMB") -> "Mako Medical",
      (p1 === "NM") -> "NW Memorial Hosp",
      (p1 === "OHSU") -> "OHSU",
      (p1 === "TRACE") -> "OSU TRACE",
      (p1 === "KHEL") -> "Kansas Health",
      (p1 === "VTVAS" || p1 === "VTVASGSC") -> "Virginia Tech",
      (p1 === "Yale") -> "Yale")
    val base = table.foldRight(
      when(p1 === "CDC" && p2 === "", cdcFallback).otherwise(defaultFallback)) {
      case ((cond, lab), els) => when(cond, lit(lab)).otherwise(els)
    }
    base
  }

  /**
   * Per-lab x collection-year gap counts with the share of ALL repository
   * submissions that year (gap_data.Rmd:404-452), numeric long form:
   * (gap_lab, yr, n, pct_bp) with pct in basis points (floor) — exact
   * integer arithmetic, engine-portable. The Kaiser long-name collapse
   * and NA→'NA' rename happen here.
   */
  def gapCounts(gap: DataFrame, labCol: String, yearCol: String,
      population: DataFrame, popYearCol: String): DataFrame = {
    val counts = gap
      .withColumn("gap_lab", coalesce(
        when(col(labCol) ===
          "Kaiser Permanente Washington Health Research Institute",
          lit("Kaiser Permanente")).otherwise(col(labCol)),
        lit("NA")))
      .groupBy(col("gap_lab"), col(yearCol).as("yr"))
      .agg(count(lit(1)).as("n"))
    val pop = population.groupBy(col(popYearCol).as("yr"))
      .agg(count(lit(1)).as("__pop"))
    counts.join(pop, Seq("yr"), "left")
      .withColumn("pct_bp",
        floor(col("n") * lit(10000L) / col("__pop")).cast("long"))
      .select(col("gap_lab"), col("yr"), col("n"), col("pct_bp"))
  }

  /**
   * S10 conditional-format decision replay (gap_data.Rmd:694-851): the
   * gap workbook layers openxlsx conditionalFormatting rules over the two
   * summary sheets — green `>=0`, yellow `>3`, orange `>5`, red `>10` on
   * the proportion sheet; the same ladder on the count sheet with the
   * thresholds rescaled to counts (3/5/10% of the total gap row count,
   * `total_count_x` in the Rmd); grey on the header row and on the
   * Grand_Total label cell. Rules added later sit higher in the rule
   * stack (most-recently-added wins on a bgFill conflict), so the
   * EFFECTIVE color of a value cell is the highest threshold it clears —
   * green would otherwise shadow the whole escalation ladder.
   *
   * This emits those effective decisions as a data frame — one row per
   * value cell of each sheet (labs x years plus the Grand_Total row,
   * whose value cells sit inside the rules' cell range too) — so the
   * style choices are oracle-replayable, not just unit-asserted:
   * `val` is pct in basis points on the proportion sheet (rule `>3`% ⟺
   * `pct_bp > 300`, exact integer arithmetic) and the raw count on the
   * count sheet (`n > 3% · N` ⟺ `100·n > 3·N`); `label_color` is the
   * col-1 grey rule's verdict for the row's label cell (the header-row
   * grey is structural — every header cell, no data dependence).
   *
   * @param counts [[gapCounts]] output: (gap_lab, yr, n, pct_bp)
   */
  def summaryStyleMatrix(counts: DataFrame): DataFrame = {
    val totalRow = counts.groupBy("yr")
      .agg(sum(col("n")).as("n"), sum(col("pct_bp")).as("pct_bp"))
      .withColumn("gap_lab", lit("Grand_Total"))
      .select("gap_lab", "yr", "n", "pct_bp")
    val wt = counts.select("gap_lab", "yr", "n", "pct_bp")
      .unionByName(totalRow)
      // 1-row total (the Rmd's total_count_x), broadcast into every cell
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__N"))))
    val labelColor =
      when(col("gap_lab") === "Grand_Total", "grey").otherwise("none")
    val prop = wt.select(
      lit("Summary Proportion").as("sheet"), col("gap_lab"), col("yr"),
      col("pct_bp").as("val"),
      when(col("pct_bp") > 1000, "red")
        .when(col("pct_bp") > 500, "orange")
        .when(col("pct_bp") > 300, "yellow")
        .when(col("pct_bp") >= 0, "green")
        .otherwise("none").as("color"),
      labelColor.as("label_color"))
    val cnt = wt.select(
      lit("Summary Count").as("sheet"), col("gap_lab"), col("yr"),
      col("n").as("val"),
      when(col("n") * 100 > col("__N") * 10, "red")
        .when(col("n") * 100 > col("__N") * 5, "orange")
        .when(col("n") * 100 > col("__N") * 3, "yellow")
        .when(col("n") >= 0, "green")
        .otherwise("none").as("color"),
      labelColor.as("label_color"))
    prop.unionByName(cnt)
  }

  /**
   * The email-ready wide table (gap_data.Rmd:430-460): one row per lab,
   * one column per collection year holding "N (P%)" (P rounded to 2
   * decimals, '<0.01' under a basis point), a per-year Total row, zero
   * fill. Driver-side pivot is fine — the report is human-sized by
   * construction (labs x years).
   */
  def formattedReport(counts: DataFrame): DataFrame = {
    val pctStr = when(col("pct_bp") < 1, lit("<0.01"))
      .otherwise(format_number(col("pct_bp") / 100.0, 2))
    val withTotals = counts
      .unionByName(
        counts.groupBy("yr")
          .agg(sum(col("n")).as("n"), sum(col("pct_bp")).as("pct_bp"))
          .withColumn("gap_lab", lit("Total"))
          .select("gap_lab", "yr", "n", "pct_bp"))
    withTotals
      .withColumn("cell", concat(col("n").cast("string"),
        lit(" ("), pctStr, lit("%)")))
      .groupBy("gap_lab")
      .pivot("yr")
      .agg(first(col("cell")))
      .na.fill("0")
  }
}
