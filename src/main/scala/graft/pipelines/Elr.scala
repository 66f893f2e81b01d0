package graft.pipelines

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The ELR (electronic lab reporting) run (SURVEY §2/§3, docs/notebooks/
 * elr.Rmd): new-record detection by anti-join against the already-rostered
 * set AND the processed-record list (J6), per-submitter accession
 * synthesis from free text (F7), lineage extraction with vocabulary
 * validation (F9), the Helix preferred-row collation dedup (O2), and the
 * sentinel-scan gate (Q5).
 */
object Elr {

  /** J6: keep rows whose (accession, collection date) is in neither the
    * rostered set nor the processed list (elr.Rmd:296-310,531-546). */
  def newRecords(elr: DataFrame, rostered: DataFrame,
      processed: DataFrame): DataFrame =
    elr
      .join(rostered.select(col("accession"), col("collection_date")),
        Seq("accession", "collection_date"), "left_anti")
      .join(processed.select(col("accession")), Seq("accession"), "left_anti")

  /** F7 flavor: per-submitter accession synthesis. Aegis embeds the id in
    * a suffixed form, Helix gets a CDC-STM prefix (elr.Rmd:189-283) —
    * data-driven via when-chain on the submitter column.
    *
    * The Aegis prefix SWITCHES ON COLLECTION DATE (elr.Rmd:197-211):
    * specimens collected before 2022-05-01 carry "USA/WA-CDC-ASC<id>",
    * later ones "USA/WA-ASC-<id>" — both forms require a non-null id and
    * collection date (no date, no accession: the year suffix would lie). */
  def synthesizeAccession(df: DataFrame): DataFrame = {
    val aegisId = regexp_extract(col("raw_id"), "ASC(\\d+)", 1)
    val aegisOk = col("submitter") === "aegis" &&
      col("raw_id").isNotNull && col("collection_date").isNotNull
    df.withColumn("gisaid_id",
      when(aegisOk && col("collection_date") < lit("2022-05-01").cast("date"),
        concat(lit("USA/WA-CDC-ASC"), aegisId,
          lit("/"), year(col("collection_date"))))
        .when(aegisOk,
          concat(lit("USA/WA-ASC-"), aegisId,
            lit("/"), year(col("collection_date"))))
        .when(col("submitter") === "helix",
          concat(lit("USA/WA-CDC-STM-"), col("raw_id"), lit("/"),
            year(col("collection_date"))))
        .when(col("submitter") === "aegis", lit(null).cast("string"))
        .otherwise(stripGisaidPrefix(col("raw_id"))))
  }

  /** F9: lineage from free-text result via lookarounds, validated against
    * the controlled lineage list (elr.Rmd:407-443). */
  def extractLineage(df: DataFrame, lineages: DataFrame): DataFrame =
    extractLineageResolved(df,
      lineages.select(col("lineage"), col("lineage").as("canonical")))

  /** F9 with WITHDRAWN-ALIAS RESOLUTION: same extraction, but validated
    * against a (lineage, canonical) vocabulary ([[Lineages.vocabulary]])
    * — a record annotated with a withdrawn name resolves to its active
    * replacement instead of nulling out against the flat list. */
  def extractLineageResolved(df: DataFrame, vocab: DataFrame): DataFrame = {
    val lin = broadcast(vocab.select(
      col("lineage").as("__lin"), col("canonical").as("__canon")))
    df
      // regexp_extract yields "" (not null) on no-match — nullif EACH arm
      // before coalesce or the fallback never fires
      .withColumn("__extracted", coalesce(
        nullif(regexp_extract(col("test_result"), "(?<=SARS-CoV-2 ).*(?= lineage)", 0), lit("")),
        nullif(regexp_extract(col("test_result"), "(?<=Other; ).*", 0), lit(""))))
      .join(lin, col("__extracted") === col("__lin"), "left")
      .withColumn("lineage",
        when(col("__canon").isNotNull, col("__canon"))
          .when(col("test_result").rlike("Unassigned$"), "Unassigned")
          .otherwise(lit(null).cast("string")))
      .drop("__extracted", "__lin", "__canon")
  }

  /** O2: Helix rank-then-dedup — prefer the 'Sequencing study identifier'
    * observation row, then nulls, then the rest; deterministic row_number,
    * NOT sort-then-distinct (elr.Rmd:493-520, SURVEY §7.4#2). */
  def preferredRowDedup(df: DataFrame, key: Seq[String], obs: Column,
      tieBreak: Column): DataFrame = {
    val rank = when(obs === "Sequencing study identifier", 0)
      .when(obs.isNull, 1).otherwise(2)
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key.map(col): _*).orderBy(rank, tieBreak)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Q5: divert rows carrying the QA sentinel anywhere (elr.Rmd:558-584). */
  def sentinelSplit(df: DataFrame, cols: Seq[Column]): (DataFrame, DataFrame) = {
    val hit = graft.qa.QaRules.sentinelHit(cols, "QA CHECK FAIL")
    (df.filter(!hit), df.filter(hit))
  }
}
