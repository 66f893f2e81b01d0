package graft.pipelines

import graft.model.Schemas
import graft.sinks.RosterSink
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The downstream compile stage (SURVEY §3 "Downstream of all three",
 * docs/notebooks/ROSTER_COMPILE.Rmd): union all pending rosters, enrich
 * EPI_ISL from the external repo snapshot (J12), fill missing reasons by
 * lab policy, enforce the 17-column contract, and chunk for upload (S9).
 */
object RosterCompile {

  /** J12: fill SEQUENCE_EPI_ISL from a GISAID-shaped snapshot keyed by
    * accession (ROSTER_COMPILE.Rmd:229-254). Broadcast — reference data. */
  def enrichEpiIsl(roster: DataFrame, gisaid: DataFrame): DataFrame = {
    val g = gisaid.select(col("virus_name").as("__vn"),
      col("epi_isl").as("__epi"))
    roster
      .join(broadcast(g), col("SEQUENCE_ACCESSION") === col("__vn"), "left")
      .withColumn("SEQUENCE_EPI_ISL",
        coalesce(col("SEQUENCE_EPI_ISL"), col("__epi")))
      .drop("__vn", "__epi")
  }

  /** Per-lab default reason fill (ROSTER_COMPILE.Rmd; lab policy table). */
  def fillReasonByLab(roster: DataFrame, labDefaults: DataFrame): DataFrame = {
    val m = labDefaults.select(col("lab").as("__lab"),
      col("default_reason").as("__dr"))
    roster
      .join(broadcast(m), col("SEQUENCE_LAB") === col("__lab"), "left")
      .withColumn("SEQUENCE_REASON",
        coalesce(col("SEQUENCE_REASON"), col("__dr")))
      .drop("__lab", "__dr")
  }

  /** The ncol==17 + order gate (ROSTER_COMPILE.Rmd:385-390): throws if the
    * frame does not match the positional contract exactly. */
  def enforceContract(roster: DataFrame): DataFrame = {
    val cols = roster.columns.toSeq
    require(cols == Schemas.rosterColumns,
      s"roster contract violation: expected ${Schemas.rosterColumns.size} " +
        s"columns in fixed order, got ${cols.size}: $cols")
    roster
  }

  /** Compile: union pending rosters, enrich, fill, gate, chunk-id. */
  def run(pending: Seq[DataFrame], gisaid: DataFrame,
      labDefaults: DataFrame, maxRows: Int = 500): DataFrame = {
    val all = pending.reduce(_.unionByName(_))
    val enriched = fillReasonByLab(enrichEpiIsl(all, gisaid), labDefaults)
      .select(Schemas.rosterCols: _*)
    RosterSink.withChunkId(enforceContract(enriched),
      Seq("CASE_ID"), maxRows)
  }
}
