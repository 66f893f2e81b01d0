package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * S1/S2/S3 ingest (SURVEY §2.1): multi-file CSV read with every column as
 * string (never inferSchema — the reference reads `col_types =
 * cols(.default = "c")`, docs/notebooks/template_submitters.Rmd:236-238),
 * the reference's NA-token set mapped to null, and a `_provenance` column
 * from input_file_name() replacing the reference's `.id = "index"` tag.
 *
 * Scale note: one DataFrame over all files (Spark lists/splits in
 * parallel), NOT a driver-side loop of per-file reads — per-file logic
 * (validation, empty-file drop) is expressed as grouped aggregations over
 * `_provenance`.
 */
object StringCsv {

  def allStringSchema(columns: Seq[String]): StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))

  /** Read CSVs with a declared all-string schema + provenance. */
  def read(spark: SparkSession, schema: StructType, paths: Seq[String],
      naTokens: Seq[String] = graft.model.Schemas.naTokens,
      sep: String = ","): DataFrame = {
    val df = spark.read
      .schema(schema)
      .option("header", "true")
      .option("sep", sep)
      // enforceSchema: headers may differ per file; validation is explicit
      .option("enforceSchema", "true")
      .csv(paths: _*)
      .withColumn("_provenance", input_file_name())
    // NA-token normalization (beyond the empty string, which csv maps via
    // nullValue default): do it column-wise so it codegen-folds.
    val naSet = naTokens.filter(_.nonEmpty)
    schema.fieldNames.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c).isin(naSet: _*), lit(null)).otherwise(col(c))))
  }

  /**
   * P2 empty-row removal: drop rows with fewer than `minNonNull` non-null
   * cells (docs/notebooks/template_submitters.Rmd:249-276).
   */
  def dropEmptyRows(df: DataFrame, dataCols: Seq[String], minNonNull: Int = 2): DataFrame =
    df.filter(size(filter(array(dataCols.map(col): _*), c => c.isNotNull)) >= minNonNull)

  /**
   * Q3-style file-level header validation, distributed: per provenance
   * file, check the first row of actual values is parseable / the file is
   * non-empty, and return (file, n_rows). Header mismatch with a declared
   * schema surfaces as all-null columns; flag files where every declared
   * column is entirely null.
   */
  def fileStats(df: DataFrame, dataCols: Seq[String]): DataFrame =
    df.groupBy(col("_provenance"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(size(filter(array(dataCols.map(col): _*), c => c.isNotNull)))
          .as("max_non_null_cells"))
      .withColumn("valid", col("n_rows") > 0 && col("max_non_null_cells") > 0)
}
