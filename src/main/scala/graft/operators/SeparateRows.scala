package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * tidyr::separate_rows for Spark (SURVEY §2.9): split several parallel
 * comma-list columns and explode them POSITIONALLY — element i of every
 * listed column lands on output row i. The reference unpacks the WDRS
 * flattened sequence columns this way before every dedup
 * (scripts/QA/QA_for_review.Rmd:144-156,
 * docs/notebooks/template_submitters.Rmd:171-201).
 *
 * Semantics mirrored from tidyr: length-1 values (including NULL) are
 * RECYCLED to the longest list in the row, so a scalar specimen flag
 * repeats beside a 3-element accession list.
 *
 * Shape: one generate (posexplode over the max length), no shuffle, no
 * UDF — the split arrays are materialized as columns first so the
 * per-position element_at doesn't re-split per element (HOF inlining
 * trap).
 */
object SeparateRows {

  def separateRows(df: DataFrame, sep: String, cols: String*): DataFrame = {
    require(cols.nonEmpty, "separateRows needs at least one column")
    val arrName = cols.map(c => c -> s"__arr_$c").toMap
    // null column value -> single-null list (tidyr keeps the row)
    val withArrs = cols.foldLeft(df)((d, c) =>
      d.withColumn(arrName(c),
        coalesce(split(col(c), sep), array(lit(null).cast("string")))))
    val maxLen = cols.map(c => size(col(arrName(c)))).reduce(greatest(_, _))
    val exploded = withArrs
      .withColumn("__pos", explode(sequence(lit(1), maxLen)))
    val replaced = cols.foldLeft(exploded)((d, c) =>
      d.withColumn(c,
        when(size(col(arrName(c))) === 1, element_at(col(arrName(c)), 1))
          .otherwise(element_at(col(arrName(c)), col("__pos")))))
    replaced.drop(cols.map(arrName): _*).drop("__pos")
  }
}
