package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted join for skewed keys (SURVEY §4: "skew risk: common birth years —
 * mitigate with AQE skew-join or salting"). AQE's skew-join split handles
 * sort-merge cases at runtime; explicit salting is the structural fallback
 * when one key dominates so heavily that even split partitions bottleneck
 * (e.g. a birth-year block holding 5% of 100 TB).
 *
 * Left (large, skewed) rows get a deterministic salt in [0, salts);
 * right (smaller) rows are replicated once per salt value. The join key
 * becomes (key, salt) — the hot key's rows spread over `salts` reducers.
 */
object SkewJoin {

  /**
   * Inner equi-join `left.key == right.key` with the left side salted and
   * the right side exploded across salts. Deterministic: salt is a hash of
   * the left row's `saltBy` columns, not rand() (reproducible runs, SURVEY
   * §7.4#5).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, saltBy: Seq[Column]): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(saltBy: _*), lit(salts)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(explodedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
