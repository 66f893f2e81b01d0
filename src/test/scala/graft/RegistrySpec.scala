package graft

import graft.model.Schemas
import graft.pipelines.TemplateSubmitters
import graft.sources.StringCsv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene + pipeline property tests. */
class RegistrySpec extends AnyFunSuite {

  test("registry names are unique (Map would silently shadow duplicates)") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(names.size >= 80)
  }

  test("every oracle belongs to a declared query") {
    val qs = Registry.queries.keySet
    assert(Registry.oracleSql.keySet.subsetOf(qs))
  }
}

/** Property-style: the template pipeline's disposition is total and
  * row-preserving on randomized (seeded) input. */
class TemplatePropertySpec extends SparkSpec {
  import spark.implicits._

  test("disposition is total, disjoint, and row-preserving on random input") {
    val rnd = new scala.util.Random(99)
    def maybe(s: => String): String = if (rnd.nextDouble() < 0.15) null else s
    val rows = (1 to 400).map { i =>
      (maybe(s"ACC$i"), maybe(s"USA/WA-R$i/2021"),
        rnd.nextInt(4) match {
          case 0 => "3/15/2021"
          case 1 => "2021-03-16"
          case 2 => "44256"            // Excel serial
          case _ => "not-a-date"
        },
        "LabR",
        if (rnd.nextBoolean()) "OTHER" else "BOGUS_REASON",
        if (rnd.nextBoolean()) "COMPLETE" else "WEIRD_STATUS",
        maybe("B.1"), maybe(s"F$i"), maybe(s"L$i"), null: String,
        maybe("1/1/1990"), null: String)
    }
    val df = rows.toDF(Schemas.templateColumns: _*)
      .withColumn("_provenance", lit("random-fixture"))
    // WDRS snapshot matches roughly half the non-null accessions
    val entire = (1 to 400).filter(_ % 2 == 0)
      .map(i => (i.toLong + 1000, s"ACC$i", "2021-03-15"))
      .toDF("CASE_ID", "FILLER__ORDER__NUM", "SPECIMEN__COLLECTION__DTTM")
      .select(col("CASE_ID"), col("FILLER__ORDER__NUM"),
        col("SPECIMEN__COLLECTION__DTTM").cast("timestamp"))

    val routed = TemplateSubmitters.run(df, entire).cache()
    assert(routed.count() === 400)                            // row-preserving
    assert(routed.filter(col("disposition").isNull).count() === 0)  // total
    val byDisp = routed.groupBy("disposition").count()
      .as[(String, Long)].collect().toMap
    assert(byDisp.values.sum === 400L)                        // disjoint
    assert(byDisp.keySet.subsetOf(
      Set("roster", "for_review", "fuzzy", "keep_na")))
    // matched rows never land in keep_na/fuzzy
    assert(routed.filter(col("CASE_ID").isNotNull &&
      col("disposition").isin("keep_na", "fuzzy")).count() === 0)
    routed.unpersist()
  }
}
