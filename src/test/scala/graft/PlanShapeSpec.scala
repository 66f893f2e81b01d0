package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** 100 TB-lens plan assertions for the round-5 operators: the quality
  * gate must be a pure map stage, decontamination must broadcast the
  * benchmark gram set, SemDeDup must never broadcast the corpus side. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(df: DataFrame): String = {
    df.collect() // force AQE's final plan
    df.queryExecution.executedPlan.toString
  }

  /** Count Exchange nodes in the AQE-final plan (one shared definition —
    * the zero-exchange assertions must all count the same way). */
  private def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case e: Exchange => 1 + e.children.map(exchanges).sum
      case other => other.children.map(exchanges).sum
    }

  private def docs(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"the quick doc number $i of many more words here"))
      .toDF("doc_id", "text")

  test("text_quality_gate shape: zero exchanges (pure projection pass)") {
    val gate = Registry.queries("text_quality_gate")
    // plan over a local frame written to parquet, matching the real input
    val dir = java.nio.file.Files.createTempDirectory("graft_ps").toString
    docs(200).withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val df = gate(spark, dir)
    df.collect()
    assert(exchanges(df.queryExecution.executedPlan) === 0,
      s"quality gate must not shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("sampleByWeight shape: zero exchanges (one codegen'd filter)") {
    import graft.operators.Mixture
    val df = Mixture.sampleByWeight(
      docs(200).withColumn("w",
        (org.apache.spark.sql.functions.col("doc_id") % 5) / 4.0),
      "doc_id", "w")
    df.collect()
    assert(exchanges(df.queryExecution.executedPlan) === 0,
      s"sampleByWeight must not shuffle:\n${df.queryExecution.executedPlan}")
  }

  test("sampleByTemperature shape: fraction table broadcasts back — the " +
      "corpus is never shuffled for the sample join") {
    import graft.operators.Mixture
    val src = docs(300).withColumn("source",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("s"),
        (org.apache.spark.sql.functions.col("doc_id") % 4).cast("string")))
    val df = Mixture.sampleByTemperature(src, "doc_id", "source",
      org.apache.spark.sql.functions.lit(10L), alpha = 0.5,
      budgetTokens = 1000L)
    val plan = finalPlan(df)
    // the per-source totals agg shuffles (source-count-sized); the sample
    // join itself must be a broadcast of the fraction table, never a
    // corpus-side sort-merge
    assert(plan.contains("BroadcastHashJoin"),
      s"fraction table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle into a sort-merge join:\n$plan")
  }

  test("text_decontaminate shape: benchmark gram set is broadcast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ps2").toString
    docs(300).withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val df = Registry.queries("text_decontaminate")(spark, dir)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval gram set must broadcast, not shuffle the corpus:\n$plan")
  }

  test("bm25 topK shape: TakeOrderedAndProject, never a full global sort") {
    val df = graft.operators.Bm25.topK(docs(300), "text", "doc_id",
      Seq("quick", "words"), k = 10)
    val plan = finalPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must push the limit into TakeOrderedAndProject:\n$plan")
    // the only acceptable Sort would be inside SMJ joins, not a global one;
    // with broadcast-sized sides there must be none at all
    assert(!plan.contains("Sort ["),
      s"no sort operator expected anywhere in the top-k plan:\n$plan")
  }

  test("repeatedSpans shape: windows partitioned by doc id, no global window") {
    val df = graft.operators.RepeatedSpans.repeatedSpans(docs(200), "text",
      "doc_id", windowTokens = 4, minDf = 2)
    val plan = finalPlan(df)
    // every Window operator must carry a partition spec on doc_id — an
    // empty partitionBy would serialize the corpus through one task
    val windowLines = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty)
    windowLines.foreach(l =>
      assert(l.contains("doc_id"),
        s"window must partition by the doc id:\n$l\n$plan"))
  }

  test("url curation shape: normalize is exchange-free, blocklist broadcasts, " +
      "cap windows partition by domain") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val urls = (1 to 300).map(i =>
      (i.toLong, s"https://www.site${i % 7}.com/p/$i?utm_source=x#f"))
      .toDF("doc_id", "url")
    // normalization: pure projection, zero exchanges
    val norm = urls.select(col("doc_id"),
      graft.operators.UrlCuration.normalizeUrl(col("url")).as("u"))
    norm.collect()
    assert(exchanges(norm.queryExecution.executedPlan) === 0,
      s"normalizeUrl must not shuffle:\n${norm.queryExecution.executedPlan}")
    // blocklist: broadcast anti-join, never a shuffled corpus join
    val doms = urls.select(col("doc_id"),
      concat(lit("site"), (col("doc_id") % 7).cast("string"), lit(".com")).as("domain"))
    val bl = Seq("site3.com").toDF("domain")
    val kept = graft.operators.UrlCuration.filterBlocklist(doms, "domain", bl)
    val kPlan = finalPlan(kept)
    assert(kPlan.contains("BroadcastHashJoin") || kPlan.contains("BroadcastExchange"),
      s"blocklist must broadcast:\n$kPlan")
    // cap: every window partitions by domain (no global window)
    val capped = graft.operators.UrlCuration.capPerDomain(doms, "domain", "doc_id", 3)
    val cPlan = finalPlan(capped)
    val windowLines = cPlan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty)
    windowLines.foreach(l => assert(l.contains("domain"),
      s"cap window must partition by domain:\n$l\n$cPlan"))
    // skew stage: ~43 docs per domain > skewFactor*cap = 30, so every
    // domain is hot here — the hot-domain list must join as a BROADCAST
    // (it is domains-count-sized, never a shuffled corpus join), and the
    // pre-cut window must partition by (domain, salt), visible as __salt
    // in exactly the stage-1 window
    assert(cPlan.contains("BroadcastHashJoin") || cPlan.contains("BroadcastExchange"),
      s"hot-domain list must broadcast:\n$cPlan")
    assert(windowLines.exists(_.contains("__salt")),
      s"expected a (domain, __salt)-partitioned pre-cut window:\n$cPlan")
  }

  test("dsir resampleTopK shape: k-bounded TakeOrderedAndProject, no global sort") {
    val raw = docs(200).union(
      Seq((900L, "the ship sailed the harbor and the tide rose at dawn"))
        .toDF("doc_id", "text"))
    val target = Seq((1000L, "the ship sailed the harbor while the tide turned"))
      .toDF("doc_id", "text")
    val df = graft.operators.Dsir.resampleTopK(raw, target, "text", "doc_id", k = 5)
    val plan = finalPlan(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"the k-cut must collapse to TakeOrderedAndProject, not a global sort:\n$plan")
  }

  test("semanticOverlap shape: one projection — no join, no exchange at all") {
    val train = (1 to 200).map(i =>
      (i.toLong, Seq.fill(8)(i.toFloat / 100))).toDF("vec_id", "embedding")
    val eval = (1 to 3).map(i =>
      (1000L + i, Seq.fill(8)(i.toFloat))).toDF("vec_id", "embedding")
    val df = graft.operators.Decontaminate.semanticOverlap(
      train, eval, "embedding", "vec_id", 0.9)
    val plan = finalPlan(df)
    // round 8: the eval set rides as ONE array-of-arrays literal folded
    // per row — the r7 crossJoin+groupBy fan-out (and its regroup
    // exchange) is gone entirely
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"semanticOverlap must not join at all:\n$plan")
    assert(!plan.contains("Exchange"),
      s"semanticOverlap must be a zero-shuffle projection:\n$plan")
  }

  test("perplexityBuckets shape: tercile boundaries broadcast, no per-group window") {
    val d = docs(150).withColumn("source",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("s"), ($"doc_id" % 3).cast("string")))
    val model = graft.operators.NgramLm.train(d, "text")
    val df = graft.operators.NgramLm.perplexityBuckets(
      d, "text", "doc_id", "source", model)
    df.collect()
    // the BOUNDS join specifically must be the broadcast one — a
    // BroadcastExchange elsewhere (e.g. the tiny model-table joins
    // inside scoreNll) must not satisfy this assert. __b1 only exists
    // on the boundary table, so find a broadcast hash join carrying it.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def boundsBroadcast(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => boundsBroadcast(a.executedPlan)
      case s: QueryStageExec => boundsBroadcast(s.plan)
      case j: BroadcastHashJoinExec
          if j.output.exists(_.name == "__b1") => true
      case other => other.children.exists(boundsBroadcast) ||
        other.subqueries.exists(boundsBroadcast)
    }
    assert(boundsBroadcast(df.queryExecution.executedPlan),
      "the boundary table must join as a broadcast:\n" +
        df.queryExecution.executedPlan.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window ["),
      s"bucket assignment must be a map-side compare, not a per-group window:\n$plan")
  }

  test("ngramOverlap shape: corpus grams semi-join the broadcast eval set " +
      "BEFORE any exchange (only hits shuffle)") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val train = docs(300)
    val eval = docs(3).withColumn("doc_id", $"doc_id" + 1000)
    val df = graft.operators.Decontaminate.ngramOverlap(
      train, eval, "text", "doc_id")
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case other => other.children.flatMap(flatten)
    })
    val all = flatten(df.queryExecution.executedPlan)
    val semis = all.collect {
      case b: BroadcastHashJoinExec if b.joinType == LeftSemi => b
    }
    assert(semis.nonEmpty,
      "hit isolation must be a broadcast LEFT SEMI join:\n" +
        df.queryExecution.executedPlan.toString)
    // the corpus (streamed) side of the semi join is scan+generate only —
    // the whole-corpus gram table must never shuffle; only hit grams may
    // reach the per-doc aggregate's exchange above the join
    semis.foreach { j =>
      val shuffles = flatten(j.left).count(_.isInstanceOf[ShuffleExchangeLike])
      assert(shuffles === 0,
        "corpus gram table shuffled before the eval semi join:\n" + j.toString)
    }
  }

  test("semDedup shape: no broadcast of the corpus side, no cartesian") {
    val vecs = (1 to 200).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val df = graft.operators.Similarity.semDedup(vecs, "embedding", "vec_id",
      minCosine = 0.99, signBits = 3)
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semDedup must stay an equi-join pipeline:\n$plan")
  }
}
