package graft.pipelines

import graft.functions.TextFunctions._
import graft.operators.{Decontaminate, Dedup, LineDedup, Mixture}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The composed end-to-end corpus-curation run — the job a training-data
 * team actually schedules, chaining the individually-oracled stages:
 *
 *   quality gate → repeated-chunk (boilerplate) removal → minhash
 *   near-dup survivors → benchmark decontamination → mixture sampling
 *
 * and emitting the per-stage attrition report (docs and tokens remaining
 * after each stage) that a curation review reads before training starts.
 *
 * Scale shape (100 TB lens): each stage is one of the already-audited
 * operators (their shuffle structure is unchanged by composition); each
 * stage output is materialized once (scoped eager checkpoint) and RELEASED as
 * soon as its successor materializes and its two attrition longs are
 * collected — peak block storage is ~two live stages, not the whole
 * chain. Only the final corpus stays materialized (GC-tracked
 * checkpoint) because it outlives the call. The report is six collected
 * (docs, tokens) pairs — driver-side cost is six rows.
 */
object Curation {

  /**
   * Eager checkpoint with a DETERMINISTIC release handle: the
   * checkpoint's raw row blocks are far cheaper to write and read than a
   * columnar `persist` cache (measured +45% on the whole chain when the
   * released stages used persist), but localCheckpoint offers no public
   * unpersist — its blocks free only when the RDD object is GC'd. The
   * checkpointed Dataset's logical plan IS the `LogicalRDD` wrapping the
   * exact RDD that localCheckpoint registered, so capture that RDD
   * directly and hand back an explicit release. (An earlier version
   * diffed `sc.getPersistentRDDs` around the call, which silently
   * cross-attributes any registration a CONCURRENT job interleaves —
   * `run` launches stage-stats Futures on the shared context, and bench
   * harnesses share one session across runs.) After release the frame is
   * gone for good (truncated lineage, no recompute) — callers release
   * only after the last consumer materialized.
   */
  private[graft] def scopedCheckpoint(df: DataFrame): (DataFrame, () => Unit) = {
    val cp = df.localCheckpoint(true)
    val rdd = cp.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case other => throw new IllegalStateException(
        s"localCheckpoint produced ${other.getClass.getName}, not LogicalRDD — " +
          "cannot capture the checkpoint RDD for scoped release")
    }
    (cp, () => rdd.unpersist(false))
  }

  /**
   * Await a concurrent stage-stats Future with a finite, stage-named
   * deadline: a wedged stats job must fail loudly with the stage it
   * belongs to, not hang the whole pipeline silently. The aggregate
   * REDUCES to two longs but SCANS the full stage output (count +
   * tokenize-sum over the checkpoint blocks), so the deadline must scale
   * with the corpus — [[run]] threads `cfg.statsTimeout` through; the
   * 10-minute default here fits bench/test scales only.
   */
  private[graft] def awaitStage[T](stage: String,
      f: scala.concurrent.Future[T],
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(10, "min")): T =
    try scala.concurrent.Await.result(f, timeout)
    catch {
      case e: java.util.concurrent.TimeoutException =>
        throw new IllegalStateException(
          s"curation stage-stats aggregate for '$stage' did not complete " +
            s"within $timeout", e)
    }

  /** Stage parameters; defaults match the individually-oracled registry
    * queries (gate rules, 10-token chunks, minhash 5/16/4 at 0.5,
    * 5-gram decontamination). `statsTimeout` bounds each concurrent
    * stage-stats aggregate — the stats are full-stage tokenize scans, so
    * size it to the corpus: the 10-minute default fits the bench/test
    * scales; a 100 TB run should pass hours, not rely on the default. */
  case class CurationConfig(
      chunkTokens: Int = 10, chunkMaxDf: Int = 1,
      shingleK: Int = 5, numHashes: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.5,
      decontamN: Int = 5, budgetTokens: Long = 20000L,
      statsTimeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(10, "min"))

  private val langs = Seq("en", "es", "de", "fr")

  /**
   * Append a `disposition` column: the FIRST failing rule in precedence
   * order — too_short (<10 tokens; NULL text is an empty doc and lands
   * here explicitly, so both engines agree before any null-arm
   * three-valued logic can diverge), non_english (stopword-argmax lang
   * id), low_alpha (<0.6 alphabetic), repetitive (bigram repetition
   * >0.5), pii (the scrub pass would change the text) — else "keep".
   * All signals come from MATERIALIZED attribute columns, so the gate
   * stays one projection pass (zero shuffles); the `text_quality_gate`
   * registry query and the streaming ingest share this exact
   * implementation.
   *
   * CONSUMER TRAP: do not `.filter` directly on the returned column.
   * Predicate pushdown inlines the whole when-chain into a Filter node,
   * and Filter evaluation — unlike projection — has no common-
   * subexpression elimination (the HOF signals also keep it out of
   * codegen), so `tokens(text)` re-evaluates per ARM per row: measured
   * 80x slower at sf0.1 (12s vs 0.14s). Materialize first (persist /
   * localCheckpoint, as [[run]] and the streaming ingest do) and filter
   * the materialized attribute.
   */
  def withDisposition(docs: DataFrame, textCol: String,
      outCol: String = "disposition"): DataFrame = {
    val t = col(textCol)
    val scored = docs
      .withColumn("__toks", tokens(t))
      .withColumn("__grams", wordNgramsFromTokens(col("__toks"), 2))
      .withColumns(
        langs.map(l => s"__s_$l" -> langScoreFromTokens(col("__toks"), l)).toMap)
    scored
      .withColumn(outCol,
        when(t.isNull || size(col("__toks")) < 10, "too_short")
          .when(langIdFromScores(langs.map(l => l -> col(s"__s_$l"))) =!= "en",
            "non_english")
          .when(alphaRatio(t) < 0.6, "low_alpha")
          .when(when(size(col("__grams")) > 0,
              lit(1.0) - size(array_distinct(col("__grams"))).cast("double") /
                size(col("__grams"))).otherwise(lit(0.0)) > 0.5, "repetitive")
          .when(scrubPii(t) =!= t, "pii")
          .otherwise("keep"))
      .drop(("__toks" +: "__grams" +: langs.map(l => s"__s_$l")): _*)
  }

  /** A finished curation run: the training-ready corpus (idCol,
    * sourceCol, textCol with CLEANED text) and the per-stage attrition
    * report (stage, stage_order, n_docs, n_tokens). */
  case class CurationResult(corpus: DataFrame, report: DataFrame)

  /** Report-only convenience over [[run]]. */
  def attritionReport(train: DataFrame, evalDocs: DataFrame,
      weights: DataFrame, textCol: String, idCol: String, sourceCol: String,
      cfg: CurationConfig = CurationConfig(),
      onStage: (String, Double) => Unit = (_, _) => ()): DataFrame =
    run(train, evalDocs, weights, textCol, idCol, sourceCol, cfg, onStage).report

  /**
   * Run the full curation chain. The returned corpus is the mixture
   * stage's survivors carrying the post-cleaning text; the report has
   * one row per stage, tokens counted on that stage's surviving text.
   *
   * @param train   corpus to curate (idCol, sourceCol, textCol)
   * @param evalDocs benchmark/eval set for decontamination
   * @param weights (sourceCol, "weight") mixture ratios
   * @param onStage per-stage wall-time hook (stage name, seconds) —
   *                fired as each stage's eager checkpoint materializes,
   *                so the boundaries are honest compute times. Default
   *                no-op; ScaleSmoke passes a printer.
   */
  def run(train: DataFrame, evalDocs: DataFrame,
      weights: DataFrame, textCol: String, idCol: String, sourceCol: String,
      cfg: CurationConfig = CurationConfig(),
      onStage: (String, Double) => Unit = (_, _) => ()): CurationResult = {

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      onStage(name, (System.nanoTime() - t0) / 1e9)
      r
    }

    // Attrition stats for the three RELEASED stages are collected
    // EAGERLY, two longs each, so a predecessor's blocks can be freed
    // the moment its last consumer materializes. The original shape held
    // every stage's eager checkpoint simultaneously until the report
    // action ran — four live corpus-sized block sets at peak, freed only
    // when the JVM got around to collecting them. At 100 TB four corpus
    // copies in block storage is the difference between fitting and
    // spilling; at bench scale it was measurable GC pressure landing on
    // whatever ran near the sweep's end. The ingest row is ALSO eager,
    // computed off the gate checkpoint while it is live (the lazy form
    // re-scanned the source and re-tokenized the whole corpus at
    // report-consume time). Stages that stay alive past this call
    // (deconKeep's kept checkpoint, the lazy mixture) keep their LAZY
    // report rows — those aggregates run concurrently in the report
    // consumer's single job instead of as serialized driver actions.
    // ONE attrition aggregate shared by the eager and the lazy stage
    // rows — token accounting changed in one place can never diverge
    // between the two report paths
    def stageAgg(df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(tokens(col(textCol))).cast("long")), lit(0L))
          .as("n_tokens"))

    def stats(df: DataFrame): (Long, Long) = {
      val r = stageAgg(df).head()
      (r.getLong(0), r.getLong(1))
    }

    def stageRow(df: DataFrame, name: String, ord: Int): DataFrame =
      stageAgg(df)
        .select(lit(name).as("stage"), lit(ord).as("stage_order"),
          col("n_docs"), col("n_tokens"))

    def litRow(name: String, ord: Int, s: (Long, Long)): DataFrame =
      train.sparkSession.range(1)
        .select(lit(name).as("stage"), lit(ord).as("stage_order"),
          lit(s._1).as("n_docs"), lit(s._2).as("n_tokens"))

    val ingest = train.select(col(idCol), col(sourceCol), col(textCol))

    // checkpoint BEFORE the filter: filtering the lazy gate output
    // pushes the when-chain into an interpreted, CSE-less Filter that
    // re-tokenizes per arm per row (see the withDisposition scaladoc —
    // this exact reorder took the stage from ~12s to sub-second at
    // sf0.1). The checkpoint holds ingest-sized rows; the keep-filter
    // over its materialized attribute is a trivial scan.
    // Each released stage's stats job runs CONCURRENTLY with its
    // successor stage (separate driver thread → separate Spark job; the
    // small tokenize-agg interleaves with the heavy stage instead of
    // serializing ahead of it), awaited only at the release point.
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global

    val (gated, ingestStatsF, releaseGate) = timed("quality_gate") {
      val (full, rel) = scopedCheckpoint(withDisposition(ingest, textCol))
      // the gate checkpoint holds EVERY ingest row (disposition is a
      // column, the keep-filter comes after) — so the report's ingest
      // stats read those blocks concurrently instead of re-scanning the
      // source and re-tokenizing the whole corpus at report-consume time
      (full.filter(col("disposition") === "keep").drop("disposition"),
        Future(stats(full)), rel)
    }
    val gatedStatsF = Future(stats(gated))

    val (cleaned, releaseCleaned) = timed("line_dedup") {
      scopedCheckpoint(LineDedup
        .removeRepeatedChunks(gated, textCol, idCol, cfg.chunkTokens, cfg.chunkMaxDf)
        .filter(col("clean") =!= "")
        .select(col(idCol), col("clean").as(textCol))
        .join(gated.select(col(idCol), col(sourceCol)), Seq(idCol)))
    }
    // cleaned is materialized and the gate checkpoint's two stats jobs
    // are in: nothing reads the gate frame again — release it before the
    // heavy near-dup stage
    val ingestStats = awaitStage("ingest", ingestStatsF, cfg.statsTimeout)
    val gatedStats = awaitStage("quality_gate", gatedStatsF, cfg.statsTimeout)
    releaseGate()
    val cleanedStatsF = Future(stats(cleaned))

    val (survivors, releaseSurvivors) = timed("near_dup") {
      // cacheShingles: the chain's corpus is post-gate (the standalone
      // dedup_minhash measurement that favored recompute ran on the full
      // documents table) — here the cached shingle table is small and
      // the canon+shingle regex pipeline would otherwise run for all
      // three consumers; the cache is scoped inside the call
      val pairs = Dedup.minhashNearDupPairs(cleaned, textCol, idCol,
        cfg.shingleK, cfg.numHashes, cfg.bands, cfg.minJaccard,
        cacheShingles = true)
        .select("id_a", "id_b")
      scopedCheckpoint(cleaned
        .join(Dedup.connectedComponents(pairs, Some(cleaned.select(col(idCol))))
          .filter(col("id") === col("component"))
          .select(col("id").as(idCol)), Seq(idCol)))
    }
    val cleanedStats = awaitStage("line_dedup", cleanedStatsF, cfg.statsTimeout)
    releaseCleaned()
    val survivorStatsF = Future(stats(survivors))

    // deconKeep stays a GC-tracked eager checkpoint, NOT a scoped
    // persist: it is the returned corpus's materialization (publishRun
    // consumes it after run returns), so its lifetime must outlive this
    // call — the same contract as before.
    val deconKeep = timed("decontaminate") {
      // anti-join against the (rare) contaminated ids: the hit-gram semi
      // join never shuffles the corpus gram table, and no zero-filled
      // per-doc count frame is materialized just to filter on == 0
      survivors
        .join(Decontaminate
          .contaminatedIds(survivors, evalDocs, textCol, idCol, cfg.decontamN),
          Seq(idCol), "left_anti")
        .localCheckpoint(true)
    }
    val survivorStats = awaitStage("near_dup", survivorStatsF, cfg.statsTimeout)
    releaseSurvivors()

    // the mixture stage is lazy — its cost lands in the report/consumer
    // actions, so it has no honest checkpoint boundary to time here
    val sampled = Mixture.sampleByTokenBudget(
      deconKeep.withColumn("__n", size(tokens(col(textCol)))),
      idCol, sourceCol, col("__n"), weights, cfg.budgetTokens)
      .drop("__n")

    CurationResult(
      corpus = sampled,
      report = Seq(
        litRow("ingest", 1, ingestStats),
        litRow("quality_gate", 2, gatedStats),
        litRow("line_dedup", 3, cleanedStats),
        litRow("near_dup", 4, survivorStats),
        stageRow(deconKeep, "decontaminate", 5),
        stageRow(sampled, "mixture", 6)
      ).reduce(_.unionByName(_)))
  }

  /** Publish a finished run into the versioned store. Each table flip is
    * atomic but the PAIR is not, so the REPORT is the commit record: the
    * corpus publishes first, and the report — published last, carrying
    * `corpus_version` — is what marks the run complete. A crash between
    * the two leaves a corpus version no report references (dead weight
    * for vacuum, never observed by a reader that keys off the report,
    * as [[reportDrift]] does). Returns the report's version. */
  def publishRun(store: graft.sources.SnapshotStore,
      result: CurationResult, name: String = "curation"): Long = {
    val corpusVersion = store.publish(s"${name}_corpus", result.corpus)
    store.publish(s"${name}_report",
      result.report.withColumn("corpus_version", lit(corpusVersion)))
  }

  /**
   * Garbage-collect old curation runs: keep the newest `keepReports`
   * report versions, then drop every corpus version no KEPT report
   * references — including the dead weight a crash between
   * [[publishRun]]'s two publishes leaves behind (a corpus version no
   * report ever references). The corpus table's _CURRENT version is
   * never dropped even when unreferenced (a crash leaves _CURRENT on
   * the orphan; readers key off the report, and the pointer heals at
   * the next successful publishRun — deleting it would dangle the
   * pointer for any direct reader in the meantime).
   */
  def vacuumRuns(store: graft.sources.SnapshotStore,
      name: String = "curation", keepReports: Int = 2): Unit = {
    val reportTable = s"${name}_report"
    val corpusTable = s"${name}_corpus"
    // the kept set is the newest N report dirs PLUS the published one:
    // store.vacuum never drops the published version even when it is
    // older than the window (crashed report publishes can leave
    // _CURRENT behind the newest v= dirs), so its referenced corpus
    // must stay live too or the surviving report would dangle
    val keptReports =
      (store.versions(reportTable).takeRight(keepReports) ++
        store.currentVersion(reportTable)).distinct
    val live = keptReports.map(v =>
      store.readVersion(reportTable, v)
        .select(col("corpus_version")).head().getLong(0)).toSet
    store.vacuum(reportTable, keepReports)
    val currentCorpus = store.currentVersion(corpusTable)
    store.versions(corpusTable)
      .filterNot(live.contains)
      .filterNot(currentCorpus.contains)
      .foreach(v => store.dropVersion(corpusTable, v))
  }

  /**
   * Run-over-run attrition drift — the reference's weekly "Change"
   * comparison applied to the curation domain: this run's per-stage
   * report full-joined with the most recent PUBLISHED report, zero-fill,
   * per-stage deltas. The review a curation operator actually reads:
   * "why did quality_gate suddenly drop 4x more documents than last
   * run?" Stage-level rows (6 of them) — driver-scale by construction.
   */
  def reportDrift(store: graft.sources.SnapshotStore,
      current: DataFrame, name: String = "curation"): DataFrame = {
    val prev = store.readOrEmpty(s"${name}_report", current.schema)
    current.select(col("stage"), col("stage_order"),
        col("n_docs").as("docs_now"), col("n_tokens").as("tokens_now"))
      .join(prev.select(col("stage"), col("stage_order").as("__prev_ord"),
        col("n_docs").as("docs_prev"), col("n_tokens").as("tokens_prev")),
        Seq("stage"), "full_outer")
      .select(col("stage"),
        // a stage present only in the PREVIOUS run (renamed/removed since)
        // keeps its historical order instead of a bogus 0-before-ingest
        coalesce(col("stage_order"), col("__prev_ord")).as("stage_order"),
        coalesce(col("docs_now"), lit(0L)).as("docs_now"),
        coalesce(col("docs_prev"), lit(0L)).as("docs_prev"),
        (coalesce(col("docs_now"), lit(0L)) -
          coalesce(col("docs_prev"), lit(0L))).as("docs_change"),
        (coalesce(col("tokens_now"), lit(0L)) -
          coalesce(col("tokens_prev"), lit(0L))).as("tokens_change"))
  }
}
