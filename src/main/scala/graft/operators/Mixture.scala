package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic data-mixture sampling — the training-data assembly step
 * that downsamples each source to hit a target token budget at given
 * mixture weights (the Pile/Dolma "source weights" shape). Each source
 * gets keep fraction min(1, budget·w_s / tokens_s); membership is
 * decided by a multiplicative hash of the document id, so the sample is
 * reproducible run-to-run, independent of partitioning, and replayable
 * by any engine with 64-bit integer arithmetic (no RNG state).
 *
 * Scale shape (100 TB lens): one aggregation shuffle keyed by source
 * computes per-source token totals; the (source, fraction) table is
 * source-count-sized and BROADCASTS back; the sample itself is a
 * map-side filter — no second corpus shuffle, no driver-side rows
 * beyond the source-level table.
 */
object Mixture {

  /** The hash modulus, 2^31 - 1 (a Mersenne prime): large enough that
    * ids only share a draw past ~2.1e9 docs per residue class, and small
    * enough that ((id mod m)·C) stays below m·C ≈ 5.7e18 < Long.MaxValue
    * in any 64-bit engine. */
  val HashMod: Long = 2147483647L

  /** Deterministic hash of an id to [0, 1): (id * 2654435761) mod
    * (2^31 - 1) scaled — Knuth's multiplicative constant, integer-exact
    * in any engine. Not cryptographic; collision-free enough for
    * sampling. Requires a numeric (long-castable) non-null id — a silent
    * NULL here would drop the row from every sample, so it raises
    * instead. */
  /** The guarded integer hash behind [[idHashUnit]] (and
    * [[Dsir.gumbelNoise]]): value in [0, 2^31-1), raises on null /
    * non-numeric ids — a silent NULL would drop the row from every
    * sample. (id·C) mod m is computed as ((id mod m)·C) mod m so the
    * product stays below m·C ≈ 5.7e18 and ids up to Long.MaxValue can't
    * overflow (a raw id·C overflows — ANSI would raise — once ids pass
    * ~3.5e9, i.e. exactly the 100 TB corpus id range). */
  private[operators] def guardedIdHash(id: Column,
      mult: Long = KnuthMult): Column = {
    val m = mult % HashMod
    require(m != 0, s"Mixture.guardedIdHash: multiplier $mult ≡ 0 mod $HashMod")
    val asLong = when(id.isNull || id.try_cast("long").isNull,
        raise_error(concat(lit("Mixture.idHashUnit: id is null or not "
          + "castable to long: "), coalesce(id.cast("string"), lit("NULL")))))
      .otherwise(id.try_cast("long"))
    pmod(pmod(asLong, lit(HashMod)) * lit(m), lit(HashMod))
  }

  /** The default draw multiplier (Knuth). */
  val KnuthMult: Long = 2654435761L

  /**
   * Why a `mult` FAMILY: every operator drawing from the SAME id hash
   * makes perfectly CORRELATED decisions — compose soft dedup (keeps ids
   * with hash < 1/n) with a same-hash downstream sampler and every
   * dedup survivor, whose hash is biased low by construction, would win
   * every subsequent `hash < f` draw with probability ~min(1, f·n)
   * instead of f (e.g. land in the train split with probability 1, so
   * val/test could never contain a dedup survivor). Since the modulus is
   * prime, any nonzero multiplier gives a bijective draw, and two
   * INDEPENDENT multipliers decorrelate selections (an ADDITIVE salt
   * does not — x·(C)+s is a constant shift, mapping the survivor set to
   * one contiguous hash interval; a multiplier DERIVED from C, C+Δ,
   * fails too: the hashes differ by x·Δ, small for small ids — both
   * verified empirically before landing the constants). Composable
   * operators each use a distinct documented multiplier
   * ([[graft.operators.Dedup.SoftDedupMult]], [[EpochMult]],
   * [[SplitMult]] for the split family); the keep-SAMPLERS
   * (weight/temperature/token-budget) share the Knuth default — two
   * keep-samplers chained on the same corpus draw correlated, which is
   * visible in their contract (don't chain them; compose a sampler with
   * the re-multiplied dedup/epoch/split ops instead).
   */
  def idHashUnit(id: Column, mult: Long = KnuthMult): Column =
    guardedIdHash(id, mult).cast("double") / lit(HashMod.toDouble)

  /**
   * Leakage-safe deterministic train/val/test split: assign each document
   * to the first split whose cumulative fraction bound exceeds the
   * document's id hash — `fractions` like ("train" -> 0.98, "val" ->
   * 0.01, "test" -> 0.01). Membership depends ONLY on the id (the same
   * doc lands in the same split across runs, repartitions, engines and
   * incremental appends — the property that keeps eval sets from bleeding
   * into training as the corpus grows), and the assignment is one
   * codegen'd projection: zero shuffles at any scale. Fractions must sum
   * to ~1 (fail-fast otherwise); the hash is [[idHashUnit]], so splits
   * are exact in expectation and engine-replayable.
   *
   * VERSION BOUNDARY: the stability guarantee is per-version of the
   * split hash. Round 10 moved the draw from the shared sampler
   * multiplier ([[KnuthMult]]) to the split family's own [[SplitMult]]
   * (sampler→split decorrelation — see [[idHashUnit]]'s family note),
   * which reassigned every document's split relative to builds before
   * that change. Splits computed under the old multiplier do NOT carry
   * over; regenerate them rather than incrementally appending across
   * the boundary. Within a version the guarantee is exact: same doc,
   * same split, across runs, repartitions, engines and appends.
   *
   * @return `docs` plus a `split` column
   */
  def hashSplit(docs: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    hashSplitOn(docs, col(idCol), fractions)

  /** The split family's own draw multiplier: sample-then-split is THE
    * standard composition (curate with a keep-sampler, then split for
    * training), and a split drawing from the samplers' Knuth hash would
    * inherit their selection bias — e.g. after a `hash < f` keep pass no
    * survivor could ever land past the f boundary, starving val/test.
    * xxhash's prime-2 constant — public, Knuth-independent (vetted by
    * the [[EpochMult]] relation-search + simulation procedure). */
  val SplitMult: Long = 2246822519L

  /**
   * Leakage-safe split hashed on an ARBITRARY column: the generalization
   * behind [[hashSplit]] (id-hashed) and [[splitByComponent]]
   * (duplicate-cluster-hashed). Everything sharing a `hashOf` value lands
   * in the same split. Same zero-shuffle projection, same fail-fast
   * fraction validation, same engine-replayable hash.
   */
  def hashSplitOn(docs: DataFrame, hashOf: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "Mixture.hashSplitOn: fractions must be positive")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"Mixture.hashSplitOn: fractions must sum to 1, got $total")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val u = idHashUnit(hashOf, SplitMult)
    // the last split takes everything below 1.0 unconditionally, so
    // float accumulation at the top boundary can never drop a row
    val assign = fractions.init.zip(cum.init)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), bound), els) =>
        when(u < lit(bound), lit(name)).otherwise(els)
      }
    docs.withColumn("split", assign)
  }

  /**
   * Leakage-safe split where near-duplicate clusters travel TOGETHER:
   * split assignment hashes the duplicate-component representative (the
   * min-id label from [[Dedup.connectedComponents]] over any near-dup
   * pair graph), so two near-duplicates can never land in different
   * splits — the contamination channel a plain id-hash split leaves open
   * (a train doc's near-copy in test is leakage the exact-id split
   * can't see; Lee et al. 2022 "Deduplicating Training Data Makes
   * Language Models Better" measures exactly this train/test overlap).
   * Docs with no component row (never edge-adjacent) split on their own
   * id — bit-identical to [[hashSplit]] for a corpus with no duplicates.
   *
   * Scale shape: one co-partitioned equi-join on the id against the
   * already-computed CC label frame (both sides shuffle on the same key
   * once), then the zero-shuffle split projection. No new global state:
   * the component frame is the dedup pipeline's existing artifact.
   *
   * @param components (id, component) rows — [[Dedup.connectedComponents]]
   *                   output; ids absent from it split on their own id.
   * @return `docs` plus `split`
   */
  def splitByComponent(docs: DataFrame, idCol: String, components: DataFrame,
      fractions: Seq[(String, Double)]): DataFrame = {
    val c = components.select(col("id").as("__cid"), col("component").as("__comp"))
    hashSplitOn(
      docs.join(c, docs(idCol) === col("__cid"), "left").drop("__cid"),
      coalesce(col("__comp"), col(idCol)), fractions)
      .drop("__comp")
  }

  /**
   * Score-proportional soft sampling (the FineWeb-Edu shape: keep a
   * document with probability equal to its quality weight, rather than a
   * hard threshold): keep iff idHashUnit(id) < weight, weight clamped to
   * [0, 1]. Deterministic, partitioning-independent, engine-replayable;
   * a null or negative weight raises (a silent NULL would drop the row
   * from every sample with no audit trail). Zero shuffles — one
   * codegen'd filter at any scale.
   */
  def sampleByWeight(docs: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val w = col(weightCol).try_cast("double")
    // isnan is part of the guard: NaN < 0 is false under Spark's NaN
    // ordering and least(1.0, NaN) = 1.0 (NaN sorts largest), so an
    // unguarded NaN weight would silently keep every row instead of
    // raising — the opposite of the fail-fast contract.
    docs.filter(
      when(col(weightCol).isNull || w.isNull || isnan(w) || w < 0,
        raise_error(concat(
          lit(s"Mixture.sampleByWeight: weight '$weightCol' is null, "
            + "non-numeric, NaN or negative: "),
          coalesce(col(weightCol).cast("string"), lit("NULL")))))
        .otherwise(idHashUnit(col(idCol)) < least(lit(1.0), w)))
  }

  /**
   * Temperature-scaled mixture sampling (the multilingual "alpha
   * sampling" of mT5 / UniMax): instead of caller-supplied weights, each
   * source's weight is derived from the data as w_s ∝ (token count)^α,
   * normalized. α = 1 recovers proportional sampling; α < 1 flattens the
   * natural distribution (upsampling small sources relative to
   * proportional — the standard fix for head-language dominance); α = 0
   * gives every source equal token share. Keep fraction per source is
   * min(1, budget·w_s / tokens_s); membership is the [[idHashUnit]] hash.
   *
   * Cross-engine determinism: `pow` is the one non-correctly-rounded
   * IEEE operation in the chain, so the keep fraction is rounded to 9
   * decimals before the comparison — an engine replaying the formula
   * with a last-ulp-different pow lands on the same rounded fraction.
   * The rounding moves each fraction by < 5e-10, invisible next to the
   * 1/2³¹ hash grid.
   *
   * Scale shape mirrors [[sampleByTokenBudget]]: one aggregation shuffle
   * keyed by source; the source-count-sized fraction table broadcasts
   * back; the sample is a map-side filter.
   *
   * @return the kept subset of `docs` (original columns)
   */
  def sampleByTemperature(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"Mixture.sampleByTemperature: alpha must be in [0, 1], got $alpha")
    val totals = docs
      .select(col(sourceCol), tokenCount.as("__n"))
      .groupBy(sourceCol).agg(sum("__n").as("__tot"))
      // __pw is forced to 0 (not pow) for a zero-token source: with
      // alpha = 0, pow(0, 0) = 1 would hand the empty source full weight
      // in __psum and dilute every real source's keep fraction — the
      // sample would undershoot budgetTokens even though the empty
      // source itself keeps nothing.
      .select(col(sourceCol), col("__tot"),
        when(col("__tot") === 0, lit(0.0))
          .otherwise(pow(col("__tot").cast("double"), lit(alpha)))
          .as("__pw"))
    val fractions = totals
      .crossJoin(broadcast(totals.agg(sum("__pw").as("__psum"))))
      .select(col(sourceCol),
        // a zero-token source keeps nothing (its weight is zero mass;
        // 0/0 would otherwise poison the comparison with NaN)
        when(col("__tot") === 0, lit(0.0)).otherwise(
          round(least(lit(1.0),
            lit(budgetTokens.toDouble) * (col("__pw") / col("__psum"))
              / col("__tot")), 9))
          .as("__keep_frac"))
    // Left join + raise, mirroring sampleByTokenBudget: an inner join
    // would silently drop rows whose source is NULL (null keys never
    // equi-join), and a source whose token counts are all NULL gets a
    // NULL __keep_frac (sum→NULL, pow(NULL)=NULL) that a bare `<`
    // filter would silently treat as drop-everything.
    docs
      .join(broadcast(fractions), Seq(sourceCol), "left")
      .filter(
        when(col("__keep_frac").isNull, raise_error(concat(
          lit("Mixture.sampleByTemperature: no keep fraction for source '"),
          coalesce(col(sourceCol).cast("string"), lit("NULL")),
          lit("' (null source or null token counts)"))))
        .otherwise(idHashUnit(col(idCol)) < col("__keep_frac")))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * Sample `docs` so each source contributes ~budgetTokens·w_s tokens.
   *
   * Preconditions fail FAST, not silently: a doc whose source has no
   * weights row raises (an inner join would silently drop the whole
   * source from the sample), and a null / non-numeric id raises in
   * [[idHashUnit]] (a NULL hash would silently drop every row). Both
   * checks are map-side expressions — no extra action or shuffle.
   *
   * @param weights (sourceCol, "weight") rows; weights are normalized
   *                internally so callers pass any positive ratios.
   * @return the kept subset of `docs` (original columns).
   */
  def sampleByTokenBudget(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, weights: DataFrame, budgetTokens: Long): DataFrame = {
    val totals = docs
      .select(col(sourceCol), tokenCount.as("__n"))
      .groupBy(sourceCol).agg(sum("__n").as("__tot"))
    val norm = weights
      .crossJoin(broadcast(weights.agg(sum("weight").as("__wsum"))))
      .select(col(sourceCol), (col("weight") / col("__wsum")).as("__w"))
    val fractions = totals
      .join(norm, Seq(sourceCol))
      .select(col(sourceCol),
        least(lit(1.0), lit(budgetTokens) * col("__w") / col("__tot"))
          .as("__keep_frac"))
    docs
      .join(broadcast(fractions), Seq(sourceCol), "left")
      .filter(
        when(col("__keep_frac").isNull, raise_error(concat(
          lit("Mixture.sampleByTokenBudget: no weight for source '"),
          coalesce(col(sourceCol).cast("string"), lit("NULL")), lit("'"))))
        .otherwise(idHashUnit(col(idCol)) < col("__keep_frac")))
      .select(docs.columns.map(col).toIndexedSeq: _*)
  }

  /** The epoch schedule's draw multiplier (xxhash prime 3). An earlier
    * candidate (1013904242) LOOKED independent but is ≡ 2·KnuthMult + 14
    * (mod m) — near-perfect correlation with the keep-samplers for
    * sequential ids. Every constant in the family is now vetted two
    * ways before landing: a small-coefficient linear-relation search
    * (B ≡ aA + b mod m, |a|,|b| ≤ 64) against every sibling, and a
    * 2M-sequential-id composition simulation (survivor draw rate must
    * be the nominal fraction for every ordered pair). */
  val EpochMult: Long = 3266489917L

  /**
   * Data-constrained repetition schedule (the Muennighoff et al. 2023
   * regime: when the token budget exceeds the corpus, repeating data for
   * up to ~4 epochs is nearly as good as fresh data; past that, returns
   * collapse): emit each document `n` times where n realizes
   * ratio = min(budget / corpus_tokens, maxEpochs) — every doc gets
   * floor(ratio) epochs and the fractional remainder is assigned by the
   * deterministic id hash, so emitted tokens hit ratio·corpus exactly in
   * expectation and the schedule is stable across runs, repartitions and
   * engines. budget <= corpus degenerates to uniform subsampling
   * (base 0, fractional keep); an all-zero-token corpus schedules
   * nothing rather than dividing by zero. A doc with a NULL token count
   * contributes nothing to the corpus total (SUM skips NULLs in both
   * engines) but still receives epochs — repetition is per-doc; token
   * counts only set the global ratio.
   *
   * Scale shape: ONE 1-row global aggregate broadcast back (the same
   * crossJoin-broadcast idiom as the other samplers); epoch expansion is
   * a map-side explode bounded by maxEpochs — no per-doc shuffle, and
   * output rows ≤ maxEpochs·corpus at any size.
   *
   * Cross-engine determinism: budget/total and the floor are
   * correctly-rounded IEEE; the fractional remainder rounds to 9
   * decimals before the hash compare (same convention as
   * [[sampleByTemperature]]'s pow rounding).
   *
   * The fractional-epoch draw uses its own [[EpochMult]] hash multiplier
   * so it is INDEPENDENT of upstream keep decisions (soft dedup's
   * survivors have SoftDedupMult hashes biased below 1/n; a same-hash
   * draw here would hand every survivor the extra epoch whenever frac >=
   * 1/n — systematically over-epoching exactly the duplicated content).
   * See [[idHashUnit]] for why independence needs a distinct multiplier,
   * not a salt.
   *
   * @return `docs` columns plus `epoch` (1-based), n rows per doc
   */

  def epochSchedule(docs: DataFrame, idCol: String, tokenCount: Column,
      budgetTokens: Long, maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens >= 0,
      s"Mixture.epochSchedule: budgetTokens must be >= 0, got $budgetTokens")
    require(maxEpochs >= 1,
      s"Mixture.epochSchedule: maxEpochs must be >= 1, got $maxEpochs")
    val total = docs.agg(sum(tokenCount).as("__tot"))
    val ratio = when(coalesce(col("__tot"), lit(0L)) <= 0, lit(0.0))
      .otherwise(least(
        lit(budgetTokens.toDouble) / col("__tot").cast("double"),
        lit(maxEpochs.toDouble)))
    docs.crossJoin(broadcast(total))
      .withColumn("__n",
        floor(ratio).cast("int") +
          when(idHashUnit(col(idCol), EpochMult) < round(ratio - floor(ratio), 9), 1)
            .otherwise(0))
      .filter(col("__n") >= 1)
      .select(docs.columns.map(col).toIndexedSeq
        :+ explode(sequence(lit(1), col("__n"))).as("epoch"): _*)
  }
}
