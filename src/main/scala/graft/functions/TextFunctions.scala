package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines:
 * tokenization, language ID, quality scoring, fingerprinting, shingling,
 * MinHash and SimHash. All are compositions of codegen'd built-ins
 * (no UDFs), so they stay inside whole-stage codegen and scale linearly
 * with input partitions — no shuffle until an explicit aggregation.
 */
object TextFunctions {

  /** Lowercased whitespace tokens; empty string yields empty array. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Distinct token set (order-insensitive usage only: sizes/joins). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish subword count: split on word boundaries and count runs of up to 4
   * characters — a deterministic proxy for tokenizer budgeting (a real BPE
   * vocab is external; the ceil(len/4) per word shape matches GPT-family
   * rules of thumb).
   */
  def subwordCount(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))

  // ------------------------------------------------------------ language ID
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den", "von", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "des"))

  /** Per-language stopword-hit count over a token-array column. */
  def langScoreFromTokens(toks: Column, lang: String): Column = {
    val words = stopwords(lang)
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
  }

  /** Per-language stopword-hit count over the token stream. */
  def langScore(text: Column, lang: String): Column =
    langScoreFromTokens(tokens(text), lang)

  /** Language-ID decision from already-materialized per-language score
    * columns (attributes!): argmax, ties broken en > es > de > fr, all-zero
    * => "und". */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
  }

  /**
   * N-gram/stopword-heuristic language ID: argmax of per-language stopword
   * hits, ties broken en > es > de > fr; no hits at all => "und"
   * (undetermined). Pure expression tree — no UDF, no shuffle. Convenience
   * form: the when-chain re-evaluates the score expressions, so hot paths
   * should materialize tokens then scores as columns and finish with
   * [[langIdFromScores]] (see QueriesText.text_lang_id).
   */
  def langId(text: Column): Column =
    langIdFromScores(Seq("en", "es", "de", "fr").map(l => (l, langScore(text, l))))

  // ------------------------------------------------------------ quality
  /** Ratio of alphabetic chars to total chars (null-safe, 0 for empty). */
  def alphaRatio(text: Column): Column = {
    val len = length(text)
    when(len > 0,
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / len)
      .otherwise(lit(0.0))
  }

  /** Ratio of punctuation chars to total chars. */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len > 0,
      length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") / len)
      .otherwise(lit(0.0))
  }

  /** Ratio of tokens that are (any-language) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct
    val n = tokenCount(text)
    when(n > 0,
      size(filter(tokens(text), t => t.isin(all.map(lit(_)): _*))).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /** Mean token length (0 for empty). */
  def meanTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0,
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /**
   * Composite document quality score in [0,1]: favors alphabetic text of
   * reasonable length with moderate punctuation and some stopword mass —
   * the C4/Gopher-style heuristic family expressed as one expression.
   */
  def qualityScore(text: Column): Column = {
    val lengthOk = when(length(text).between(20, 100000), lit(0.25)).otherwise(lit(0.0))
    val alphaOk = when(alphaRatio(text) > 0.6, lit(0.25)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(0.25)).otherwise(lit(0.0))
    val meanOk = when(meanTokenLength(text).between(2.0, 12.0), lit(0.25)).otherwise(lit(0.0))
    lengthOk + alphaOk + punctOk + meanOk
  }

  // ------------------------------------------------------------ PII scrub
  /**
   * Redact common PII shapes with typed placeholders — the standard
   * pre-training scrub pass: emails, US SSNs, then NANP-ish phone
   * numbers. A pure regexp_replace chain (codegen'd, replace-all). SSNs
   * run BEFORE phones so a dashed SSN can't half-match the phone shape.
   * Heuristic by design: the patterns favor precision on the common
   * shapes over recall on exotic ones, and every pattern is RE2-safe so
   * the DuckDB oracle replays them verbatim.
   */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email,
      "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
    regexp_replace(ssn,
      "(?:\\+?1[-. ])?(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\\b",
      "<PHONE>")
  }

  // ------------------------------------------------------------ repetition
  /** Fraction of lines that are duplicates of an earlier line (Gopher
    * repetition-signal family): 1 - distinct/total over trimmed non-empty
    * lines; 0 for line-less text. */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val n = size(lines)
    when(n > 0,
      (n - size(array_distinct(lines))).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /** Word n-gram repetition ratio: 1 - distinct/total n-grams — high
    * values mark boilerplate/looping text (the top-n-gram-fraction
    * family, expressed distinct-based so it stays one expression). */
  def ngramRepetitionRatio(text: Column, n: Int): Column = {
    val gs = wordNgrams(text, n)
    val cnt = size(gs)
    when(cnt > 0,
      lit(1.0) - size(array_distinct(gs)).cast("double") / cnt)
      .otherwise(lit(0.0))
  }

  // ------------------------------------------------------------ fingerprint
  /** Canonical text form: lowercase, strip non-alnum (keeping spaces),
    * collapse whitespace, trim. */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Deterministic document fingerprint = md5 of the canonical form. */
  def fingerprint(text: Column): Column = md5(canonicalText(text).cast("binary"))

  /**
   * Rolling (polynomial) hash over the characters of an ALREADY-CANONICAL
   * text column: h = fold(h*31 + code) mod (2^31-1). Engine-portable (pure
   * integer arithmetic over codepoints) and incremental by construction —
   * the Rabin-Karp family the reference-scale pipelines use for cheap
   * content fingerprints. Pass an attribute (see charShinglesCanon note).
   */
  def rollingFingerprint(canon: Column): Column =
    when(length(canon) > 0, // sequence(1, 0) would count DOWN
      aggregate(
        transform(sequence(lit(1), length(canon)),
          i => ascii(call_function("substring", canon, i, lit(1))).cast("long")),
        lit(0L),
        (acc, x) => (acc * 31 + x) % 2147483647L))
      .otherwise(lit(0L))

  // ------------------------------------------------------------ shingles
  /**
   * Character k-shingles over an ALREADY-CANONICAL text column. Pass an
   * attribute (a materialized column), not an expression: `t` is referenced
   * inside the transform lambda, so an inlined expression would re-evaluate
   * once per shingle — the canonicalText regex chain per element turned a
   * scan into a ~300× regex loop (observed at sf0.1). Operators materialize
   * the canonical form first (see Dedup.minhashNearDupPairs).
   */
  def charShinglesCanon(t: Column, k: Int): Column =
    when(length(t) >= k,
      transform(sequence(lit(1), length(t) - (k - 1)), i => substring(t, i, lit(k))))
      .otherwise(array(t))

  /** Character k-shingles of the canonical form (convenience; for hot paths
    * materialize canonicalText first and use [[charShinglesCanon]]). */
  def charShingles(text: Column, k: Int): Column =
    charShinglesCanon(canonicalText(text), k)

  /** Word n-grams of the token stream. */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromTokens(tokens(text), n)

  /** Word n-grams from an ALREADY-MATERIALIZED token array column. Hot
    * paths must pass an attribute here, not an inline `tokens(...)`
    * expression — the lambda references the array once per element and an
    * inline expression re-evaluates each time (the HOF-inlining trap).
    * A document shorter than `n` tokens yields its whole token stream as
    * one gram (never an empty array). */
  def wordNgramsFromTokens(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", ts)))

  // ------------------------------------------------------------ MinHash
  /** MinHash signature — native expression kernel (see [[MinhashSignature]]:
    * the HOF formulation of the same math ran 25x slower interpreted). */
  def minhashSignature(items: Column, numHashes: Int): Column =
    graft.functions.exprToColumn(
      MinhashSignature(graft.functions.columnToExpr(items), numHashes))

  /**
   * LSH band keys from a signature: `bands` keys, each an md5 of the band
   * index plus its `rowsPerBand` signature slice. Two docs share a band key
   * iff the slice matches exactly — the classic banding construction.
   */
  def minhashBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        lit(b.toString) +: (0 until rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r + 1).cast("string")): _*)
        .cast("binary"))
    }: _*)

  /** Jaccard similarity of two (distinct-element) array columns — native
    * kernel (see [[JaccardSim]]; the array_intersect/array_union form
    * walks both arrays twice through interpreted set machinery). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.exprToColumn(
      JaccardSim(graft.functions.columnToExpr(a), graft.functions.columnToExpr(b)))

  /** Jaccard similarity of two SORTED distinct-element array columns —
    * zero-allocation merge-scan kernel (see [[SortedJaccard]]); ~5x
    * cheaper per pair than the hash-set kernel when arrays are already
    * held in canonical sorted form. */
  def sortedJaccard(a: Column, b: Column): Column =
    graft.functions.exprToColumn(
      SortedJaccard(graft.functions.columnToExpr(a), graft.functions.columnToExpr(b)))

  // ------------------------------------------------------------ SimHash
  /**
   * SimHash over a token array — native expression kernel (see [[Simhash]]):
   * bit j is the sign of sum over tokens of (g_j(polyhash(token)) odd ?
   * +1 : -1), with g_j the MinhashSignature affine family — so the whole
   * hash is reproducible in the DuckDB oracle. Near-duplicate detection
   * compares hamming distance of the resulting long. bits <= 60.
   */
  def simhash(items: Column, bits: Int = 60): Column =
    graft.functions.exprToColumn(
      Simhash(graft.functions.columnToExpr(items), bits))

  /** Hamming distance between two long-encoded bit vectors. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
