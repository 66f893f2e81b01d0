package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * URL-level curation — the provenance stages a web-scale training-data
 * pipeline runs before any text-level pass (the CCNet / RefinedWeb /
 * Dolma recipe): canonicalize the crawl URL, drop blocklisted domains,
 * and cap how many documents any one domain contributes (domain
 * diversity — without it a handful of boilerplate-heavy hosts dominate
 * the token budget).
 *
 * Scale shape (100 TB lens): normalization and domain extraction are
 * pure regexp expression trees (codegen'd, map-side, zero shuffles);
 * the blocklist is domains-count-sized and joins as a BROADCAST
 * left-anti; the per-domain cap is one shuffle keyed by domain. The cap
 * ranks by a deterministic multiplicative id hash, so the kept subset
 * is reproducible run-to-run and engine-independent — not "first N by
 * partition order". A mega-domain would make its cap partition hot, so
 * domains whose count exceeds skewFactor x the cap take an EXACT salted
 * pre-cut first (see [[capPerDomain]]) — same answer, bounded window
 * input.
 */
object UrlCuration {

  /**
   * Canonicalize a URL string for dedup/grouping:
   *  - trim, lowercase the scheme and host (path/query keep their case),
   *  - drop the `#fragment`,
   *  - strip a leading `www.` from the host,
   *  - remove tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`),
   *    dropping `?` entirely when nothing else remains,
   *  - strip one trailing `/` from a non-root path.
   * Each step is a regexp/string expression — the whole thing stays one
   * codegen'd projection.
   */
  def normalizeUrl(u: Column): Column = {
    val trimmed = trim(u)
    // lowercase scheme+host only: split at the first '/' after '://'
    val head = regexp_extract(trimmed, "^([^:]+://[^/?#]*)", 1)
    val tail = substring(trimmed, length(head) + 1, lit(1000000))
    val lowered = concat(lower(head), tail)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noWww = regexp_replace(noFrag, "^([a-z]+://)www\\.", "$1")
    // tracking params: kill `key=value` pairs for the known keys
    // (anchored to the ?/& separator so `xref=` is never touched), then
    // tidy separators left behind ("?&", "&&", trailing "?"/"&")
    val noTrack = regexp_replace(noWww,
      "([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*", "$1")
    val tidySep = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&"),
      "[?&]+$", "")
    // trailing slash on a non-root path ("...x/" -> "...x", but keep
    // "scheme://host/" intact as the root)
    regexp_replace(tidySep, "([a-z]+://[^/]+/.+?)/$", "$1")
  }

  /** The registrable host of a normalized URL ("scheme://host/..." ->
    * host, already lowercased/www-stripped by [[normalizeUrl]]). */
  def domainOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[a-z]+://([^/?#:]+)", 1)

  /** Drop documents whose domain appears in `blocklist` (one `domain`
    * column). Broadcast left-anti — the blocklist is list-sized, never
    * corpus-sized. Null domains survive (nothing to match), matching
    * SQL NOT EXISTS semantics. */
  def filterBlocklist(docs: DataFrame, domainCol: String,
      blocklist: DataFrame): DataFrame =
    docs.join(
      broadcast(blocklist.select(col(blocklist.columns.head).as(domainCol))),
      Seq(domainCol), "left_anti")

  /**
   * Keep at most `maxPerDomain` documents per domain, chosen by the
   * deterministic multiplicative id hash (ties broken by id) — the
   * domain-diversity cap. Adds nothing and reorders nothing for domains
   * under the cap.
   *
   * Mega-domain skew: a domain with millions of rows would serialize
   * into one window partition, so domains whose row count exceeds
   * `skewFactor * maxPerDomain` first take an EXACT salted pre-cut
   * ([[saltedPrecut]]): rank within (domain, hash-salt) subgroups and
   * keep the per-subgroup top `maxPerDomain`. Any row in the domain's
   * true top-`maxPerDomain` ranks at least as high inside its subgroup,
   * so the pre-cut NEVER drops a survivor — no probabilistic safety
   * margin — while bounding the final window's input to
   * `skewSalts * maxPerDomain` rows per hot domain. Cold domains skip
   * the pre-cut (salt 0 = the whole domain) and their pre-cut stage is
   * the exact cap already. The hot-domain table is tiny (only domains
   * over the threshold) and broadcasts; the count aggregation is
   * map-side partial, domain-count-sized.
   */
  def capPerDomain(docs: DataFrame, domainCol: String, idCol: String,
      maxPerDomain: Int, skewFactor: Int = 10, skewSalts: Int = 32): DataFrame = {
    val pre = saltedPrecut(docs, domainCol, idCol, maxPerDomain,
      skewFactor, skewSalts)
    val w = Window.partitionBy(col(domainCol))
      .orderBy(Mixture.idHashUnit(col(idCol)).asc, col(idCol).asc)
    pre
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= maxPerDomain)
      .drop("__rank")
  }

  /** Stage 1 of [[capPerDomain]]: per-(domain, salt) top-`maxPerDomain`
    * by the same (hash, id) order, where hot domains (count >
    * skewFactor*maxPerDomain) salt by `pmod(hash(id), skewSalts)` and
    * cold domains use salt 0 (subgroup = domain, so their pre-cut IS the
    * exact cap). Output per domain is <= skewSalts * maxPerDomain rows
    * and contains every row of the domain's true top-`maxPerDomain`
    * (subgroup rank <= domain rank, always). */
  private[graft] def saltedPrecut(docs: DataFrame, domainCol: String,
      idCol: String, maxPerDomain: Int, skewFactor: Int,
      skewSalts: Int): DataFrame = {
    require(skewSalts >= 1, s"capPerDomain: skewSalts must be >= 1, got $skewSalts")
    val hot = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__dn"))
      .filter(col("__dn") > skewFactor.toLong * maxPerDomain)
      .select(col(domainCol))
      .withColumn("__hot", lit(true))
    val w1 = Window.partitionBy(col(domainCol), col("__salt"))
      .orderBy(Mixture.idHashUnit(col(idCol)).asc, col(idCol).asc)
    docs
      .join(broadcast(hot), Seq(domainCol), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(Mixture.guardedIdHash(col(idCol)), lit(skewSalts.toLong)))
          .otherwise(lit(0L)))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= maxPerDomain)
      .drop("__hot", "__salt", "__r1")
  }
}
