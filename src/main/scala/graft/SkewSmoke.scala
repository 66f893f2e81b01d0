package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Skewed-duplication stress smoke — the HOT-KEY complement to
 * [[ScaleSmoke]]'s uniform replication. One percent of the base docs
 * (doc_id % 100 == 0) are replicated `copies` times into mega-cliques
 * while the other 99% stay singletons, so duplicate mass concentrates in
 * a handful of fingerprints, band keys and size bands — the distribution
 * where a pair generator that is merely subquadratic ON AVERAGE still
 * dies on its hottest bucket (the web-corpus reality: a boilerplate page
 * with millions of copies next to a long tail of unique documents; cf.
 * the reference's skewed birth-year blocks in fuzzy matching,
 * docs/notebooks/fuzzy.Rmd:562-579, same failure geometry at corpus
 * scale). Checks, all exact:
 *
 *  - minhash / ngram-jaccard pair generation recovers at least every
 *    planted within-clique pair (hot docs x C(copies,2)) without the
 *    cross product — wall time is printed so a blowup is visible;
 *  - connected components collapse every mega-clique to ONE component
 *    with zero partial cliques, leaving singletons alone (the
 *    pointer-jumping loop's hot-label case: `copies` nodes all adopt one
 *    min-label);
 *  - soft dedup keeps ~1 expected member per mega-clique and EVERY
 *    singleton (n=1 always keeps), so the kept count is pinned to
 *    [singletons + 0, singletons + 2·hot] — the count-join path's
 *    skew-split handles the hot fingerprints.
 *
 * Usage: runMain graft.SkewSmoke [sfDir] [copies]  (default 200 — at
 * sf0.1's 5,000 base docs: 50 cliques of 200 + 4,950 singletons.)
 */
object SkewSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 200
    require(copies >= 2, s"copies must be >= 2, got $copies")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val hot = base.filter(col("doc_id") % 100 === 0)
    val cold = base.filter(col("doc_id") % 100 =!= 0)
    val big = (0 until copies).map { c =>
      hot.select((col("doc_id") + lit(c * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_.unionByName(_)).unionByName(cold)
    val nHot = hot.count()
    val nCold = cold.count()
    val n = big.count()
    require(n == nHot * copies + nCold, s"corpus build broke: $n")
    val plantedPairs = nHot * (copies.toLong * (copies - 1) / 2)
    println(s"[skew-smoke] corpus docs=$n hot-cliques=$nHot x$copies singletons=$nCold planted-pairs=$plantedPairs")

    def timedPairs(name: String)(pairs: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val p = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val ok = if (p >= plantedPairs) "ok" else "LOW"
      println(f"[skew-smoke] $name%-16s pairs=$p (>=$plantedPairs planted, $ok) ${dt}%.1fs")
    }

    timedPairs("minhash") {
      Dedup.minhashNearDupPairs(big, "text", "doc_id",
        shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
    }
    timedPairs("ngram-jaccard") {
      // 0.98 as in ScaleSmoke: the template corpus is dense with true
      // near-dups at lower cuts; the check targets blocking under skew,
      // not the size of the correct answer
      Dedup.ngramJaccardPairs(big, "text", "doc_id", 0.98)
    }

    // Components over the minhash pair graph: every mega-clique collapses
    // whole (its `copies` members share one label), singletons untouched.
    val t1 = System.nanoTime()
    val edges = Dedup.minhashNearDupPairs(big, "text", "doc_id",
      shingleK = 5, numHashes = 16, bands = 4, minJaccard = 0.5)
      .select("id_a", "id_b")
    val labels = Dedup.connectedComponents(edges, Some(big.select(col("doc_id"))))
    // base id of a replica is id % 10^7; a clique is partial iff its
    // members span >1 component; a component is mixed iff it spans >1
    // base id of PLANTED docs (template near-dups can legitimately merge
    // distinct base docs, so mixing is only checked through clique size)
    val partial = labels
      .withColumn("base", col("id") % 10000000L)
      .filter(col("base") % 100 === 0)
      .groupBy("base").agg(countDistinct(col("component")).as("k"))
      .filter(col("k") > 1).count()
    val dt1 = (System.nanoTime() - t1) / 1e9
    val cOk = if (partial == 0L) "ok" else "BAD"
    println(f"[skew-smoke] components       partial-cliques=$partial (expect 0, $cOk) ${dt1}%.1fs")

    // Soft dedup: every singleton survives (n=1), each mega-clique keeps
    // ~1 expected (deterministic hash; [0, 2·hot] absorbs realization).
    val t2 = System.nanoTime()
    val soft = Dedup.softDedup(big, "text", "doc_id").cache()
    val kept = soft.count()
    val keptSingletons = soft.filter(col("n_docs") === 1).count()
    val keptHot = soft.filter(col("n_docs") >= copies).count()
    soft.unpersist()
    val dt2 = (System.nanoTime() - t2) / 1e9
    // nearly every cold doc is its own canonical cluster (the sf0.1 base
    // has a handful of intra-base canonical twins — the 30-copy ScaleSmoke
    // counted 4,992 clusters over 5,000 docs — so a small mid-size
    // remainder is legitimate); hot clusters are size `copies` or a
    // little more when a hot doc has a cold canonical twin
    // hot bound is two-sided: keptHot counts survivor ROWS, whose
    // expectation is exactly nHot (1 per clique; the ~0.63·nHot figure
    // is the different quantity "cliques with ≥1 survivor"). Fewer than
    // nHot/4 rows means the count-join path is DROPPING hot-cluster
    // members — the exact regression this smoke exists to catch — while
    // > 2·nHot means the 1/n draw is keeping too many
    val keptMid = kept - keptSingletons - keptHot
    val sOk = if (keptSingletons >= nCold * 9 / 10 &&
        keptHot >= nHot / 4 && keptHot <= 2 * nHot &&
        keptMid <= 20) "ok" else "BAD"
    println(f"[skew-smoke] soft-dedup       kept=$kept singletons=$keptSingletons hot-survivors=$keptHot mid=$keptMid (expect ~$nCold + ~$nHot, $sOk) ${dt2}%.1fs")

    spark.stop()
  }
}
