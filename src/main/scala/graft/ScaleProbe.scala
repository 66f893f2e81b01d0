package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stage-level probe for the near-dup pair kernels at a given corpus dir:
 * times the shingle pipeline alone, the banded signature pass, the
 * candidate generation, and the full operator with and without the
 * shared-shingle cache — the decomposition that attributes a scaling-run
 * regression to a STAGE instead of a guess (round-11 slope work).
 * Usage: runMain graft.ScaleProbe <sfDir> [minJaccard]
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val minJ = if (args.length > 1) args(1).toDouble else 0.5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    import graft.functions.TextFunctions._
    val base = docs.select(col("doc_id").as("id"), col("text"))
      .repartition(32, col("id"))
    timed("canon")(base.select(canonicalText(col("text")).as("c"))
      .agg(sum(length(col("c")))).head())
    val shingled = base
      .select(col("id"), canonicalText(col("text")).as("__canon"))
      .select(col("id"),
        array_distinct(charShinglesCanon(col("__canon"), 5)).as("shingles"))
    timed("shingles")(shingled.agg(sum(size(col("shingles")))).head())
    timed("signature")(shingled
      .withColumn("sig", minhashSignature(col("shingles"), 16))
      .agg(sum(element_at(col("sig"), 1))).head())
    timed("full-nocache")(println("[probe]   pairs=" +
      Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        shingleK = 5, numHashes = 16, bands = 4, minJaccard = minJ).count()))
    timed("full-cache")(println("[probe]   pairs=" +
      Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        shingleK = 5, numHashes = 16, bands = 4, minJaccard = minJ,
        cacheShingles = true).count()))
    val edges = timed("pairs-materialize") {
      val e = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        shingleK = 5, numHashes = 16, bands = 4, minJaccard = minJ)
        .select("id_a", "id_b").localCheckpoint(true)
      println("[probe]   edges=" + e.count())
      e
    }
    timed("connected-components")(println("[probe]   comps=" +
      Dedup.connectedComponents(edges,
        Some(docs.select(col("doc_id").as("id")))).select("component")
        .distinct().count()))
    timed("best-survivors")(println("[probe]   survivors=" +
      Dedup.dedupSurvivorsBest(edges,
        docs.select(col("doc_id"), length(col("text")).cast("long").as("score")),
        "doc_id", "score",
        Some(docs.select(col("doc_id").as("id")))).count()))
    // ngram-jaccard blocking A/B at the registry threshold (0.8): the
    // auto choice plus each arm forced, so a slope regression attributes
    // to an ARM or to the CHOICE
    Seq("auto", "prefix").foreach { b =>
      timed(s"ngram-$b")(println("[probe]   pairs=" +
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.8, blocking = b)
          .count()))
    }
    // stage decomposition of the prefix arm (mirrors ngramJaccardPairs
    // internals — diagnostic only, kept in lockstep by eyeball)
    locally {
      import org.apache.spark.sql.expressions.Window
      val minJ = 0.8
      val prep = docs.select(col("doc_id").as("id"), col("text"))
        .repartition(32, col("id"))
        .select(col("id"),
          sort_array(array_distinct(tokens(col("text")))).as("toks"))
        .filter(size(col("toks")) > 0)
      val keyed = prep
        .withColumn("skey", unhex(md5(to_json(col("toks")).cast("binary"))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("d-keyed")(println("[probe]   rows=" + keyed.count()))
      val groups = keyed.groupBy("skey")
        .agg(first(col("toks")).as("toks"), count(lit(1)).as("cnt"))
        .withColumn("n", size(col("toks")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("d-groups")(println("[probe]   rows=" + groups.count()))
      val tokSets = groups.select(col("skey"), col("n"), explode(col("toks")).as("tok"))
      val dfreq = tokSets.groupBy("tok").agg(count(lit(1)).as("df"))
      val prefix = tokSets.join(dfreq, Seq("tok"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("skey")).orderBy(col("df"), col("tok"))))
        .filter(col("__rn") <= col("n") - ceil(lit(minJ) * col("n")) + 1)
        .select(col("tok"), col("skey"), col("n"), col("__rn").as("p"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("d-prefix-table")(println("[probe]   rows=" + prefix.count()))
      val sizeOk = least(col("n_a"), col("n_b")) >=
        lit(minJ) * greatest(col("n_a"), col("n_b"))
      val pa = prefix.select(col("tok"), col("skey").as("skey_a"),
        col("n").as("n_a"), col("p").as("p_a"))
      val pb = prefix.select(col("tok"), col("skey").as("skey_b"),
        col("n").as("n_b"), col("p").as("p_b"))
      val alpha = ceil(
        lit(minJ) * (col("n_a") + col("n_b")) / lit(1 + minJ) - lit(1e-9))
      // positional-filter A/B (round 12): the PPJoin bound prunes raw
      // candidate rows BEFORE the dedup — the no-pos row is what the
      // operator generated through round 11
      val rawCandNoPos = pa.join(pb, Seq("tok"))
        .filter(col("skey_a") < col("skey_b") && sizeOk)
        .select(col("skey_a"), col("skey_b"))
      timed("d-cand-raw-nopos")(println("[probe]   rows=" + rawCandNoPos.count()))
      val rawCand = pa.join(pb, Seq("tok"))
        .filter(col("skey_a") < col("skey_b") && sizeOk)
        .filter(least(col("n_a") - col("p_a"), col("n_b") - col("p_b")) + 1
          >= alpha)
        .select(col("skey_a"), col("skey_b"))
      timed("d-cand-raw")(println("[probe]   rows=" + rawCand.count()))
      // fused end-to-end chain per arm (distinct -> verify -> fingerprint),
      // identical code either side of the positional filter: the wall and
      // order-insensitive pair-set hash of the round-11 operator (nopos)
      // vs the round-12 one (pos), in ONE session on ONE corpus
      val ta0 = groups.select(col("skey").as("skey_a"), col("toks").as("t_a"))
      val tb0 = groups.select(col("skey").as("skey_b"), col("toks").as("t_b"))
      def chain(raw: org.apache.spark.sql.DataFrame, tag: String): Unit =
        timed(s"d-chain-$tag") {
          val row = raw.distinct()
            .repartition(256, col("skey_a"))
            .join(ta0, Seq("skey_a")).join(tb0, Seq("skey_b"))
            .select(col("skey_a"), col("skey_b"),
              sortedJaccard(col("t_a"), col("t_b")).as("jaccard"))
            .filter(col("jaccard") >= minJ)
            // bit_xor, not sum: pairs are distinct post-dedup, so xor is an
            // order-insensitive set fingerprint that cannot overflow ANSI longs
            .agg(count(lit(1)),
              expr("bit_xor(xxhash64(skey_a, skey_b))"))
            .head()
          println(s"[probe]   pairs=${row.getLong(0)} fp=${row.getLong(1)}")
        }
      chain(rawCandNoPos, "nopos")
      chain(rawCand, "pos")
      val cand = rawCand.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("d-cand-distinct")(println("[probe]   rows=" + cand.count()))
      val ta = groups.select(col("skey").as("skey_a"), col("toks").as("t_a"))
      val tb = groups.select(col("skey").as("skey_b"), col("toks").as("t_b"))
      val verified = cand
        .repartition(256, col("skey_a"))
        .join(ta, Seq("skey_a")).join(tb, Seq("skey_b"))
        .select(col("skey_a"), col("skey_b"),
          sortedJaccard(col("t_a"), col("t_b")).as("jaccard"))
        .filter(col("jaccard") >= minJ)
      timed("d-verify")(println("[probe]   rows=" + verified.count()))
      timed("d-checkpoint")(verified.localCheckpoint(true))
      Seq(keyed, groups, prefix, cand).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
