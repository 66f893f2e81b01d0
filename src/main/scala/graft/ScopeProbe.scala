package graft

import graft.operators.AnnIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale A/B for scoped (filtered) kNN search (round 15): build ONE
 * persisted LSH index over a synthetic embeddings corpus, then run the
 * batched join unscoped and with a 1/`den` id scope, and hash-compare
 * the scoped answers against an index built over ONLY the scope rows
 * (signatures are row-local at a fixed explicit plan, so the two must
 * agree exactly — the same equivalence AnnIndexSpec pins at oracle
 * scale, here at probe scale).
 *
 * The claim measured: scope cost is ONE broadcast semi-join on the
 * candidate stream — a narrow scope must get FASTER (it cuts the
 * candidate mass ahead of the per-query windows), never slower; and a
 * scoped search of a SHARED index replaces maintaining one index per
 * filter, so the interesting number is scoped-vs-subindex wall, not
 * just scoped-vs-unscoped. The corpus is hash-deterministic
 * (VacuumProbe's gaussian construction) so recorded numbers reproduce.
 *
 * Usage: runMain graft.ScopeProbe [nRows] [den] [nQueries]
 * Prints [probe] lines; exits nonzero when scoped answers disagree
 * with the scope-only index.
 */
object ScopeProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val den = if (args.length > 1) args(1).toInt else 100
    val nQ = if (args.length > 2) args(2).toInt else 256
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val dims = 64
    def unif(seed: org.apache.spark.sql.Column, salt: Int) =
      (pmod(xxhash64(seed, lit(salt)), lit(1000000L)).cast("double") + 0.5) /
        1000000.0
    def gauss(seed: org.apache.spark.sql.Column, salt: Int) =
      sqrt(lit(-2.0) * log(unif(seed, salt))) *
        cos(lit(2.0 * math.Pi) * unif(seed, salt + 1))
    val emb = spark.range(nRows).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        j => gauss(col("id") * dims + j, 11).cast("float"))
        .as("embedding")).localCheckpoint(true)
    val n = emb.count()
    val scopeIds = emb.filter(col("vec_id") % den === 0).select("vec_id")
    val allowed = emb.filter(col("vec_id") % den === 0)
    val nScope = allowed.count()
    val queries = emb.filter(col("vec_id") < nQ)

    // ONE shared index; the same fixed explicit plan on the scope-only
    // reference so per-row signatures (and thus candidate sets within
    // the scope) are identical
    val full = Tables.freshScratch("scopeprobe_full") + "/idx"
    val sub = Tables.freshScratch("scopeprobe_sub") + "/idx"
    val (_, tBuild) = timed(AnnIndex.buildLsh(emb, "embedding", "vec_id",
      full, dims = 0, bits = 12, autoPlan = false))
    val (_, tSub) = timed(AnnIndex.buildLsh(allowed, "embedding", "vec_id",
      sub, dims = 0, bits = 12, autoPlan = false))
    println(s"[probe] scope corpus=$n scope=$nScope (1/$den) " +
      s"queries=$nQ build_full=${f"$tBuild%.1f"}s " +
      s"build_scope_only=${f"$tSub%.1f"}s")

    def run(p: String, scope: Option[org.apache.spark.sql.DataFrame]) =
      AnnIndex.lshKnnJoin(spark, p, queries, "embedding", "vec_id",
        k = 10, scope = scope).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (base, tBase) = timed(run(full, None))
    val (scoped, tScoped) = timed(run(full, Some(scopeIds)))
    val (subRes, tSubRun) = timed(run(sub, None))
    println(f"[probe] scope unscoped=$tBase%.1fs scoped=$tScoped%.1fs " +
      f"(ratio=${tScoped / math.max(0.01, tBase)}%.2fx) " +
      f"subindex=$tSubRun%.1fs rows=${base.size}/${scoped.size}")

    val inScope = scoped.forall(_._2 % den == 0)
    val same = scoped == subRes
    println(s"[probe] scope in_scope=$inScope " +
      s"scoped_eq_subindex=$same " + (if (inScope && same) "ok" else "BAD"))
    spark.stop()
    if (!(inScope && same)) sys.exit(1)
  }
}
