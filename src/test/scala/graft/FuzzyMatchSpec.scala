package graft

import graft.pipelines.FuzzyMatch
import org.apache.spark.sql.functions._

/**
 * Fuzzy pipeline e2e (SURVEY §3.3): QA split, blocked OSA match with
 * name-flip + alternate-name multiplication, DOB equality, ±14-day filter
 * with flagged add-back, multi-match resolution, tiering, and the
 * rows-accounted-for conservation property.
 */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = to_date(lit(s))

  // submissions: rowid, names, dob, collection_date
  private val submissions = Seq(
    // 1: exact-name match, in-window date -> roster (distance 0)
    (1L, "John", "Smith", "1980-03-01", "2021-06-01"),
    // 2: one-typo match -> roster (distance 1)
    (2L, "Jane", "Doe", "1985-07-10", "2021-06-05"),
    // 3: flipped name in target -> roster via flip pass
    (3L, "Amy", "Pond", "1990-01-20", "2021-06-10"),
    // 4: two-typo match -> manual_review (distance 2)
    (4L, "Rory", "Williams", "1988-11-02", "2021-06-15"),
    // 5: no match at all -> unmatched
    (5L, "Clara", "Oswald", "1986-11-23", "2021-06-20"),
    // 6: digits in name -> bad_rows (Q2)
    (6L, "R2D2", "Robot", "1977-05-25", "2021-06-25"),
    // 7: match exists but only out-of-window date -> flagged add-back
    (7L, "Martha", "Jones", "1986-07-01", "2021-06-30"),
    // 8: matches TWO case_ids -> QA_MULTIPLE_MATCH
    (8L, "Donna", "Noble", "1968-05-25", "2021-07-01"),
    // 9: matches ONLY via the alternate DOB (flattened BIRTH_DATE) — the
    //    target's recorded DOB is in a different birth YEAR, so the block
    //    itself must be recomputed per DOB variant for this to match
    (9L, "Sarah", "Sponder", "1970-02-02", "2021-07-04"),
    // 10: target DOB is null; flattened BIRTH_DATE null-fills it
    (10L, "Vera", "Chan", "1975-03-03", "2021-07-06"))
    .toDF("rowid", "first_name", "last_name", "dob", "collection_date")
    .withColumn("dob", col("dob").cast("date"))
    .withColumn("collection_date", col("collection_date").cast("date"))

  // target: case_id, names (+ alternates), dob (+ flattened alt), wdrs date
  private val target = Seq(
    (101L, "John", "Smith", null, null, "1980-03-01", null, "2021-06-03"),
    (102L, "Jane", "Does", null, null, "1985-07-10", null, "2021-06-07"),
    // stored flipped: first=Pond last=Amy; flip pass matches
    (103L, "Pond", "Amy", null, null, "1990-01-20", null, "2021-06-12"),
    (104L, "Roly", "Wilhiams", null, null, "1988-11-02", null, "2021-06-16"),
    // alternate name is what the submission used
    (107L, "Peggy", "Jones", "Martha", "Jones", "1986-07-01", null, "2021-09-30"),
    (108L, "Donna", "Noble", null, null, "1968-05-25", null, "2021-07-02"),
    (109L, "Donna", "Noble", null, null, "1968-05-25", null, "2021-07-03"),
    // recorded DOB 1969-12-31, flattened BIRTH_DATE 1970-02-02 (different
    // birth year -> different block); submission 9 carries the alt DOB
    (110L, "Sarah", "Sponder", null, null, "1969-12-31", "1970-02-02", "2021-07-05"),
    // recorded DOB missing entirely; flattened BIRTH_DATE fills it
    (111L, "Vera", "Chan", null, null, null, "1975-03-03", "2021-07-07"))
    .toDF("case_id", "first_name", "last_name", "alt_first_name",
      "alt_last_name", "dob", "alt_dob", "wdrs_collection")
    .withColumn("dob", col("dob").cast("date"))
    .withColumn("alt_dob", col("alt_dob").cast("date"))
    .withColumn("wdrs_collection", col("wdrs_collection").cast("date"))

  private lazy val (bad, matched, unmatched) = FuzzyMatch.run(submissions, target)

  test("QA pre-match split catches digit names") {
    assert(bad.select("rowid").as[Long].collect().toSeq === Seq(6L))
  }

  test("tiering: exact/1-typo/flip to roster, 2-typo to review") {
    val m = matched.select("rowid", "case_id", "tier", "distance")
      .as[(Long, Long, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.toSet).toMap
    assert(m(1L).head === ((1L, 101L, "roster", 0)))
    assert(m(2L).head === ((2L, 102L, "roster", 1)))
    assert(m(3L).head === ((3L, 103L, "roster", 0)))   // flip pass
    assert(m(4L).head === ((4L, 104L, "manual_review", 2)))
  }

  test("alternate-name multiplication matches, flagged out-of-window add-back") {
    val r7 = matched.filter(col("rowid") === 7)
      .select("case_id", "QA_COLLECT_DATE").as[(Long, Int)].collect().toSeq
    assert(r7 === Seq((107L, 1))) // matched via alternate, date out of window -> flagged
  }

  test("alternate-DOB multiplication: match reachable only via flattened BIRTH_DATE") {
    val r9 = matched.filter(col("rowid") === 9)
      .select("case_id", "tier", "distance").as[(Long, String, Int)].collect().toSeq
    assert(r9 === Seq((110L, "roster", 0)))
  }

  test("alternate-DOB null-fill: null target DOB filled from flattened") {
    val r10 = matched.filter(col("rowid") === 10)
      .select("case_id", "distance").as[(Long, Int)].collect().toSeq
    assert(r10 === Seq((111L, 0)))
    // fill only, no disagreement -> exactly one candidate row, not flagged multi
    assert(matched.filter(col("rowid") === 10)
      .select("QA_MULTIPLE_MATCH").as[Int].collect().toSeq === Seq(0))
  }

  test("multi-candidate rows resolved one per case_id and flagged") {
    val r8 = matched.filter(col("rowid") === 8)
      .select("case_id", "QA_MULTIPLE_MATCH").as[(Long, Int)].collect().toSet
    assert(r8 === Set((108L, 1), (109L, 1)))
  }

  test("conservation: every rowid in exactly one of bad/matched/unmatched") {
    val all = submissions.select("rowid").as[Long].collect().toSet
    val b = bad.select("rowid").as[Long].collect().toSet
    val m = matched.select("rowid").distinct().as[Long].collect().toSet
    val u = unmatched.select("rowid").as[Long].collect().toSet
    assert(b.intersect(m).isEmpty && b.intersect(u).isEmpty && m.intersect(u).isEmpty)
    assert((b ++ m ++ u) === all)
    assert(u === Set(5L))
  }

  test("saved rows: a run-1 unmatched record retries and matches in run 2") {
    val root = java.nio.file.Files.createTempDirectory("graft_fuzzy_state").toString
    val store = new graft.sources.SnapshotStore(spark, root)
    val subs1 = Seq(
      (21L, "Rose", "Tyler", "1987-04-27", "2021-06-01"),   // matches now
      (22L, "Jack", "Harkness", "1971-08-15", "2021-06-02")) // WDRS case not in yet
      .toDF("rowid", "first_name", "last_name", "dob", "collection_date")
      .withColumn("dob", col("dob").cast("date"))
      .withColumn("collection_date", col("collection_date").cast("date"))
    val target1 = Seq(
      (201L, "Rose", "Tyler", "1987-04-27", "2021-06-03"))
      .toDF("case_id", "first_name", "last_name", "dob", "wdrs_collection")
      .withColumn("dob", col("dob").cast("date"))
      .withColumn("wdrs_collection", col("wdrs_collection").cast("date"))
      .withColumn("alt_first_name", lit(null).cast("string"))
      .withColumn("alt_last_name", lit(null).cast("string"))

    val (b1, m1, u1) = FuzzyMatch.runWithSavedRows(subs1, target1, store)
    assert(m1.select("rowid").as[Long].collect().toSet === Set(21L))
    assert(u1.select("rowid").as[Long].collect().toSet === Set(22L))
    assert(store.read("fuzzy_saved_rows").count() === 1)

    // run 2: an EMPTY submission batch; the saved row re-enters on its
    // own and the target now carries Jack's case
    val subs2 = subs1.limit(0)
    val target2 = target1.unionByName(Seq(
      (202L, "Jack", "Harkness", "1971-08-15", "2021-06-04"))
      .toDF("case_id", "first_name", "last_name", "dob", "wdrs_collection")
      .withColumn("dob", col("dob").cast("date"))
      .withColumn("wdrs_collection", col("wdrs_collection").cast("date"))
      .withColumn("alt_first_name", lit(null).cast("string"))
      .withColumn("alt_last_name", lit(null).cast("string")))
    val (b2, m2, u2) = FuzzyMatch.runWithSavedRows(subs2, target2, store)
    assert(m2.select("rowid", "case_id").as[(Long, Long)].collect().toSet
      === Set((22L, 202L)))
    assert(u2.count() === 0)
    // cross-run conservation: both rowids printed exactly once over the
    // two runs, and the saved state drained to empty
    assert(b1.count() + b2.count() === 0)
    assert(store.read("fuzzy_saved_rows").count() === 0)
  }

  test("saved rows: a resubmitted rowid is taken from today's batch once") {
    val root = java.nio.file.Files.createTempDirectory("graft_fuzzy_state2").toString
    val store = new graft.sources.SnapshotStore(spark, root)
    val subs = Seq((31L, "Mickey", "Smith", "1980-01-01", "2021-06-01"))
      .toDF("rowid", "first_name", "last_name", "dob", "collection_date")
      .withColumn("dob", col("dob").cast("date"))
      .withColumn("collection_date", col("collection_date").cast("date"))
    val noTarget = Seq.empty[(Long, String, String, String, String)]
      .toDF("case_id", "first_name", "last_name", "dob", "wdrs_collection")
      .withColumn("dob", col("dob").cast("date"))
      .withColumn("wdrs_collection", col("wdrs_collection").cast("date"))
      .withColumn("alt_first_name", lit(null).cast("string"))
      .withColumn("alt_last_name", lit(null).cast("string"))
    FuzzyMatch.runWithSavedRows(subs, noTarget, store)
    // run 2 resubmits the same rowid (newer collection date): the saved
    // copy must not double it
    val resubmit = subs.withColumn("collection_date", d("2021-06-10"))
    val (_, _, u2) = FuzzyMatch.runWithSavedRows(resubmit, noTarget, store)
    assert(u2.count() === 1)
    val kept = store.read("fuzzy_saved_rows")
      .select("collection_date").as[java.sql.Date].collect().toSeq
    assert(kept === Seq(java.sql.Date.valueOf("2021-06-10"))) // today's copy won
  }

  // --- birth-year skew (the reference's real distribution: one dominant
  // year, fuzzy.Rmd:562-579) ---

  /** ~90% of rows in the hot 1990 block, the rest spread over 40 years. */
  private def skewYear(idc: org.apache.spark.sql.Column) =
    when(idc % 10 < 9, lit(1990))
      .otherwise(lit(1950) + pmod(idc, lit(40)).cast("int")).cast("int")

  private def skewLeft(n: Long) = spark.range(n).select(
    col("id").as("lid"), skewYear(col("id")).as("by"),
    concat(lit("nm"), pmod(col("id"), lit(37)).cast("string")).as("ln"))

  private def skewRight(n: Long) = spark.range(n).select(
    col("id").as("rid"), skewYear(col("id")).as("by"),
    concat(lit("nm"), pmod(col("id"), lit(41)).cast("string")).as("rn"))

  test("salted fuzzy join on a hot birth year: same rows as unsalted, " +
      "salt in the equi keys, no nested loop") {
    import graft.operators.FuzzyJoin
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("lid", "rid", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val unsalted = FuzzyJoin.blockedFuzzyJoin(
      skewLeft(2000), skewRight(400), "by", col("ln"), col("rn"), 2)
    val salted = FuzzyJoin.blockedFuzzyJoin(
      skewLeft(2000), skewRight(400), "by", col("ln"), col("rn"), 2, salts = 8)
    assert(rows(salted) === rows(unsalted),
      "salting is a cost choice, never an answer choice")
    assert(rows(unsalted).nonEmpty)
    val plan = salted.queryExecution.executedPlan.toString
    // the salt rides in the equi keys (the hot block spreads over 8
    // reducers) and the plan is still a hash/sort-merge join
    assert(plan.contains("__lsalt"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("auto-salt heuristic: the hot 1990 mega-block picks salts > 1, " +
      "cold blocks stay unsalted, identical result rows") {
    import graft.operators.FuzzyJoin
    // the non-broadcastable regime (production WDRS-sized targets):
    // under the threshold planSalts correctly declines to salt — the
    // broadcast-aware gate has its own test below
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("lid", "rid", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (l, r) = (skewLeft(2000), skewRight(400))
    // pair masses: hot 1990 block ~1800 x 360 = 648k pairs; every cold
    // year ~5 x 1 = 5 — a 100k target salts ONLY the hot block
    val plan = FuzzyJoin.planSalts(l, r, "by",
      targetPairsPerBlock = 100000L, maxSalts = 32)
    assert(plan.salts > 1, s"mega-block must self-salt, got $plan")
    assert(plan.salts === 7, // ceil(648000 / 100000)
      s"salt count derives from the measured max pair mass, got $plan")
    assert(plan.hotBlocks === Seq(1990) && !plan.global,
      s"only the 1990 block is past target, got $plan")
    val auto = FuzzyJoin.blockedFuzzyJoinAuto(l, r, "by",
      col("ln"), col("rn"), 2, targetPairsPerBlock = 100000L)
    val unsalted = FuzzyJoin.blockedFuzzyJoin(l, r, "by", col("ln"), col("rn"), 2)
    assert(rows(auto) === rows(unsalted),
      "auto-salting is a cost choice, never an answer choice")
    assert(rows(unsalted).nonEmpty)
    // uniform small blocks: no salting at all
    val uni = FuzzyJoin.planSalts(
      spark.range(1000).select(col("id").as("lid"),
        pmod(col("id"), lit(40)).cast("int").as("by"), lit("a").as("ln")),
      spark.range(1000).select(col("id").as("rid"),
        pmod(col("id"), lit(40)).cast("int").as("by"), lit("a").as("rn")),
      "by", targetPairsPerBlock = 100000L)
    assert(!uni.isSalted && uni.hotBlocks.isEmpty)
    // fuzzyNameMatch(autoSalt = true) flows the ONE shared plan through
    // both passes and keeps the result set
    val lNames = skewLeft(500).withColumn("fn", lit("jo"))
    val rNames = skewRight(200).withColumn("rf", lit("jo"))
    val base = FuzzyMatchSpecHelper.nameRows(FuzzyJoin.fuzzyNameMatch(
      lNames, col("fn"), col("ln"), rNames, col("rf"), col("rn"), "by", 2, 2))
    val autoNm = FuzzyMatchSpecHelper.nameRows(FuzzyJoin.fuzzyNameMatch(
      lNames, col("fn"), col("ln"), rNames, col("rf"), col("rn"), "by", 2, 2,
      autoSalt = true, targetPairsPerBlock = 1000L))
    assert(autoNm === base && base.nonEmpty)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
  }

  test("broadcast-aware salt gate: a broadcastable side declines to salt " +
      "even over a mega-block (the BHJ plan has no key skew to fix)") {
    import graft.operators.FuzzyJoin
    val (l, r) = (skewLeft(2000), skewRight(400))
    // same corpus and target as the salting test above — the ONLY
    // difference is that broadcast is available (spec-default 10MB
    // threshold, both sides tiny), so the planner will build a BHJ whose
    // probe side distributes uniformly; salting would only replace it
    // with a slower salted shuffle join (FuzzySaltProbe measured 4x)
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
    val plan = FuzzyJoin.planSalts(l, r, "by",
      targetPairsPerBlock = 100000L, maxSalts = 32)
    assert(!plan.isSalted && plan.hotBlocks.isEmpty,
      s"broadcastable side must suppress salting, got $plan")
  }

  test("production path self-salts: matchCandidates on a mega-block corpus " +
      "plans the salted join and keeps the unsalted answer") {
    // one hot 1990 birth-year block (300 x 120 = 36k pairs) over a cold
    // tail — the fuzzy.Rmd:562-579 cohort shape in miniature. The salt
    // threshold is the exposed knob, so the salted plan fires at spec
    // scale exactly as it would at a 4M-pair cohort block in production.
    // Broadcast off: the production regime where salting matters is a
    // match target past the broadcast threshold (under it, the
    // broadcast-aware gate correctly declines — separate test above).
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val cleanBig = spark.range(300).select(
      col("id").as("rowid"),
      concat(lit("jo"), (col("id") % 60).cast("string")).as("first_name"),
      concat(lit("smi"), (col("id") % 40).cast("string")).as("last_name"),
      to_date(lit("1990-04-01")).as("dob"),
      to_date(lit("2021-06-01")).as("collection_date"))
      .unionByName(spark.range(5).select(
        (col("id") + 1000L).as("rowid"), lit("ann").as("first_name"),
        lit("cold").as("last_name"),
        to_date(lit("1961-01-01")).as("dob"),
        to_date(lit("2021-06-01")).as("collection_date")))
    val targetBig = spark.range(120).select(
      (col("id") + 5000L).as("case_id"),
      concat(lit("jo"), (col("id") % 60).cast("string")).as("first_name"),
      concat(lit("smi"), (col("id") % 40).cast("string")).as("last_name"),
      lit(null).cast("string").as("alt_first_name"),
      lit(null).cast("string").as("alt_last_name"),
      to_date(lit("1990-04-01")).as("dob"),
      to_date(lit("2021-06-03")).as("wdrs_collection"))
      .unionByName(spark.range(3).select(
        (col("id") + 9000L).as("case_id"), lit("ann").as("first_name"),
        lit("cold").as("last_name"),
        lit(null).cast("string").as("alt_first_name"),
        lit(null).cast("string").as("alt_last_name"),
        to_date(lit("1961-01-01")).as("dob"),
        to_date(lit("2021-06-03")).as("wdrs_collection")))
    def pairRows(df: org.apache.spark.sql.DataFrame) =
      df.select("rowid", "case_id", "distance")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val salted = FuzzyMatch.matchCandidates(cleanBig, targetBig,
      targetPairsPerBlock = 10000L)
    val unsalted = FuzzyMatch.matchCandidates(cleanBig, targetBig,
      autoSalt = false)
    val saltedPlan = salted.queryExecution.optimizedPlan.toString
    val unsaltedPlan = unsalted.queryExecution.optimizedPlan.toString
    assert(saltedPlan.contains("__rsalt"),
      "the default production path must plan the salted join on a " +
        "measured mega-block")
    assert(!unsaltedPlan.contains("__rsalt"),
      "autoSalt=false must keep the un-replicated plan")
    assert(pairRows(salted) === pairRows(unsalted) && pairRows(salted).nonEmpty,
      "salting moves replication, never the answer")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
  }

  test("AQE skew-join split activates on the hot birth-year block") {
    import graft.operators.FuzzyJoin
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // thresholds scaled to fixture bytes (the defaults are 256 MB —
      // cluster scale); broadcast disabled so the join shuffles both
      // sides, which is when skew-split applies
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = FuzzyJoin.blockedFuzzyJoin(
        skewLeft(20000), skewRight(400), "by", col("ln"), col("rn"), 2)
      // collect() drives THIS queryExecution (count() would spawn its
      // own, leaving df's adaptive plan unfinalized)
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot 1990 partition skewed:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

private object FuzzyMatchSpecHelper {
  /** Pair-identity rows of a fuzzyNameMatch result. */
  def nameRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("lid", "rid", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
}
