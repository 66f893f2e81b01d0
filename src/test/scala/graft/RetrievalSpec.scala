package graft

import graft.operators.{Bm25, RepeatedSpans}
import org.apache.spark.sql.functions._

/** Repeated-substring span detection and BM25 lexical retrieval. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- RepeatedSpans
  test("repeatedSpans finds a shifted copy that chunk alignment would miss") {
    // doc 2 embeds doc 1's 6-token phrase at offset 2 — no chunk boundary
    // alignment, but every 4-token window inside the phrase repeats.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro words alpha beta gamma delta epsilon zeta trailing"))
      .toDF("doc_id", "text")
    val spans = RepeatedSpans.repeatedSpans(docs, "text", "doc_id",
        windowTokens = 4, minDf = 2)
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: windows 0,1,2 all repeated -> one span [0, 6)
    assert(spans(1L) === ((0, 6, 3L)))
    // doc 2: windows at 2,3,4 repeated -> span [2, 8)
    assert(spans(2L) === ((2, 8, 3L)))
  }

  test("repeatedSpans merges adjacent-but-not-overlapping runs, splits real gaps") {
    // shared prefix and shared suffix with a long unique middle in BOTH
    // docs -> two separate islands each, not one merged span.
    val shared1 = "one two three four"
    val shared2 = "nine ten eleven twelve"
    val docs = Seq(
      (1L, s"$shared1 uniqA uniqB uniqC uniqD uniqE $shared2"),
      (2L, s"$shared1 otherA otherB otherC otherD otherE $shared2"))
      .toDF("doc_id", "text")
    val spans = RepeatedSpans.repeatedSpans(docs, "text", "doc_id",
        windowTokens = 4, minDf = 2)
      .as[(Long, Int, Int, Long)].collect()
    assert(spans.count(_._1 == 1L) === 2)
    assert(spans.count(_._1 == 2L) === 2)
    val doc1 = spans.filter(_._1 == 1L).map(s => (s._2, s._3)).sorted
    assert(doc1 === Seq((0, 4), (9, 13)))
  }

  test("repeatedSpans honors minDf above two") {
    val shared = "alpha beta gamma delta"
    val docs = Seq(
      (1L, s"$shared one fill"), (2L, s"$shared two fill"),
      (3L, s"$shared three fill")).toDF("doc_id", "text")
    // the 4-token window appears in 3 docs: present at minDf=3,
    // absent at minDf=4
    assert(RepeatedSpans.repeatedSpans(docs, "text", "doc_id",
      windowTokens = 4, minDf = 3).count() === 3L)
    assert(RepeatedSpans.repeatedSpans(docs, "text", "doc_id",
      windowTokens = 4, minDf = 4).count() === 0L)
  }

  test("repeatedSpans: no spans when nothing repeats") {
    val docs = Seq(
      (1L, "aa bb cc dd ee"),
      (2L, "ff gg hh ii jj"))
      .toDF("doc_id", "text")
    assert(RepeatedSpans.repeatedSpans(docs, "text", "doc_id",
      windowTokens = 3, minDf = 2).count() === 0L)
  }

  test("repeatedSpans invariants on real data: disjoint, in-bounds, window-covered") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val spans = RepeatedSpans.repeatedSpans(docs, "text", "doc_id",
        windowTokens = 20, minDf = 2)
      .as[(Long, Int, Int, Long)].collect()
    assert(spans.nonEmpty) // the near-dup cliques guarantee repeats
    val lens = docs.select($"doc_id",
      org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { s =>
        assert(s._2 >= 0 && s._3 <= lens(id), s"span out of bounds: $s")
        assert(s._3 - s._2 >= 20, s"span shorter than one window: $s")
      }
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._2 > a._3, s"overlapping spans for doc $id: $a, $b")
      }
    }
  }

  // --------------------------------------------------- Bm25
  test("bm25 ranks term-dense short docs first, omits non-matching docs") {
    val docs = Seq(
      (1L, "spark spark spark"),                      // dense in the query term
      (2L, "spark and a lot of other words making this document much longer"),
      (3L, "nothing relevant here at all"))
      .toDF("doc_id", "text")
    val out = Bm25.topK(docs, "text", "doc_id", Seq("spark"), k = 10)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L))   // 3 omitted, 1 beats 2
    assert(out(0)._2 > out(1)._2)
  }

  test("bm25 idf: rarer terms dominate the score") {
    // "rare" appears in 1 of 4 docs, "common" in all 4. A doc matching
    // only "rare" must outscore a doc matching only "common".
    val docs = Seq(
      (1L, "rare word doc"),
      (2L, "common filler text"),
      (3L, "common words here"),
      (4L, "common again common"))
      .toDF("doc_id", "text")
    val scores = Bm25.score(docs, "text", "doc_id", Seq("rare", "common"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L))
  }

  test("bm25 scores are partitioning-invariant") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Bm25.score(docs, "text", "doc_id", Seq("join", "merge"))
      .as[(Long, Double)].collect().toSet
    val b = Bm25.score(docs.repartition(7), "text", "doc_id", Seq("join", "merge"))
      .as[(Long, Double)].collect().toSet
    assert(a === b)
  }

  test("bm25 topK tiebreak is deterministic on equal rounded scores") {
    // two identical docs -> identical scores; id ascending breaks the tie
    val docs = Seq(
      (7L, "term one two"), (3L, "term one two"))
      .toDF("doc_id", "text")
    val out = Bm25.topK(docs, "text", "doc_id", Seq("term"), k = 2)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(3L, 7L))
    assert(out(0)._2 === out(1)._2)
  }
}
