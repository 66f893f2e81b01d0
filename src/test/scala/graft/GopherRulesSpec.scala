package graft

import graft.functions.GopherRules
import org.apache.spark.sql.functions._

/** Gopher quality-rule battery: each rule flips on its own trigger and
  * the composed keep is the AND of all rules. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodDoc = (("the data that we have to work with and the " +
    "methods be used of late ") * 4).trim // 60 words, stop-rich, clean

  private def flagsOf(text: String): Map[String, Boolean] = {
    val row = GopherRules.withGopherFlags(
      Seq((1L, text)).toDF("doc_id", "t"), "t").drop("t").collect().head
    val schema = row.schema.fieldNames
    schema.zipWithIndex.collect {
      case (n, i) if n.startsWith("flag_") || n == "gopher_keep" =>
        n -> row.getBoolean(i)
    }.toMap
  }

  test("a clean stop-word-rich doc passes every rule") {
    val f = flagsOf(goodDoc)
    assert(f.values.forall(identity), s"unexpected failures: $f")
  }

  test("each rule fails on its own trigger, others unaffected") {
    assert(!flagsOf("too few words here")("flag_word_count"))
    assert(!flagsOf(goodDoc + " " + "# " * 30)("flag_symbol_ratio"))
    // each symbol's ratio trips the rule on its own (the paper tests
    // '#' and '...' separately, not pooled)
    assert(!flagsOf(goodDoc + " " + "... " * 30)("flag_symbol_ratio"))
    // bullet rule: paper threshold is MOSTLY-bullets (>90% of lines) —
    // a 2-bullet preamble passes, a 10-of-11-bullet-lines doc fails
    assert(flagsOf("- b1\n- b2\n" + goodDoc)("flag_bullet_lines"))
    assert(!flagsOf("- b\n" * 10 + goodDoc)("flag_bullet_lines"))
    assert(!flagsOf(goodDoc + "\nhmm...\nmore...")("flag_ellipsis_lines"))
    assert(!flagsOf(goodDoc + " " + "99 " * 40)("flag_alpha_words"))
    assert(!flagsOf(("lorem ipsum dolor sit amet " * 12).trim)("flag_stop_words"))
    // a supercalifragilistic vocabulary blows the mean-word-length cap
    assert(!flagsOf(("extraordinarily incomprehensible " * 30).trim)("flag_mean_word_len"))
  }

  test("null text fails everything, keep included") {
    val f = flagsOf(null)
    assert(f.values.forall(v => !v))
  }

  test("gopher_keep is the AND of the individual flags") {
    val df = GopherRules.withGopherFlags(
      Seq((1L, goodDoc), (2L, "- x\n" + goodDoc), (3L, "tiny"))
        .toDF("doc_id", "t"), "t")
    df.collect().foreach { r =>
      val flags = r.schema.fieldNames.filter(_.startsWith("flag_"))
        .map(n => r.getBoolean(r.fieldIndex(n)))
      assert(r.getBoolean(r.fieldIndex("gopher_keep")) === flags.forall(identity))
    }
  }
}
