package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** t14 fixtures: the C4 line rules on hand-computable geometry — rule
  * precedence (blocklist beats unterminated beats short), the planted
  * blocklist token, CONTENT-driven policy hits on real tokens, the
  * ≥3-kept-lines doc keep threshold, and the cleaned-text rebuild. */
class BoilerplateFilterSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, Row] =
    TextAnalysis.boilerplateFilter(rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  private def toks(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("null text renders zero lines, not a bogus descending pair") {
    // The spec entry is public over arbitrary frames: a null text gives
    // a null token array (n = null), where an unguarded
    // sequence(0, -1) would render [0,-1] — two phantom lines.
    val r = run(3L -> null.asInstanceOf[String])(3L)
    assert(r.getAs[Long]("n_lines") == 0L)
    assert(r.getAs[Long]("n_kept") == 0L)
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[String]("cleaned_text") == "")
  }

  test("doc 0 (len 4): policy line counted once, tails short, no keeps") {
    // i=0: (0+0)%7=0 policy (and %3=0 unterminated — precedence: policy);
    // i=1,2: terminated but 4 tokens < 5 → short; i=3: %3=0 unterminated.
    val r = run(0L -> toks(16))(0L)
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Long]("n_policy") == 1L)
    assert(r.getAs[Long]("n_unterminated") == 1L)
    assert(r.getAs[Long]("n_short") == 2L)
    assert(r.getAs[Long]("n_kept") == 0L)
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[String]("cleaned_text") == "")
  }

  test("doc 1 (len 5): two 5-token terminated lines keep, below doc gate") {
    val r = run(1L -> toks(15))(1L)
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[Long]("n_unterminated") == 1L) // i=2: (1+2)%3=0
    assert(!r.getAs[Boolean]("keep"))             // 2 < BpMinLines
    assert(r.getAs[String]("cleaned_text") ==
      "w1 w2 w3 w4 w5.\nw6 w7 w8 w9 w10.")
  }

  test("doc 1 with 25 tokens: 4 kept lines pass the doc gate") {
    val r = run(1L -> toks(25))(1L)
    assert(r.getAs[Long]("n_lines") == 5L)
    assert(r.getAs[Long]("n_kept") == 4L)
    assert(r.getAs[Boolean]("keep"))
    assert(r.getAs[String]("cleaned_text").linesIterator.size == 4)
  }

  test("content rule: a real token containing a blocklist word drops") {
    // doc 1, len 5, no plant on i=0 — 'cookie' arrives as corpus content.
    val r = run(1L -> "this cookie banner must go away now ok yes sure")(1L)
    assert(r.getAs[Long]("n_policy") == 1L)
    assert(r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[String]("cleaned_text") == "away now ok yes sure.")
  }

  test("plant cycles the blocklist: docs 7 and 14 plant cookie / lorem") {
    // i=0 of doc 7: (7+0)%7=0, %21=7 → 'cookie'; doc 14: %21=14 → 'lorem'.
    // Both lines are policy-dropped; the hit proves which word landed.
    for (id <- Seq(7L, 14L)) {
      val r = run(id -> toks(30))(id)
      assert(r.getAs[Long]("n_policy") >= 1L, s"doc $id")
    }
    // Direct render check via the rule counts of a doc whose ONLY
    // blocklist exposure is the plant (synthetic tokens w1..wN).
    val r7 = run(7L -> toks(12))(7L) // len 6 → 2 lines, plant on i=0
    assert(r7.getAs[Long]("n_policy") == 1L)
  }

  test("gated key: one row per document, audit counts are consistent") {
    val out = Queries.production("t14_boilerplate_filter")(spark, sf001).collect()
    val nDocs = Tables.documents(spark, sf001).count()
    assert(out.length.toLong == nDocs)
    for (r <- out) {
      val parts = r.getAs[Long]("n_kept") + r.getAs[Long]("n_policy") +
        r.getAs[Long]("n_unterminated") + r.getAs[Long]("n_short")
      assert(parts == r.getAs[Long]("n_lines"), s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("n_kept") >= TextAnalysis.BpMinLines.toLong))
    }
  }
}
