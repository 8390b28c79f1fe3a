package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** t12 fixtures: the first-in-doc rule on planted shapes — loop-spam
  * collapses to one copy, a legitimate short refrain survives (its
  * 8-token contexts differ), overlapping repeat windows union their
  * removed positions, and short docs pass through untouched. */
class RepeatRemoveSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, Row] =
    TextAnalysis.repeatRemove(spark, rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("loop-spam: a self-repeated block collapses to the first copy") {
    val block = (1 to 8).map(i => s"w$i").mkString(" ")
    val out = run(1L -> s"$block $block $block")
    val r = out(1L)
    assert(r.getAs[String]("cleaned_text") == block)
    assert(r.getAs[Long]("n_tokens") == 24L)
    assert(r.getAs[Long]("n_removed") == 16L)
    // windows 8..16 all repeat window 0 (and each other): 9 repeats
    assert(r.getAs[Long]("n_repeat_windows") == 9L)
  }

  test("legitimate refrain: short phrase in fresh contexts is kept whole") {
    // "the quick fox" appears twice, but no 8-token window repeats.
    val text = "the quick fox ran a1 b1 c1 d1 e1 f1 the quick fox sat a2 b2 c2 d2 e2 f2"
    val r = run(1L -> text)(1L)
    assert(r.getAs[Long]("n_removed") == 0L)
    assert(r.getAs[Long]("n_repeat_windows") == 0L)
    assert(r.getAs[String]("cleaned_text") == text)
  }

  test("token run: overlapping repeat windows union to all-but-first-window") {
    val r = run(1L -> Seq.fill(20)("a").mkString(" "))(1L)
    // windows at 0..12 share one fingerprint; 1..12 are repeats, their
    // [i, i+8) cover positions 1..19 — only position 0 survives.
    assert(r.getAs[String]("cleaned_text") == "a")
    assert(r.getAs[Long]("n_removed") == 19L)
    assert(r.getAs[Long]("n_repeat_windows") == 12L)
  }

  test("short docs (< window) pass through untouched") {
    val r = run(1L -> "only five tokens right here")(1L)
    assert(r.getAs[String]("cleaned_text") == "only five tokens right here")
    assert(r.getAs[Long]("n_removed") == 0L)
    assert(r.getAs[Long]("n_repeat_windows") == 0L)
  }

  test("gated key: %3 docs shrink back to their original token count") {
    val out = graft.Queries.production("t12_repeat_removal")(spark, sf001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf001)
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, n) <- docs) {
      val r = out(id)
      if (id % 3 == 0 && n >= TextAnalysis.RepeatWindow) {
        // self-append: every window of the second copy repeats, so the
        // cleanup strips at least the appended copy's length.
        assert(r.getAs[Long]("n_tokens") == 2L * n, s"doc $id")
        assert(r.getAs[Long]("n_removed") >= n, s"doc $id")
      } else if (id % 3 != 0) {
        assert(r.getAs[Long]("n_tokens") == n.toLong, s"doc $id")
      }
    }
  }
}
