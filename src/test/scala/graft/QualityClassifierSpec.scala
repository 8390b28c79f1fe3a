package graft

import org.apache.spark.sql.Row
import graft.operators.TextAnalysis

/** t13 fixtures: the linear model's score DIRECTION per feature —
  * stopword-rich diverse prose outscores digit spam and punctuation
  * spam; each planted low-quality axis moves the score DOWN relative
  * to the clean control, and the verdict follows the threshold. */
class QualityClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private def score(rows: (Long, String)*): Map[Long, Row] =
    TextAnalysis.qualityClassifier(
      rows.toSeq.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "CAST(length(text) AS BIGINT) AS n_chars"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  // A clean control: long, stopword-rich, lexically diverse, no digits,
  // no punctuation spam.
  private val clean = (1 to 40)
    .map(i => s"the quick word$i of and to in that") // en markers + diversity
    .mkString(" ")

  test("digit spam scores below the clean control and fails the gate") {
    val spam = (1 to 320).map(i => (i % 7).toString).mkString(" ")
    val out = score(1L -> clean, 2L -> spam)
    assert(out(1L).getAs[Long]("score_micros") > out(2L).getAs[Long]("score_micros"))
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep"))
  }

  test("punctuation spam moves the score down") {
    val punct = clean + " " + Seq.fill(120)("!!! ... ;;; ,,,").mkString(" ")
    val out = score(1L -> clean, 2L -> punct)
    assert(out(2L).getAs[Long]("punct_ppm") > out(1L).getAs[Long]("punct_ppm"))
    assert(out(1L).getAs[Long]("score_micros") > out(2L).getAs[Long]("score_micros"))
  }

  test("repetitive low-diversity text scores below diverse text") {
    val loop = Seq.fill(300)("lorem ipsum").mkString(" ")
    val out = score(1L -> clean, 2L -> loop)
    assert(out(2L).getAs[Long]("distinct_ppm") < out(1L).getAs[Long]("distinct_ppm"))
    assert(out(1L).getAs[Long]("score_micros") > out(2L).getAs[Long]("score_micros"))
  }

  test("score is the exact literal dot product of the ppm features") {
    val out = score(1L -> clean)
    val r = out(1L)
    val expect = TextAnalysis.QcWLen * r.getAs[Long]("len_ppm") +
      TextAnalysis.QcWStop * r.getAs[Long]("stop_ppm") +
      TextAnalysis.QcWDistinct * r.getAs[Long]("distinct_ppm") +
      TextAnalysis.QcWPunct * r.getAs[Long]("punct_ppm") +
      TextAnalysis.QcWDigit * r.getAs[Long]("digit_ppm")
    assert(r.getAs[Long]("score_micros") == expect)
    assert(r.getAs[Boolean]("keep") ==
      (expect >= TextAnalysis.QcThreshold))
  }

  test("gated key splits the corpus non-trivially at the threshold") {
    val out = graft.Queries.production("t13_quality_classifier")(spark, sf001)
      .select("keep").collect().map(_.getBoolean(0))
    assert(out.nonEmpty)
    assert(out.exists(identity) && out.exists(!_),
      s"threshold ${TextAnalysis.QcThreshold} must split the corpus " +
        s"(got ${out.count(identity)}/${out.length} keeps)")
  }
}
