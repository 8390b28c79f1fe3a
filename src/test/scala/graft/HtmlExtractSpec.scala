package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** t09 semantics on hand-built adversarial markup — the failure shapes
  * of naive strippers, asserted field-exact:
  *
  *  - `<` / `&&` inside a script body (a bare tag regex would eat from
  *    the `<` to the next `>` across real content);
  *  - tags inside an HTML comment (must vanish with the comment, not be
  *    counted as stripped tags);
  *  - entities inside DROPPED blocks (must not count as decoded);
  *  - `&lt;tag&gt;` in kept content (must decode to a literal `<tag>`
  *    AFTER tag stripping — decoding first would strip it as markup);
  *  - unknown entities (left verbatim, uncounted);
  *  - whitespace collapse across element boundaries.
  */
class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(html: String) =
    TextAnalysis.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .collect()(0)

  test("adversarial markup: blocks, hostile script, comment-hidden tags, entity ordering") {
    val html =
      """<html><head><style>p { color: red; }</style></head>
        |<body><nav>skip &gt; this</nav>
        |<p>Hello &lt;world&gt; &amp; friends</p>
        |<script>if (a < b && b > c) { alert("x"); }</script>
        |<!-- <p>ghost</p> -->
        |<div><span>nested   text</span></div>
        |<p>&bogus; stays</p>
        |</body></html>""".stripMargin
    val r = one(html)
    assert(r.getAs[Long]("n_blocks") == 4L) // style, nav, script, comment
    // html head /head body p /p div span /span /div p /p /body /html
    assert(r.getAs[Long]("n_tags") == 14L)
    // &lt; &gt; &amp; in kept content; nav's &gt; is gone, &bogus; unknown
    assert(r.getAs[Long]("n_entities") == 3L)
    assert(r.getAs[String]("text_clean") ==
      "Hello <world> & friends nested text &bogus; stays")
    assert(r.getAs[Long]("n_chars_raw") == html.length.toLong)
    assert(r.getAs[Long]("n_chars_clean") ==
      r.getAs[String]("text_clean").length.toLong)
  }

  test("markup-free text passes through: only whitespace normalization applies") {
    val r = one("  plain\ttext  with   gaps\n")
    assert(r.getAs[Long]("n_blocks") == 0L)
    assert(r.getAs[Long]("n_tags") == 0L)
    assert(r.getAs[Long]("n_entities") == 0L)
    assert(r.getAs[String]("text_clean") == "plain text with gaps")
  }

  test("generated pages round-trip: title/header/body text survive, boilerplate does not") {
    val out = Queries.production("t09_html_extract")(spark, sf001)
    val docs = Tables.documents(spark, sf001).count()
    assert(out.count() == docs)
    val r = out.orderBy("doc_id").collect()(0)
    val clean = r.getAs[String]("text_clean")
    assert(clean.startsWith("Doc 0 — src0 Document 0 "),
      s"title+h1 must survive the strip, got: ${clean.take(60)}")
    assert(!clean.contains("Home") && !clean.contains("contributors") &&
      !clean.contains("Related"), "nav/footer/aside content must be dropped")
    assert(!clean.contains("<") || clean.contains("&"),
      "no markup may survive")
    // every generated page drops the same six boilerplate blocks and
    // carries seven counted refs in kept content: named &mdash; &amp;
    // &nbsp; plus numeric &#8212; &#47; &#x2605; and the out-of-range
    // &#1114112; (counted as attempted, left literal; &#xzz; never
    // matches the pattern)
    assert(out.filter(col("n_blocks") =!= 6 || col("n_entities") =!= 7)
      .count() == 0)
    assert(clean.contains("— rated 4/5 ★ (&#1114112;&#xzz; stay literal)"),
      s"numeric refs must decode (valid) or stay literal (invalid/malformed), got: $clean")
  }

  test("numeric refs: decimal/hex/supplementary decode; zero, surrogate, out-of-range, malformed stay literal") {
    val html = "<p>A&#66;C &#x2605; pile&#128169; nl&#10;x " +
      "&#0; &#55296; &#1114112; &#xzz; &#99999999; &amp;#60;</p>"
    val r = one(html)
    // &amp;#60; proves no double decode: the numeric pass runs BEFORE
    // the named table, so the '&#60;' exposed by &amp; stays literal.
    assert(r.getAs[String]("text_clean") ==
      "ABC ★ pile💩 nl x &#0; &#55296; &#1114112; &#xzz; &#99999999; &#60;")
    // counted: 7 numeric-SHAPED refs (incl. the 3 invalid-code-point
    // ones) + named &amp;; NOT counted: &#xzz; (no digits) and
    // &#99999999; (8 digits — overlong, never matches)
    assert(r.getAs[Long]("n_entities") == 8L)
  }

  test("t09 production plan is one map-side pass: no exchange, no sort, no join") {
    val plan = Queries.production("t09_html_extract")(spark, sf001)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      case s: org.apache.spark.sql.execution.SortExec => s
      case j if j.nodeName.toLowerCase.contains("join") => j
    }
    assert(bad.isEmpty, s"t09 must stay map-only, found: ${bad.map(_.nodeName)}")
  }
}
