package graft

import org.apache.spark.sql.functions._
import graft.functions.Parse

/** Exhaustive table-driven parser coverage (one Spark job per family —
  * all cases go through a single DataFrame pass). */
class ParseExhaustiveSpec extends SparkSpecBase {
  import spark.implicits._

  test("parseRuntime: every h/m combination 0-23h x 0-59m plus bare forms") {
    val hm = for (h <- 0 to 23; m <- 0 to 59)
      yield (s"${h}h ${m}m", h * 60L + m)
    val bareH = (0 to 23).map(h => (s"$h hr", h * 60L))
    val bareM = (0 to 300 by 7).map(m => (s"$m m", m.toLong))
    val cases = hm ++ bareH ++ bareM
    val bad = cases.toDF("raw", "want")
      .select(Parse.parseRuntime(col("raw")).as("got"), col("want"))
      .filter(col("got").isNull || col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("parseDollars: million/billion with 0-2 decimals and grouped plain amounts") {
    val mm = for (i <- 0 to 99; f <- Seq("", ".5", ".25"))
      yield (s"$$$i$f million", s"$i$f".toDouble * 1e6)
    val bb = for (i <- 0 to 9; f <- Seq("", ".75"))
      yield (s"$$$i$f billion", s"$i$f".toDouble * 1e9)
    val plain = Seq(1234567L, 22333444L, 999000L).map(v =>
      (f"$$$v%,d", v.toDouble))
    val cases = mm ++ bb ++ plain
    val bad = cases.toDF("raw", "want")
      .select(Parse.parseDollars(col("raw")).as("got"), col("want"))
      .filter(col("got").isNull || col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("collapseDollarRange: range cells keep the upper bound, lowercase suffixes survive") {
    // (input, expected parse after collapse; null = must NOT parse)
    val cases: Seq[(String, java.lang.Double)] = Seq(
      ("$1.2–1.4 million", 1.4e6),           // en dash (challenge.py:132)
      ("$1.2—1.4 million", 1.4e6),           // em dash
      ("$1.2-1.4 million", 1.4e6),           // hyphen
      ("$104.5-117 million", 1.17e8),        // upper bound wins, not lower
      ("$1-2-3 million", 3.0e6),             // greedy: LAST qualifying dash
      ("$42–1,234,567", 1234567.0),          // range over a grouped plain
      ("$5–", null),                         // dash at end-of-string collapses
      ("$2.5 million-ish", 2.5e6),           // dash before lowercase untouched
      ("$42–2.5 million-ish", 2.5e6),        // range + suffix together
      ("$3-day rental", null)                // no collapse, and no money form
    )
    val got = cases.map(_._1).toDF("raw")
      .select(col("raw"),
        Parse.parseDollars(Parse.collapseDollarRange(col("raw"))).as("got"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
    for ((raw, want) <- cases) assert(got(raw) == want, s"case: $raw")
  }

  test("flattenCell: list cells join on a space before the parse chain (challenge.py:131)") {
    val parsed = Seq(Seq("$1.2–1.4", "million"), Seq("$1,234,567"))
      .toDF("cell")
      .select(Parse.parseDollars(
        Parse.collapseDollarRange(Parse.flattenCell(col("cell")))).as("got"))
      .collect().map(_.getDouble(0)).toSeq
    assert(parsed == Seq(1.4e6, 1234567.0))
  }

  test("parseMultiDate: every day of a year through the full-date format") {
    val days = (0 until 365).map { off =>
      java.time.LocalDate.of(2001, 1, 1).plusDays(off)
    }
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("MMMM d, yyyy", java.util.Locale.US)
    val cases = days.map(d => (d.format(fmt), java.sql.Date.valueOf(d)))
    val bad = cases.toDF("raw", "want")
      .select(Parse.parseMultiDate(col("raw")).as("got"), col("want"))
      .filter(col("got").isNull || col("got") =!= col("want")).count()
    assert(bad == 0)
  }
}
