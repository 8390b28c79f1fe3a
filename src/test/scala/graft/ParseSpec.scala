package graft

import org.apache.spark.sql.functions._
import graft.functions.Parse

/** Unit semantics of the messy-string parsers on literal inputs, mirroring
  * the reference's cases (challenge.py:102-125,168-196). */
class ParseSpec extends SparkSpecBase {

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect()(0).getAs[T]("v")
  }

  test("parseDollars: $12.3 million") {
    assert(one[Double](Parse.parseDollars(lit("$12.3 million"))) == 12300000.0)
  }
  test("parseDollars: $1.2 billion") {
    assert(one[Double](Parse.parseDollars(lit("$1.2 billion"))) == 1200000000.0)
  }
  test("parseDollars: $1,234,567 with separators") {
    assert(one[Double](Parse.parseDollars(lit("$1,234,567"))) == 1234567.0)
  }
  test("parseDollars: garbage yields null") {
    import spark.implicits._
    assert(Seq("N/A", "about twelve", "").toDF("s")
      .select(Parse.parseDollars(col("s")).as("v"))
      .filter(col("v").isNotNull).count() == 0)
  }
  test("parseMultiDate: all four reference formats") {
    val cases = Map(
      "September 5, 1997" -> "1997-09-05",
      "1997/09/05"        -> "1997-09-05",
      "September 1997"    -> "1997-09-01",
      "1997"              -> "1997-01-01")
    cases.foreach { case (in, want) =>
      assert(one[java.sql.Date](Parse.parseMultiDate(lit(in))).toString == want, in)
    }
  }
  test("parseRuntime: hour+minute, bare-hour, bare-minute forms") {
    assert(one[Long](Parse.parseRuntime(lit("2h 15m"))) == 135L)
    assert(one[Long](Parse.parseRuntime(lit("2 hr"))) == 120L)
    assert(one[Long](Parse.parseRuntime(lit("135 m"))) == 135L)
  }
}
