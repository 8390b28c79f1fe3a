package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Messy-string parsers re-expressing the reference's regex cleaning
  * (challenge.py:118-196) as pure Column expressions — codegen'd, no UDFs,
  * ANSI-safe (try_* where malformed input is possible), so a corrupted cell
  * yields null instead of failing the job (the reference's errors='coerce'
  * semantics).
  */
object Parse {

  /** Empty-string-safe cast: '' → null instead of an ANSI error. Callers
    * guard with rlike, so any non-empty value is cast-valid. */
  private def numCast(c: Column, t: String): Column = nullif(c, lit("")).cast(t)

  /** The reference's dollar-range collapse prepass (challenge.py:132,137):
    * `"$1.2–1.4 million"` → `"$1.4 million"` — everything from the first
    * `$` through the LAST dash not followed by a lowercase letter is
    * replaced by `$`, so a range keeps only its upper bound while suffix
    * forms like "million-ish" or "$3-day" survive untouched. The
    * reference's negative lookahead `(?![a-z])` is re-expressed RE2-safe
    * (DuckDB mirrors it verbatim) as `([^a-z]|$)` with the consumed
    * character re-emitted via the capture group — greedy `.*` picks the
    * same last-qualifying-dash in both engines. */
  def collapseDollarRange(c: Column): Column =
    regexp_replace(c, "\\$.*[-—–]([^a-z]|$)", "\\$$1")

  /** The reference's list-cell flatten (challenge.py:131: `' '.join(x) if
    * type(x) == list`): pandas object columns mix str and list cells; the
    * typed-engine equivalent surface is an array<string> column joined on
    * a space before parsing. */
  def flattenCell(c: Column): Column = array_join(c, " ")

  /** Money strings → double dollars (challenge.py:118-134 parse_dollars).
    * Handles "$12.3 million", "$1.2 billion", "$1,234,567". CASE order
    * replaces the reference's negative lookahead (RE2-safe for oracles).
    * Callers on messy input apply [[collapseDollarRange]] first, as the
    * reference does before every extract. */
  def parseDollars(c: Column): Column = {
    val million = "(?i)^\\$\\s*(\\d+\\.?\\d*)\\s*milli?on"
    val billion = "(?i)^\\$\\s*(\\d+\\.?\\d*)\\s*billi?on"
    val plain   = "^\\$\\s*(\\d{1,3}(?:[,\\.]\\d{3})+)"
    when(c.rlike(million),
      numCast(regexp_extract(c, million, 1), "double") * lit(1000000.0d))
    .when(c.rlike(billion),
      numCast(regexp_extract(c, billion, 1), "double") * lit(1000000000.0d))
    .when(c.rlike(plain),
      numCast(regexp_replace(regexp_extract(c, plain, 1), "[,\\.]", ""), "double"))
    .otherwise(lit(null).cast("double"))
  }

  /** Multi-format date parse with fallback chain (challenge.py:139-143):
    * "September 5, 1997" | "1997/09/05" | "September 1997" | "1997".
    */
  def parseMultiDate(c: Column): Column =
    coalesce(
      to_date(try_to_timestamp(c, lit("MMMM d, yyyy"))),
      to_date(try_to_timestamp(c, lit("yyyy/MM/dd"))),
      to_date(try_to_timestamp(c, lit("MMMM yyyy"))),
      to_date(try_to_timestamp(c, lit("yyyy"))))

  /** Running-time strings → minutes (challenge.py:186-196):
    * "2h 15m" / "2 hr" forms and bare "135 m" forms.
    */
  def parseRuntime(c: Column): Column = {
    val hourForm = "^(\\d+)\\s*h(?:ou)?r?s?\\s*(\\d*)"
    val minForm  = "^(\\d+)\\s*m"
    when(c.rlike(hourForm),
      numCast(regexp_extract(c, hourForm, 1), "bigint") * 60 +
        coalesce(numCast(regexp_extract(c, hourForm, 2), "bigint"), lit(0L)))
    .when(c.rlike(minForm), numCast(regexp_extract(c, minForm, 1), "bigint"))
    .otherwise(lit(null).cast("bigint"))
  }

  /** Exact-decimal sum of a money-ish double column, emitted as double:
    * per-row cast to DECIMAL(18,2) is deterministic (same IEEE input both
    * engines), and the decimal sum is order-independent — so the result is
    * bit-identical across engines regardless of partitioning. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Order-stable average: exact decimal sum / count, rounded. */
  def davg(c: Column, scale: Int = 6): Column =
    round(sum(c.cast(DecimalType(18, 2))).cast("double") / count(c), scale)

  /** Discounted price in EXACT decimal arithmetic: price and discount are
    * 2dp values, so casting each to decimal first and multiplying as
    * decimals avoids the double-product-at-rounding-boundary ambiguity
    * that a post-hoc cast of `p*(1-d)` hits (half-up vs half-even). */
  def discPrice(p: Column, d: Column): Column =
    p.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - d.cast(DecimalType(18, 2)))

  /** Sum of an already-exact decimal column, emitted as double. */
  def dsumDec(c: Column): Column = sum(c).cast("double")
}
