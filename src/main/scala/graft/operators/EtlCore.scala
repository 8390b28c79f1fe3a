package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Parse

/** Core relational/ETL operators — the reference's capability surface
  * (challenge.py) re-expressed as declarative Spark plans over the
  * TPC-H-ish tables. Each method is one SURVEY.md §2.A row.
  *
  * Numeric policy (cross-engine determinism): money aggregates go through
  * [[Parse.dsum]]/[[Parse.davg]] (exact decimal sum → double) so results
  * do not depend on partitioning/summation order; raw per-row doubles are
  * emitted untouched (IEEE ops are deterministic given identical inputs).
  *
  * Ordering policy: plans here are production plans — NO canonical output
  * sort (a global sort of a fact table is pure overhead at 100 TB). The
  * only sorts kept are semantic top-N (q03), which collapse to
  * TakeOrderedAndProject. [[graft.Queries.verified]] adds a deterministic
  * order for the oracle compare.
  */
object EtlCore {

  /** q01: groupBy + multi-aggregate (TPC-H Q1 shape; the reference's
    * ratings-histogram aggregation, challenge.py:288). */
  def q01Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1998-09-03").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Parse.dsum(col("l_quantity")).as("sum_qty"),
        Parse.dsum(col("l_extendedprice")).as("sum_base_price"),
        Parse.dsumDec(Parse.discPrice(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        Parse.davg(col("l_quantity")).as("avg_qty"),
        Parse.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q02: filter + projection; predicate and column pruning must reach the
    * parquet scan (the reference's adult=='False' filter, challenge.py:202). */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("o_date"))

  /** q03: 3-way join + agg + top-N (TPC-H Q3 shape; the reference's
    * wiki⋈kaggle merge, challenge.py:252). Customer side is filtered before
    * the join so the shuffle moves only matching rows. */
  def q03JoinAgg(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp")
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_date"))
      .agg(Parse.dsumDec(Parse.discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(20)
      .select("l_orderkey", "revenue", "o_date")
  }

  /** q04: star join against broadcast dims (nation, region). */
  def q04BroadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), Parse.davg(col("c_acctbal")).as("avg_bal"))

  /** q05: deterministic keep-first dedup by key (the reference's
    * drop_duplicates(subset='imdb_id'), challenge.py:106 — made
    * order-stable with an explicit tie-break). Implemented as
    * min(struct(orderKeys...)) — a partial-aggregatable hash agg (map-side
    * combine, no per-group sort), unlike the row_number window form which
    * total-sorts every partition at scale. */
  def q05DedupKey(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("f"))
      .select(col("o_custkey"), col("f.o_orderkey").as("o_orderkey"),
        to_date(col("f.o_orderdate")).as("first_date"))

  /** q06: regex extraction from messy strings (the reference's imdb-id
    * extract, challenge.py:105). Guarded cast: no-match → null, not error. */
  def q06RegexExtract(s: SparkSession, d: String): DataFrame = {
    val pat = "\"k\":\\s*(\\d+)"
    val raw = regexp_extract(col("props"), pat, 1)
    Tables.eventsWithTs(s, d)
      .select(when(raw =!= "", raw.cast("int")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
  }

  /** Deterministic money-string construction shared by q07/q19: formats a
    * bigint dollar amount in one of the reference's observed shapes, keyed
    * by `k % 4` (pure integer string ops — identical in any engine). */
  private def moneyString(m: Column, k: Column): Column =
    when(k % 4 === 0,
      concat(lit("$"), floor(m / 100).cast("string"), lit("."),
        lpad((m % 100).cast("string"), 2, "0"), lit(" million")))
    .when(k % 4 === 1,
      concat(lit("$"), floor(m / 1000).cast("string"), lit("."),
        lpad((m % 1000).cast("string"), 3, "0"), lit(" billion")))
    .when(k % 4 === 2, concat(lit("$"), format_number(m, 0)))
    .otherwise(lit("N/A"))

  /** q07: money-string parsing (challenge.py:118-134). Strings are built
    * deterministically from order totals — including the reference's two
    * messy shapes: dash-RANGE cells ("$42–1234.56 million", en/em/hyphen
    * by key) that challenge.py:132's collapse prepass reduces to the upper
    * bound, lowercase-suffix cells ("…million-ish") the collapse must NOT
    * touch, and list cells (exercised as split → [[Parse.flattenCell]],
    * the typed equivalent of :131's `' '.join`) — then parsed back with
    * collapse → [[Parse.parseDollars]]. */
  def q07ParseDollars(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val dash = when(k % 3 === 0, lit("-"))
      .when(k % 3 === 1, lit("–")).otherwise(lit("—"))
    val ranged = when(k % 5 === 0 && col("raw0") =!= "N/A",
      concat(lit("$"), (col("m") % 97).cast("string"), dash,
        col("raw0").substr(lit(2), length(col("raw0")))))
      .otherwise(col("raw0"))
    Tables.orders(s, d)
      .withColumn("m", floor(col("o_totalprice")).cast("bigint"))
      .withColumn("raw0", moneyString(col("m"), k))
      .withColumn("raw",
        concat(ranged, when(k % 11 === 0 && col("raw0") =!= "N/A",
          lit("-ish")).otherwise(lit(""))))
      // list-cell round trip: the raw cell as an array of fragments,
      // flattened back before the collapse+parse chain (challenge.py:131)
      .withColumn("cell", split(col("raw"), " "))
      .select(col("o_orderkey"), col("raw"),
        Parse.parseDollars(
          Parse.collapseDollarRange(Parse.flattenCell(col("cell"))))
          .as("dollars"))
  }

  /** q08: multi-format date parsing with fallback chain
    * (challenge.py:139-143). */
  def q08MultiDate(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey") % 4
    val raw =
      when(k === 0, date_format(col("o_orderdate"), "MMMM d, yyyy"))
      .when(k === 1, date_format(col("o_orderdate"), "yyyy/MM/dd"))
      .when(k === 2, date_format(col("o_orderdate"), "MMMM yyyy"))
      .otherwise(date_format(col("o_orderdate"), "yyyy"))
    Tables.orders(s, d)
      .withColumn("raw", raw)
      .select(col("o_orderkey"), col("raw"), Parse.parseMultiDate(col("raw")).as("parsed"))
  }

  /** q09: per-column null-ratio profile — the decision input for the
    * reference's ">90% NaN → drop column" rule (challenge.py:110-115).
    * Delegates to [[NullPrune.profile]] (one aggregation pass, long-form);
    * [[NullPrune.prune]] applies the drop end-to-end (spec-tested). */
  def q09NullPrune(s: SparkSession, d: String): DataFrame =
    NullPrune.profile(Tables.documents(s, d)
      .select(nullif(col("lang"), lit("zh")).as("lang2"),
        nullif(col("source"), lit("src3")).as("src2"),
        col("text")))

  /** q10: groupBy + pivot with explicit value list (no extra distinct
    * pass) + fillna(0) — the reference's ratings pivot
    * (challenge.py:288-296). */
  def q10Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .count()
      .na.fill(0L)
      .select(col("o_custkey"), col("O").as("n_open"), col("F").as("n_filled"),
        col("P").as("n_partial"))

  /** q11: join + fill-missing-from-other-source — the reference's
    * fill_missing_kaggle_data (challenge.py:256-262): zero/null on the
    * preferred side falls back to the secondary side. */
  def q11CoalesceFill(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy("o_custkey").agg(Parse.dsum(col("o_totalprice")).as("spend"))
    Tables.customer(s, d)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("spend"),
        round(coalesce(nullif(col("spend"), lit(0.0)), col("c_acctbal")), 2)
          .as("effective_value"))
  }

  /** q12: window rank top-N per group. */
  def q12WindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  /** q13: CASE-WHEN conditional aggregation (the reference's boolean
    * coercions, challenge.py:206). */
  def q13ConditionalAgg(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 2)
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("l_returnflag") === "R", col("l_extendedprice").cast(dec))
          .otherwise(lit(0).cast(dec))).cast("double").as("returned_value"),
        count(when(col("l_quantity") >= 30, lit(1))).as("high_qty_cnt"),
        count(lit(1)).as("n"))
  }

  /** q14: semi/anti key-presence split — the reference's key-presence
    * filters ('Director' in movie, challenge.py:46-49). One scan of each
    * table: orders is reduced to distinct keys (map-side partial), then a
    * single left join classifies every customer as with/without orders —
    * half the I/O of running a left-semi and a left-anti separately. */
  def q14SemiAnti(s: SparkSession, d: String): DataFrame = {
    val hasOrders = Tables.orders(s, d).select(col("o_custkey")).distinct()
    Tables.customer(s, d)
      .join(hasOrders, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("grp",
        when(col("o_custkey").isNull, lit("no_orders")).otherwise(lit("with_orders")))
      .groupBy("c_mktsegment", "grp").agg(count(lit(1)).as("n"))
      .select("c_mktsegment", "grp", "n")
  }

  /** q15: string normalization (trim / lower / whitespace collapse) +
    * distinct — the reference's column-value cleanup (challenge.py:62-95). */
  def q15StringNormalize(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("norm_name",
        lower(trim(regexp_replace(col("p_name"), "\\s+", " "))))
      .groupBy("p_brand")
      .agg(countDistinct(col("norm_name")).as("n_names"),
        min(col("norm_name")).as("first_name"))

  /** q16: safe type coercion — unix-seconds round trip, string render,
    * guarded double→int (challenge.py:202-246). `floor` before the cast:
    * plain double→bigint casts truncate in some engines and round in
    * others. */
  def q16TypeCoercion(s: SparkSession, d: String): DataFrame =
    Tables.eventsWithTs(s, d)
      .select(
        col("event_id"),
        expr("ts_ns DIV 1000000000").as("epoch_s"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        floor(col("value")).cast("bigint").as("value_int"),
        (col("event_type") === "purchase").as("is_purchase"))

  /** q17: JSON field extraction from a string column (the reference's
    * ragged wiki JSON, challenge.py:34-70). */
  def q17JsonExtract(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k")
    Tables.eventsWithTs(s, d)
      .select(when(k.rlike("^\\d+$"), k.cast("int")).as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), Parse.dsum(col("value")).as("sum_value"))
  }

  /** q18: running-time parsing "2h 15m" / "2 hr" / "135 m" → minutes
    * (challenge.py:186-196), over deterministically constructed strings. */
  def q18RuntimeParse(s: SparkSession, d: String): DataFrame = {
    val h = floor(col("l_quantity")).cast("bigint")
    val k = col("l_linenumber") % 3
    val raw =
      when(k === 0, concat(h.cast("string"), lit("h "),
        (col("l_partkey") % 60).cast("string"), lit("m")))
      .when(k === 1, concat(h.cast("string"), lit(" hr")))
      .otherwise(concat((col("l_partkey") % 300).cast("string"), lit(" m")))
    Tables.lineitem(s, d)
      .withColumn("raw", raw)
      .select(col("l_orderkey"), col("l_linenumber"), col("raw"),
        Parse.parseRuntime(col("raw")).as("minutes"))
  }

  /** q19: the flagship composed pipeline — filter → join → derive →
    * conditional fill → aggregate, the shape of ETLchallenge end-to-end. */
  def q19EtlPipeline(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F", "P"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .withColumn("priority_class", substring(col("o_orderpriority"), 1, 1))
      .groupBy("c_mktsegment", "priority_class")
      .agg(count(lit(1)).as("n_orders"),
        Parse.dsum(col("o_totalprice")).as("revenue"),
        Parse.davg(col("c_acctbal")).as("avg_bal"))

  /** q24: rollup aggregation (grouping sets) — per (returnflag, linestatus)
    * cell, per-returnflag subtotal, and grand total in ONE pass. Spark
    * plans this as Expand (×3 rows map-side) → a single partial-aggregated
    * shuffle — subtotals cost no extra scan or extra exchange, which is
    * the whole point at 100 TB vs three separate groupBys. Subtotal rows
    * surface as 'ALL' (the fact columns are non-null by construction), so
    * output ordering stays engine-independent (no NULL-ordering
    * divergence between engines). */
  def q24Rollup(s: SparkSession, d: String): DataFrame = {
    // Two-level rollup: aggregate to the (flag, status) cells FIRST, then
    // rollup over that cells-sized frame. Exact-decimal sums re-aggregate
    // losslessly (sum-of-sums), so results are identical to rolling up the
    // fact table — but Expand triples only ~|cells| rows instead of the
    // full scan (measured 2.35 s → cells-level at sf0.1; at 100 TB the
    // difference is 200 TB of expanded rows vs kilobytes).
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val base = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast(dec)).as("q"),
        sum(col("l_extendedprice").cast(dec)).as("p"),
        sum(col("l_discount").cast(dec)).as("dd"),
        count(lit(1)).as("n"))
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("bigint").as("lvl"),
        sum("q").cast("double").as("sum_qty"),
        sum("p").cast("double").as("sum_price"),
        round(sum("dd").cast("double") / sum("n"), 6).as("avg_disc"),
        sum("n").as("n_items"))
      .select(col("lvl"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_price"), col("avg_disc"), col("n_items"))
  }

  /** q25: SALTED equi-join as a gated catalog key — the skew-mitigation
    * plan you reach for when one key dominates a shuffle AQE can't
    * rewrite: the big (possibly skewed) side gets a deterministic salt
    * from its row id, the small side replicates `buckets` times, and the
    * hot key spreads over `buckets` reducers ([[Skew.saltedJoin]];
    * row-multiplicity-preserving, SkewSpec). Result is IDENTICAL to the
    * plain join — the oracle runs the unsalted SQL. */
  def q25SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val userOrders = Tables.orders(s, d)
      .groupBy(pmod(col("o_custkey"), lit(150)).as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val ev = Tables.eventsWithTs(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    Skew.saltedJoin(ev, userOrders, "user_id", col("event_id"), buckets = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("n_orders")).as("sum_user_orders"),
        Parse.dsum(col("value")).as("sum_value"))
  }

  /** q26: column triage — the reference's per-column try/except degrade
    * posture (challenge.py:129-174: attempt a parse, drop the column and
    * continue on failure) surfaced as DATA instead of control flow. One
    * aggregation pass emits, per messy column, its null count, its
    * parse-failure count against the column's target parser, and a
    * verdict: 'drop' (>=90% null — q09's rule), 'coerce' (failures <=30%
    * of non-null values: adopt the parsed column, nulling the stragglers,
    * the reference's errors='coerce'), else 'keep_raw'. Verdicts compare
    * RAW COUNTS (n_null·10 >= n·9, n_fail·10 <= n_nonnull·3) so no float
    * threshold ever sits at a rounding boundary; the fractional rates are
    * round(_,6) diagnostics only. Like q09 this is one scan regardless of
    * column count, and the output is the decision table a pipeline
    * applies as a projection (NullPrune.prune's pattern). */
  def q26ColumnTriage(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val built = Tables.orders(s, d)
      .withColumn("m", floor(col("o_totalprice")).cast("bigint"))
      .select(
        // ~25% unparseable ('N/A' arm) -> coerce
        moneyString(col("m"), k).as("money"),
        // all four shapes parse -> coerce with zero failures
        when(k % 4 === 0, date_format(col("o_orderdate"), "MMMM d, yyyy"))
          .when(k % 4 === 1, date_format(col("o_orderdate"), "yyyy/MM/dd"))
          .when(k % 4 === 2, date_format(col("o_orderdate"), "MMMM yyyy"))
          .otherwise(date_format(col("o_orderdate"), "yyyy")).as("mdate"),
        // 95% null -> drop before parseability is even considered
        when(k % 20 === 0, date_format(col("o_orderdate"), "yyyy/MM/dd")).as("sparse"),
        // '1-URGENT' etc: digits-then-dash defeats the runtime grammar
        // deterministically -> 100% parse failure -> keep_raw
        col("o_orderpriority").as("prio"))
    val ok = Map[String, Column](
      "money"  -> Parse.parseDollars(col("money")).isNotNull,
      "mdate"  -> Parse.parseMultiDate(col("mdate")).isNotNull,
      "sparse" -> Parse.parseMultiDate(col("sparse")).isNotNull,
      "prio"   -> Parse.parseRuntime(col("prio")).isNotNull)
    val cs = Seq("money", "mdate", "sparse", "prio")
    val aggs = count(lit(1)).as("__n") +: cs.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      sum(when(col(c).isNotNull && !ok(c), 1L).otherwise(0L)).as(s"__nf_$c")))
    built.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nf_$c").as("n_parse_fail"))): _*)).as("c"))
      .select(col("c.column_name").as("column_name"),
        col("c.n_rows").as("n_rows"), col("c.n_null").as("n_null"),
        col("c.n_parse_fail").as("n_parse_fail"),
        round(col("c.n_null").cast("double") / col("c.n_rows"), 6).as("null_frac"),
        round(col("c.n_parse_fail").cast("double") /
          nullif(col("c.n_rows") - col("c.n_null"), lit(0L)), 6).as("fail_frac"),
        when(col("c.n_null") * 10 >= col("c.n_rows") * 9, "drop")
          .when(col("c.n_parse_fail") * 10 <= (col("c.n_rows") - col("c.n_null")) * 3, "coerce")
          .otherwise("keep_raw").as("verdict"))
  }
}
