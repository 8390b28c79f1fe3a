package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Parse

/** Event-stream analytics in batch form (SURVEY §2.F). Both operators are
  * written against a plain DataFrame of events, and the SAME transform
  * functions are reused by the Structured Streaming variants
  * ([[graft.streaming.StreamOps]]) — batch/stream parity is spec-tested.
  */
object EventOps {

  /** Tumbling-window transform shared by batch and streaming: 1-hour
    * windows per event_type with count + exact-decimal value sum. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Parse.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** s01: tumbling-window event counts/sums (batch view). */
  def s01WindowAgg(s: SparkSession, d: String): DataFrame =
    windowAgg(Tables.eventsWithTs(s, d))

  /** User→segment profile dim for s04 (the event user space is
    * o_custkey % 150, so custkeys below 150 are the matching profiles —
    * user 0 has no profile row and exercises the dim-miss path). */
  def userSegments(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") < 150)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))

  /** Stream-static ENRICHMENT + window agg, shared by batch s04 and the
    * streaming parity spec: the profile dim broadcasts (stream-static
    * joins cannot shuffle the stream side), dim misses surface as
    * 'UNKNOWN' instead of dropping events — the posture an always-on
    * pipeline needs when profile onboarding lags the event feed. */
  def enrichAgg(events: DataFrame, profile: DataFrame): DataFrame =
    events.join(broadcast(profile), Seq("user_id"), "left")
      .select(col("ts"), col("event_type"), col("value"),
        coalesce(col("segment"), lit("UNKNOWN")).as("segment"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Parse.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("segment"), col("event_type"),
        col("n"), col("sum_value"))

  /** s04: stream-static enrichment join (batch view). */
  def s04StreamEnrich(s: SparkSession, d: String): DataFrame =
    enrichAgg(Tables.eventsWithTs(s, d), userSegments(s, d))

  /** Session gap: 30 minutes, in exact micros (µs is the cross-engine
    * common precision — the oracle engine reads TIMESTAMP(NANOS) parquet
    * at µs). */
  val GapUs: Long = 1800L * 1000000L

  /** s02: gap-based sessionization (batch view). The cataloged plan is
    * the skew-hardened [[sessionizeBucketed]] — (user, week) local
    * sessions + exact boundary-chain merge — because a window by bare
    * user_id concentrates a hot user's entire history in one task and
    * AQE cannot split window partitions; q22 makes the same call. The
    * ~0.3 s scheduling-floor premium at bench SF is the price of the
    * plan that survives 100×. ([[sessionize]] remains the equality
    * cross-check, and the STREAMING s02 is state-based per key, no
    * window at all.) */
  def s02Sessionize(s: SparkSession, d: String): DataFrame =
    sessionizeBucketed(Tables.eventsWithTs(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000").as("ts_us"), col("value")), AsofBucketUs)

  /** Shift applied to the planted duplicate copies in s03 (the raw
    * synthetic stream has no duplicates, like d01's corpus). */
  val DupIdShift = 10000000L

  /** Exact-dedup transform shared by batch s03 and the streaming parity
    * spec: collapse rows that agree on (user_id, event_type, ts_us) to
    * one survivor — min event_id, deterministic — with the copy count
    * for audit. One hash shuffle on the dedup key with map-side partial
    * aggregation; the streaming form is `dropDuplicatesWithinWatermark`
    * over the same key (state bounded by the watermark horizon), parity
    * spec-asserted on the surviving key set. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .groupBy("user_id", "event_type", "ts_us")
      .agg(min(col("event_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** s03: exact STREAM dedup (batch view) — the at-least-once-delivery
    * cleanup every event pipeline runs before analytics: the input is
    * the events table plus an id-shifted duplicate of every row (planted,
    * as in d01), the output one row per true event keyed by
    * (user, type, time) keeping the minimum event_id. */
  def s03StreamDedup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithTs(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("ts_us"))
    dedupEvents(ev.unionByName(
      ev.select((col("event_id") + DupIdShift).as("event_id"),
        col("user_id"), col("event_type"), col("ts_us"))))
  }

  /** Epoch-day width in µs (shared with q28's oracle). */
  val DayUs: Long = 86400000000L

  /** Tagged union of events (is_p=0) and per-(user, t)-reduced purchases
    * (is_p=1) — the shared input of both as-of forms below. */
  private def asofTagged(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.eventsWithTs(s, d)
      .select(col("event_id"), col("user_id"),
        expr("ts_ns DIV 1000").as("t"), col("event_type"), col("value"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "t")
      .agg(max(struct(col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("t"),
        col("m.event_id").as("p_id"), col("m.value").as("p_value"))
    val left = ev.select(col("user_id"), col("t"), lit(0).as("is_p"),
      col("event_id"),
      lit(null).cast("bigint").as("p_id"), lit(null).cast("double").as("p_value"),
      lit(null).cast("bigint").as("p_t"))
    val right = purch.select(col("user_id"), col("t"), lit(1).as("is_p"),
      lit(null).cast("bigint").as("event_id"),
      col("p_id"), col("p_value"), col("t").as("p_t"))
    left.unionByName(right)
  }

  /** Coarse time bucket for the skew-hardened as-of window: one week.
    * A window partition is then bounded by one user-WEEK of events, not
    * one user's entire history. */
  val AsofBucketUs: Long = 7L * DayUs

  /** q22: as-of join — attach to every event the most recent (inclusive)
    * purchase of the same user. Spark has no ASOF JOIN operator; the
    * scale-correct expression is the union-and-fill pattern: tag both
    * sides, union, shuffle by key, sort by (time, side), and carry the
    * last purchase forward with last(_, ignoreNulls). No inequality join
    * (which would plan as a per-key cross product).
    *
    * Skew hardening: the window partitions by (user, week) — AQE cannot
    * split a window partition, so a hot user must be pre-bucketed — and
    * boundary stitching restores exactness: per-(user, bucket) final
    * purchase states (one row per bucket — tiny) get a second window BY
    * USER over buckets to compute each bucket's carry-in, and rows whose
    * within-bucket fill is null take the carry-in. Results are identical
    * to the single-window form (spec-asserted; the oracle states a
    * native ASOF LEFT JOIN). */
  def q22AsofJoin(s: SparkSession, d: String): DataFrame =
    asofFillBucketed(asofTagged(s, d), AsofBucketUs)

  /** Bucketed union-and-fill over a tagged as-of input (see
    * [[asofTagged]] for the expected columns). */
  def asofFillBucketed(tagged: DataFrame, bucketUs: Long): DataFrame = {
    val all = tagged.withColumn("bkt", expr(s"t DIV $bucketUs"))
    val w = Window.partitionBy("user_id", "bkt")
      .orderBy(col("t"), desc("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = all
      .withColumn("lp_id", last("p_id", ignoreNulls = true).over(w))
      .withColumn("lp_value", last("p_value", ignoreNulls = true).over(w))
      .withColumn("lp_t", last("p_t", ignoreNulls = true).over(w))
    // Per-(user, bucket) final purchase state. Purchases are unique per
    // (user, t), so max(struct(t, ...)) IS the bucket's last purchase.
    val bucketFinal = within.filter(col("is_p") === 1)
      .groupBy("user_id", "bkt")
      .agg(max(struct(col("t"), col("p_id"), col("p_value"))).as("fin"))
    // Carry-in per OBSERVED bucket: the latest prior bucket's final state.
    // The input here is one row per (user, bucket) — orders of magnitude
    // smaller than the event log, so the per-user window is cheap.
    val wb = Window.partitionBy("user_id").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = all.select("user_id", "bkt").distinct()
      .join(bucketFinal, Seq("user_id", "bkt"), "left")
      .withColumn("ci", last("fin", ignoreNulls = true).over(wb))
      .select(col("user_id"), col("bkt"),
        col("ci.p_id").as("ci_id"), col("ci.p_value").as("ci_value"),
        col("ci.t").as("ci_t"))
    within.filter(col("is_p") === 0)
      .join(carry, Seq("user_id", "bkt"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("lp_id"), col("ci_id")).as("last_purchase_id"),
        coalesce(col("lp_value"), col("ci_value")).as("last_purchase_value"),
        (col("t") - coalesce(col("lp_t"), col("ci_t"))).as("gap_us"))
  }

  /** The single-window as-of form — one shuffle, but a hot user's entire
    * history in one task. Kept as the equality cross-check for the
    * bucketed q22 (AsofSkewSpec). */
  def asofJoinSingleWindow(s: SparkSession, d: String): DataFrame =
    asofFillSingleWindow(asofTagged(s, d))

  def asofFillSingleWindow(tagged: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), desc("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("lp_id", last("p_id", ignoreNulls = true).over(w))
      .withColumn("lp_value", last("p_value", ignoreNulls = true).over(w))
      .withColumn("lp_t", last("p_t", ignoreNulls = true).over(w))
      .filter(col("is_p") === 0)
      .select(col("event_id"), col("user_id"),
        col("lp_id").as("last_purchase_id"),
        col("lp_value").as("last_purchase_value"),
        (col("t") - col("lp_t")).as("gap_us"))
  }

  private val Epoch2024Us = 1704067200000000L // 2024-01-01T00:00:00Z

  /** q23: range (interval) join — events matched to [start, end) promo
    * windows per user. The scale pattern: fragment each interval into the
    * day buckets it covers, equi-join on (user, day), then exact-range
    * post-filter — shuffle keys stay equi-join keys, never an inequality
    * join (which plans as a per-key cross product). Windows are derived
    * deterministically from orders; the oracle states the same join as a
    * plain inequality join. */
  def q23RangeJoin(s: SparkSession, d: String): DataFrame = {
    val windows = Tables.orders(s, d)
      .filter(col("o_orderkey") % 199 === 0)
      .select(col("o_orderkey").as("win_id"), (col("o_custkey") % 150).as("u"),
        (lit(Epoch2024Us) + (col("o_orderkey") % 30) * lit(DayUs) +
          (col("o_custkey") % 24) * lit(3600000000L)).as("start_us"))
      .withColumn("end_us", col("start_us") + lit(7 * DayUs))
    val frags = windows.select(col("win_id"), col("u"), col("start_us"), col("end_us"),
      explode(sequence(expr(s"start_us DIV $DayUs"),
        expr(s"(end_us - 1) DIV $DayUs"))).as("wday"))
    Tables.eventsWithTs(s, d)
      .select(col("event_id"), col("user_id"), expr("ts_ns DIV 1000").as("t"))
      .withColumn("day", expr(s"t DIV $DayUs"))
      .join(broadcast(frags), col("user_id") === col("u") && col("day") === col("wday"))
      .filter(col("t") >= col("start_us") && col("t") < col("end_us"))
      .select(col("event_id"), col("user_id"), col("win_id"),
        (col("t") - col("start_us")).as("offset_us"))
  }

  /** Skew-hardened sessionization: the single-window form concentrates a
    * hot user's entire history in one task (AQE cannot split window
    * partitions), so the EVENT-scale window here partitions by (user,
    * week bucket) — each partition bounded by one user-week — and a
    * SESSION-scale second pass merges across bucket edges:
    *
    *  1. local sessions within each (user, bucket) — the only window
    *     that sees event-scale data;
    *  2. the plain gap rule re-applied per user over ALL local sessions
    *     in (bkt, local_no) order IS the exact global merge: within a
    *     bucket, consecutive local sessions are > gap apart by
    *     construction (that is what split them), so the rule is a no-op
    *     there, and across a boundary it makes exactly the straddle
    *     decision. The running new-session count in the same window is
    *     the final per-user session number (numbered by start time).
    *     This one window replaces the former boundary-row chain
    *     detection + per-bucket offset prefix sums + two join-backs
    *     (r11: 3.28 → ~1 s at sf1) — no joins anywhere.
    *
    * The second window's partition key is bare user_id, but its input is
    * SESSION-scale: a user's local-session count is bounded by
    * time_range / gap (sessions are > gap apart), independent of event
    * volume — the hot-user hazard the bucketing exists for cannot reach
    * it (PlanAuditSpec allowlists s02 {user_id} with this argument).
    *
    * Per-session value sums stay in exact DECIMAL until the final cast,
    * so results are bit-identical to [[sessionize]] (spec + oracle). */
  def sessionizeBucketed(events: DataFrame, bucketUs: Long): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val ev = events.withColumn("bkt", expr(s"ts_us DIV $bucketUs"))
    val w1 = Window.partitionBy("user_id", "bkt").orderBy("ts_us", "event_id")
    val flagged = ev
      .withColumn("new_sess",
        when(lag("ts_us", 1).over(w1).isNull ||
          col("ts_us") - lag("ts_us", 1).over(w1) > GapUs, 1L).otherwise(0L))
      .withColumn("local_no", sum("new_sess")
        .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // Local sessions: grouping keys contain the window partition keys,
    // so this aggregate runs on the same exchange (no extra shuffle).
    val ls = flagged.groupBy("user_id", "bkt", "local_no")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        sum(col("value").cast(dec)).as("dec_sum"))
    // Session-scale exact merge + numbering in ONE per-user window:
    // (bkt, local_no) order is start_us order (bucket fencing), lag-gap
    // re-check merges exactly the straddling sessions, and the running
    // flag sum numbers final sessions by start time.
    val wb = Window.partitionBy("user_id").orderBy("bkt", "local_no")
    val numbered = ls
      .withColumn("new_chain",
        when(lag("end_us", 1).over(wb).isNull ||
          col("start_us") - lag("end_us", 1).over(wb) > GapUs, 1L).otherwise(0L))
      .withColumn("sess_no", sum("new_chain")
        .over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered.groupBy("user_id", "sess_no")
      .agg(sum("n_events").as("n_events"),
        min("start_us").as("start_us"), max("end_us").as("end_us"),
        sum("dec_sum").as("dec_sum"))
      .select(col("user_id"), col("sess_no"), col("n_events"),
        col("start_us"), col("end_us"), col("dec_sum").cast("double").as("sum_value"))
  }

  /** Sessionization transform over (user_id, event_id, ts_us, value) —
    * the classic single-window form (one shuffle, but a hot user's whole
    * history in one task); kept as the equality cross-check for
    * [[sessionizeBucketed]] and for the streaming-parity specs. */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("new_sess",
        when(lag("ts_us", 1).over(w).isNull ||
          col("ts_us") - lag("ts_us", 1).over(w) > GapUs, 1L).otherwise(0L))
      .withColumn("sess_no", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_no")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        Parse.dsum(col("value")).as("sum_value"))
  }

  /** Funnel stage sequence for q27, shared with the oracle. */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** q27: ORDERED event funnel — per user, how far through
    * view → click → purchase did they get, with each stage's timestamp
    * taken as the EARLIEST qualifying event strictly after the previous
    * stage (the standard product-analytics funnel; a click before any
    * view does not count, and an unordered per-user pivot would
    * over-count exactly those). Output: one row per user with the three
    * stage timestamps (null once the funnel breaks) and the stage count
    * reached.
    *
    * Scale shape: the sequential "first X after t" dependency is
    * resolved with one per-user aggregate per stage — each a
    * partial-combined min — chained by equi-joins ON user_id between
    * the stage-filtered event slice (corpus-sized, filter pushed to the
    * scan) and the previous stage's per-user frame (O(users), far
    * smaller than the event log). No window over user history, so a hot
    * user costs nothing beyond their aggregate partials; AQE handles
    * user-key skew in the joins. */
  def q27Funnel(s: SparkSession, d: String): DataFrame =
    funnel(Tables.eventsWithTs(s, d)
      .select(col("user_id"), col("event_type"), expr("ts_ns DIV 1000").as("ts_us")))

  /** q28: RETENTION COHORT table — the other product-analytics staple
    * next to q27's funnel: users cohorted by their FIRST-ACTIVE epoch
    * day; for each (cohort_day, day_offset), how many of that cohort
    * were active offset days later. Day = ts_µs DIV 86,400,000,000 —
    * pure integer math, no calendar/timezone functions to drift between
    * engines. n_active at offset 0 IS the cohort size (every user is
    * active on their own first day), so the single count column carries
    * the whole retention matrix.
    *
    * Scale shape: ONE corpus scan. The events pass compacts immediately
    * to distinct (user, day) — bounded by users × active days, orders
    * of magnitude under the event count — and that frame is consumed
    * exactly ONCE: per user, (first day, active-day list) in one
    * aggregate, then explode → cell count, all on corpus-sparse rows.
    * (The join-back formulation — days ⋈ per-user minima — re-evaluates
    * the distinct's corpus scan on BOTH consumers, the df-reused-twice
    * recompute CLAUDE.md documents; measured: two parquet scans in the
    * plan. The collect_list is bounded by days-since-epoch per user, so
    * a hot user is capped by the calendar, not their event volume.)
    * No window over user history anywhere. */
  def q28Retention(s: SparkSession, d: String): DataFrame =
    retention(Tables.eventsWithTs(s, d)
      .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us")))

  /** [[q28Retention]] over any (user_id, ts_us) frame — split out so
    * specs can pin the cohort/offset math on literal histories. */
  def retention(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), expr(s"ts_us DIV $DayUs").as("day"))
      .distinct()
      .groupBy("user_id")
      .agg(min("day").as("cohort_day"), collect_list("day").as("days"))
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      // days was distinct (user, day), so a plain count IS distinct users
      .agg(count(lit(1)).as("n_active"))

  /** Trailing baseline width for [[q29EventSpike]]: the spike test
    * compares a day against its type's previous 7 OBSERVED days (days
    * with zero events of a type don't produce a row and don't enter the
    * baseline — the observed-rows semantics both engines share). */
  val SpikeWindow = 7

  /** Squared z-score threshold for [[q29EventSpike]]: flag when
    * (x − μ)² > 9·σ², i.e. |x − μ| > 3σ. */
  val SpikeKSq = 9L

  /** q29: EVENT-VOLUME SPIKE detection — the ingest-monitoring staple
    * every production event pipeline runs (broken instrumentation, bot
    * floods, and outage back-fills all announce themselves as per-type
    * daily-volume anomalies): per (event_type, day), flag days whose
    * count deviates from the type's trailing-[[SpikeWindow]]-day mean by
    * more than 3 standard deviations.
    *
    * EXACT integer math — no mean, variance, or sqrt is ever
    * materialized: with S = Σ trailing counts and Q = Σ trailing
    * squares over exactly W observed days,
    *
    *   (x − S/W)² > 9·(Q/W − S²/W²)  ⟺  (W·x − S)² > 9·(W·Q − S²)
    *
    * and both sides of the cleared form are exact DECIMAL(38,0)
    * integers — the flag cannot sit on a float rounding boundary. Days
    * with fewer than W observed predecessors are never flagged (no
    * baseline); the 6dp trailing mean is surfaced for reporting only.
    *
    * Scale shape: ONE corpus scan compacts events to the (type, day)
    * cell frame — bounded by |event taxonomy| × days, independent of
    * event volume — and the trailing window runs over THAT frame
    * (x11's post-aggregate window class: rows per type ≤ calendar
    * days, a hot type streams a bounded cell list through one cheap
    * task; partition key bounded by the event taxonomy, never the
    * corpus). */
  def q29EventSpike(s: SparkSession, d: String): DataFrame =
    eventSpike(Tables.eventsWithTs(s, d)
      .select(col("event_type"), expr("ts_ns DIV 1000").as("ts_us")))

  /** [[q29EventSpike]] over any (event_type, ts_us) frame — split out
    * so specs can plant flat histories with one planted spike, ramp
    * (non-spike) growth, and short-history types. */
  def eventSpike(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    def d38(c: Column): Column = c.cast(dec)
    val daily = ev
      .groupBy(col("event_type"), expr(s"ts_us DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-SpikeWindow, -1)
    val st = daily.select(col("event_type"), col("day"), col("n"),
      count(col("n")).over(w).as("trail_n"),
      sum(col("n")).over(w).as("trail_sum"),
      sum(d38(col("n")) * d38(col("n"))).over(w).as("trail_sq"))
    val lhsRoot = d38(lit(SpikeWindow.toLong) * col("n") - col("trail_sum"))
    val rhs = d38(lit(SpikeKSq)) *
      (d38(lit(SpikeWindow.toLong)) * col("trail_sq") -
        d38(col("trail_sum")) * d38(col("trail_sum")))
    st.select(col("event_type"), col("day"), col("n"),
      col("trail_n"), col("trail_sum"),
      when(col("trail_n") > 0,
        round(col("trail_sum").cast("double") / col("trail_n").cast("double"), 6))
        .as("trail_mean"),
      when(col("trail_n") === SpikeWindow && lhsRoot * lhsRoot > rhs, lit(true))
        .otherwise(lit(false)).as("is_spike"))
  }

  /** [[q27Funnel]] over any (user_id, event_type, ts_us) frame — split
    * out so specs can plant broken funnels (out-of-order stages, missing
    * stages, stage-0 users). */
  def funnel(ev: DataFrame): DataFrame = {
    val t1 = ev.filter(col("event_type") === FunnelStages(0))
      .groupBy("user_id").agg(min("ts_us").as("t_view_us"))
    val t2 = ev.filter(col("event_type") === FunnelStages(1))
      .join(t1, "user_id").filter(col("ts_us") > col("t_view_us"))
      .groupBy("user_id").agg(min("ts_us").as("t_click_us"))
    val t3 = ev.filter(col("event_type") === FunnelStages(2))
      .join(t2, "user_id").filter(col("ts_us") > col("t_click_us"))
      .groupBy("user_id").agg(min("ts_us").as("t_purchase_us"))
    ev.select("user_id").distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view_us"), col("t_click_us"),
        col("t_purchase_us"),
        when(col("t_purchase_us").isNotNull, 3)
          .when(col("t_click_us").isNotNull, 2)
          .when(col("t_view_us").isNotNull, 1)
          .otherwise(0).cast("int").as("stage"))
  }
}
