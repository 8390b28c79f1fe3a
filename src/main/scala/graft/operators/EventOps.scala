package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Session gap: 30 minutes, in exact micros (µs is the cross-engine
    * common precision — the oracle engine reads TIMESTAMP(NANOS) parquet
    * at µs). */
  val GapUs: Long = 1800L * 1000000L

  /** s02: gap-based sessionization (batch view) — the classic two-window
    * form: flag gap-starts with lag(), running-sum the flags into session
    * numbers, aggregate per (user, session). Exact bigint-micros
    * arithmetic; ties broken by event_id. */
  def s02Sessionize(s: SparkSession, d: String): DataFrame =
    sessionize(Tables.eventsWithTs(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000").as("ts_us"), col("value")))

  /** Sessionization transform over (user_id, event_id, ts_us, value) —
    * shared shape with the streaming variant. */
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
}
