package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.EventOps

/** Event with both exact-µs long and the event-time timestamp column
  * Structured Streaming needs for watermarks. */
case class SessEvent(user_id: Long, event_id: Long, ts_us: Long,
                     value: Double, ts: java.sql.Timestamp)

/** Open-session state carried across micro-batches. */
case class SessState(sessNo: Long, startUs: Long, lastUs: Long,
                     n: Long, sum: Double)

/** Emitted (closed) session. */
case class SessOut(user_id: Long, sess_no: Long, n_events: Long,
                   start_us: Long, end_us: Long, sum_value: Double)

/** Structured Streaming variants of the §2.F operators. The transforms
  * are shared with batch ([[EventOps.windowAgg]]); sessionization uses
  * flatMapGroupsWithState with event-time timeout so open sessions flush
  * when the watermark passes last-event + gap. Batch/stream parity is
  * asserted in StreamingParitySpec.
  */
object StreamOps {

  /** Streaming tumbling-window agg: batch transform + watermark. Append
    * mode emits each window once, when the watermark passes its end. */
  def windowAggStream(events: DataFrame): DataFrame =
    EventOps.windowAgg(events.withWatermark("ts", "0 seconds"))

  /** Streaming stream-static enrichment + window agg: the batch transform
    * with a watermark; the static profile side re-broadcasts into each
    * micro-batch (a stream-static join can never shuffle the stream). */
  def enrichAggStream(events: DataFrame, profile: DataFrame): DataFrame =
    EventOps.enrichAgg(events.withWatermark("ts", "0 seconds"), profile)

  /** Streaming gap-sessionization over a watermarked [[SessEvent]] set. */
  def sessionizeStream(events: Dataset[SessEvent]): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionizeGroup)
  }

  private val GapMs = EventOps.GapUs / 1000L

  /** Per-group state transition: extend the open session, or close it and
    * start the next; on watermark timeout, flush the final open session. */
  private def sessionizeGroup(uid: Long, it: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[SessOut] = {
    if (state.hasTimedOut) {
      val o = state.get
      state.remove()
      Iterator(SessOut(uid, o.sessNo, o.n, o.startUs, o.lastUs, o.sum))
    } else {
      // Within a micro-batch the group iterator is unordered; sessions are
      // defined on event time, so sort (events must not straddle batches
      // out of order — the watermark guarantees that for on-time data).
      val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = Seq.newBuilder[SessOut]
      var st = state.getOption
      evs.foreach { e =>
        st = st match {
          case None => Some(SessState(1L, e.ts_us, e.ts_us, 1L, e.value))
          case Some(o) if e.ts_us - o.lastUs <= EventOps.GapUs =>
            Some(o.copy(lastUs = e.ts_us, n = o.n + 1, sum = o.sum + e.value))
          case Some(o) =>
            out += SessOut(uid, o.sessNo, o.n, o.startUs, o.lastUs, o.sum)
            Some(SessState(o.sessNo + 1, e.ts_us, e.ts_us, 1L, e.value))
        }
      }
      st.foreach { o =>
        state.update(o)
        state.setTimeoutTimestamp(o.lastUs / 1000L + GapMs)
      }
      out.result().iterator
    }
  }
}
