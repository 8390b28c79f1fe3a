package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** Boundary semantics of the temporal operators on literal data. */
class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("sessionize: gap exactly at the threshold stays in-session, one past splits") {
    val g = EventOps.GapUs
    val ev = Seq(
      (1L, 1L, 0L, 1.0),
      (1L, 2L, g, 1.0),          // gap == threshold -> same session
      (1L, 3L, 2 * g + 1L, 1.0)  // gap == threshold+1 -> new session
    ).toDF("user_id", "event_id", "ts_us", "value")
    val out = EventOps.sessionize(ev).collect()
      .map(r => (r.getAs[Long]("sess_no"), r.getAs[Long]("n_events"))).toSet
    assert(out == Set((1L, 2L), (2L, 1L)))
  }

  test("windowAgg: events on the hour boundary land in the later window") {
    val ts = java.sql.Timestamp.valueOf("2024-06-01 01:00:00")
    val before = new java.sql.Timestamp(ts.getTime - 1)
    val df = Seq((before, "a", 1.0), (ts, "a", 1.0))
      .toDF("ts", "event_type", "value")
    val wins = EventOps.windowAgg(df).select("win_start").collect()
      .map(_.getTimestamp(0).toString).sorted
    assert(wins.toSeq == Seq("2024-06-01 00:00:00.0", "2024-06-01 01:00:00.0"))
  }

  test("range join fragmentation covers windows that span day boundaries") {
    // q23 semantics on real data: every matched event is truly in range,
    // and offsets stay within [0, 7 days). sf0.01: sf0.001 has too few
    // windows (o_orderkey % 199) to guarantee any overlap.
    val out = Queries.production("q23_range_join")(spark, "/root/testdata/sf0.01")
    val bad = out.filter(col("offset_us") < 0 ||
      col("offset_us") >= 7L * 86400000000L).count()
    assert(bad == 0)
    assert(out.count() > 0)
  }

  test("as-of join: purchases match themselves (inclusive) and precede later events") {
    val out = Queries.production("q22_asof_join")(spark, sf001)
    // any matched row has non-negative gap; a purchase event matches itself
    assert(out.filter(col("gap_us") < 0).count() == 0)
    val selfMatches = out.filter(col("gap_us") === 0).count()
    assert(selfMatches > 0, "inclusive as-of must let purchases match themselves")
  }
}
