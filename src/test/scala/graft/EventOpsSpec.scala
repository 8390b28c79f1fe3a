package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** Boundary semantics of the temporal operators on literal data. */
class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def sessSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("sess_no"),
      r.getAs[Long]("n_events"), r.getAs[Long]("start_us"),
      r.getAs[Long]("end_us"), r.getAs[Double]("sum_value"))).toSet

  test("bucketed sessionize == single-window on seeded logs straddling buckets") {
    // Sessions deliberately CROSSING bucket edges (events within gap on
    // both sides of a boundary), sessions exactly fenced at the gap,
    // multi-bucket-spanning chains, single-session buckets mid-chain —
    // the merge/renumber machinery must reproduce the single-window
    // result exactly, sum_value included (both sides sum in decimal).
    val rnd = new scala.util.Random(7)
    val bucket = EventOps.AsofBucketUs
    for (_ <- 1 to 3) {
      val rows = (0 until 4000).map { i =>
        val u = rnd.nextInt(5).toLong
        val base = rnd.nextInt(10).toLong * bucket
        // cluster half the events tightly around boundaries so sessions straddle
        val t = if (rnd.nextBoolean()) base + rnd.nextInt(7200).toLong * 1000000L - 3600L * 1000000L
                else base + rnd.nextInt(2000000).toLong * 1000L
        (u, i.toLong, math.max(0L, t), rnd.nextInt(100) / 10.0)
      }
      val ev = rows.toDF("user_id", "event_id", "ts_us", "value")
      assert(sessSet(EventOps.sessionizeBucketed(ev, bucket)) ==
        sessSet(EventOps.sessionize(ev)))
    }
  }

  test("cataloged s02 (bucketed) equals the single-window form on real data") {
    val ev = Tables.eventsWithTs(spark, sf001).select(col("user_id"),
      col("event_id"), expr("ts_ns DIV 1000").as("ts_us"), col("value"))
    val a = sessSet(Queries.production("s02_sessionize")(spark, sf001))
    val b = sessSet(EventOps.sessionize(ev))
    assert(a == b)
  }

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
