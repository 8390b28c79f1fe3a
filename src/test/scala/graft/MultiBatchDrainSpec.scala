package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** s08's multi-micro-batch drain: the corpus is time-sliced across ≥3
  * real micro-batches, sessions straddle EVERY slice cut by
  * construction (session-aware cut placement), and the emitted set
  * still equals batch s02 — cross-batch flatMapGroupsWithState state
  * and inter-batch watermark advancement proven on real data, not a
  * synthetic frame. */
class MultiBatchDrainSpec extends SparkSpecBase {

  test("s08 drain: >=5 micro-batches, straddling sessions at every cut, equals batch s02") {
    val out = StreamOps.s08StreamSessionizeMB(spark, sf001)
      .orderBy("user_id", "sess_no").collect()
    assert(StreamOps.lastS08MicroBatches.get >= 5L,
      s"expected >=3 data + 2 sentinel batches, got ${StreamOps.lastS08MicroBatches.get}")
    val cuts = StreamOps.lastSplitCutsUs.get
    assert(cuts.size >= 2, s"expected >=2 event-time cuts, got $cuts")
    // Independent straddle check from the emitted sessions themselves:
    // each cut must fall strictly inside at least one session's
    // [start_us, end_us] span — i.e. that session's state crossed the
    // micro-batch boundary.
    cuts.foreach { c =>
      assert(out.exists(r => r.getAs[Long]("start_us") <= c &&
          r.getAs[Long]("end_us") > c),
        s"no session straddles cut $c — cross-batch state unexercised")
    }
    val batch = Queries.production("s02_sessionize")(spark, sf001)
      .select("user_id", "sess_no", "n_events", "start_us", "end_us", "sum_value")
      .orderBy("user_id", "sess_no").collect()
    assert(out.toSeq == batch.toSeq,
      "multi-batch streaming sessionization must equal batch s02 exactly")
  }
}
