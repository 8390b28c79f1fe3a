package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** x17's delta-maintained pair counts == the full recount, round for
  * round — the recount policy a real 32k-merge vocabulary needs (the
  * full per-round vocabulary pass is what dominates there; between
  * rounds only words containing a merged pair change any count). */
class BpeDeltaSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf001).select(col("text"))

  test("delta-updated counts frame equals the full recount after every round") {
    // Drive the step function directly: replay the batched trainer and
    // after each round compare the maintained counts frame against
    // bpePairCounts(w) recomputed from scratch.
    val picks = Sampling.bpeMergeListBatched(spark, docs, 4, 4)
    var w = Sampling.bpeVocab(docs)
    var counts = Sampling.bpePairCounts(w)
    for (r <- 1L to 4L) {
      val accepted = picks.filter(_._1 == r).map(p => (p._3, p._4))
      val (nw, nc) = Sampling.bpeDeltaStep(w, counts, accepted)
      w = nw; counts = nc
      val full = Sampling.bpePairCounts(w)
        .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
      val delta = counts
        .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
      assert(delta == full, s"counts diverged at round $r")
    }
  }

  test("delta trainer picks == full-recount trainer picks (two geometries)") {
    for ((rounds, batch) <- Seq((4, 4), (2, 8))) {
      val full = Sampling.bpeMergeListBatched(spark, docs, rounds, batch)
      val delta = Sampling.bpeMergeListBatchedDelta(spark, docs, rounds, batch)
      assert(delta == full, s"geometry ($rounds, $batch)")
    }
  }
}
