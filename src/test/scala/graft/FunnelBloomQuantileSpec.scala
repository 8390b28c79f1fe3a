package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventOps, Sampling}

/** Round-13 additions: q27 funnel ordering, d14 bloom decontamination
  * soundness, x11 order-statistic quantiles. */
class FunnelBloomQuantileSpec extends SparkSpecBase {
  import spark.implicits._

  // ------------------------------------------------------------- q27

  test("funnel: stage timestamps are strictly-after chained minima") {
    val ev = Seq(
      // A: view only → stage 1
      (1L, "view", 10L),
      // B: view then click → stage 2
      (2L, "view", 10L), (2L, "click", 20L),
      // C: click BEFORE the first view and never after → stage 1
      (3L, "click", 5L), (3L, "view", 10L),
      // D: purchase before the click it would need → stage 2
      (4L, "view", 10L), (4L, "click", 20L), (4L, "purchase", 15L),
      // E: present in the log but never enters the funnel → stage 0
      (5L, "error", 10L),
      // F: full conversion, min-qualifying times picked
      (6L, "view", 10L), (6L, "view", 5L), (6L, "click", 7L),
      (6L, "click", 30L), (6L, "purchase", 40L), (6L, "purchase", 35L),
      // G: click at EXACTLY the view's timestamp — strict > excludes it
      (7L, "view", 10L), (7L, "click", 10L)
    ).toDF("user_id", "event_type", "ts_us")
    val out = EventOps.funnel(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Int]("stage")))).toMap
    assert(out(1L) == ((Some(10L), None, None, 1)))
    assert(out(2L) == ((Some(10L), Some(20L), None, 2)))
    assert(out(3L) == ((Some(10L), None, None, 1)))
    assert(out(4L) == ((Some(10L), Some(20L), None, 2)))
    assert(out(5L) == ((None, None, None, 0)))
    // F: first view 5, first click after 5 is 7, first purchase after 7 is 35
    assert(out(6L) == ((Some(5L), Some(7L), Some(35L), 3)))
    assert(out(7L) == ((Some(10L), None, None, 1)))
    assert(out.size == 7)
  }

  // ------------------------------------------------------------- q28

  test("retention: cohort day is first-active, offsets count distinct users") {
    val D = EventOps.DayUs
    val ev = Seq(
      // user 1: active days 0, 1, 3 (two events on day 0 — dedup to one)
      (1L, 0L), (1L, D - 1L), (1L, D + 5L), (1L, 3 * D),
      // user 2: same cohort (day 0), active again day 1
      (2L, 12L), (2L, D + 7L),
      // user 3: later cohort (day 2), active only that day
      (3L, 2 * D + 9L)
    ).toDF("user_id", "ts_us")
    val out = EventOps.retention(ev).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_active")).toMap
    assert(out == Map(
      (0L, 0L) -> 2L,  // users 1+2 on their first day
      (0L, 1L) -> 2L,  // both return day 1
      (0L, 3L) -> 1L,  // only user 1
      (2L, 0L) -> 1L)) // user 3's one-day cohort
  }

  // ------------------------------------------------------------- d14

  // ------------------------------------------------------------- q29

  test("event spike: exact 3-sigma flags — flat jump, jittered near-miss vs hit, short history") {
    import graft.operators.EventOps.DayUs
    def rows(t: String, counts: Seq[Int]): Seq[(String, Long)] =
      counts.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map(i => (t, d.toLong * DayUs + i)) }
    val ev = (rows("a", Seq(10, 10, 10, 10, 10, 10, 10, 10, 100)) ++
      rows("b", Seq(8, 12, 10, 9, 11, 10, 10, 13, 20)) ++
      rows("c", Seq(1, 1, 1, 1, 50))).toDF("event_type", "ts_us")
    val out = EventOps.eventSpike(ev).collect()
      .map(r => (r.getString(0), r.getAs[Long]("day")) -> r).toMap
    // flat baseline (sigma = 0): same count is NOT a spike, any jump is
    assert(!out(("a", 7L)).getAs[Boolean]("is_spike"))
    assert(out(("a", 7L)).getAs[Double]("trail_mean") == 10.0)
    assert(out(("a", 8L)).getAs[Boolean]("is_spike"))
    // jittered baseline (S=70, Q=710): x=13 -> 441 < 630 near-miss;
    // next day (S=75, Q=815): x=20 -> 4225 > 720 hit
    assert(!out(("b", 7L)).getAs[Boolean]("is_spike"))
    assert(out(("b", 8L)).getAs[Boolean]("is_spike"))
    // < W observed predecessors: never flagged, however extreme
    assert(out.keys.filter(_._1 == "c").forall(k => !out(k).getAs[Boolean]("is_spike")))
    // no baseline at all: mean is null, not 0
    assert(out(("a", 0L)).isNullAt(out(("a", 0L)).fieldIndex("trail_mean")))
    assert(!out(("a", 3L)).getAs[Boolean]("is_spike"))
  }

  test("bloom decontamination: planted contamination is flagged, clean text is not") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta" // one 8-gram
    val docs = Seq(
      (1L, benchText, true),
      (2L, benchText, false),                                    // verbatim copy
      (3L, "one two three four five six seven eight nine", false) // disjoint
    ).toDF("doc_id", "text", "is_bench")
    val out = Dedup.bloomDecontaminate(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_bloom_hits"),
          r.getAs[Boolean]("flagged")))).toMap
    assert(out(2L) == ((1L, 1L, true)))
    assert(out(3L)._1 == 2L && !out(3L)._3)
    assert(!out.contains(1L)) // bench docs are not in the training verdict
  }

  test("bloom decontamination never false-negatives vs the exact d07 path") {
    val d07 = Queries.production("d07_decontaminate")(spark, sf001)
      .select("doc_id", "n_hit_ngrams").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d14 = Queries.production("d14_bloom_decontaminate")(spark, sf001)
      .select("doc_id", "n_bloom_hits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d07.keySet == d14.keySet) // same training-doc universe
    // every exact hit is a bloom hit (the filter can only over-flag)
    for ((id, exact) <- d07) assert(d14(id) >= exact,
      s"doc $id: bloom hits ${d14(id)} < exact hits $exact")
  }

  // ------------------------------------------------------------- x11

  test("quantile profile: ceil-rank order statistics on literal distributions") {
    val cells = (
      Seq.tabulate(4)(i => ("a", (i + 1).toLong)) ++  // 1,2,3,4
      Seq.fill(3)(("b", 5L)) ++                        // ties collapse
      Seq(("c", 7L))                                   // n = 1
    ).toDF("source", "tc")
    val out = Sampling.quantileProfile(cells).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("p25"), r.getAs[Long]("p50"),
          r.getAs[Long]("p75"), r.getAs[Long]("p90")))).toMap
    // n=4: ranks ceil(1)=1, ceil(2)=2, ceil(3)=3, ceil(3.6)=4
    assert(out("a") == ((4L, 1L, 2L, 3L, 4L)))
    assert(out("b") == ((3L, 5L, 5L, 5L, 5L)))
    assert(out("c") == ((1L, 7L, 7L, 7L, 7L)))
  }

  test("quantile profile: percentiles are genuine order statistics of the corpus") {
    val out = Queries.production("x11_quantile_profile")(spark, sf001).collect()
    val tcs = Tables.documents(spark, sf001)
      .select(col("source"), size(split(col("text"), "\\s+")).cast("long").as("tc"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toIndexedSeq).toMap
    for (r <- out) {
      val v = tcs(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == v.size.toLong)
      for ((p, i) <- Sampling.QuantilePcts.zipWithIndex) {
        val rank = (p * v.size + 99) / 100 // ceil
        assert(r.getLong(2 + i) == v(rank - 1),
          s"${r.getAs[String]("source")} p$p")
      }
    }
  }
}
