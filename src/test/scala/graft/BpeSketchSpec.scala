package graft

import graft.operators.Sampling

/** x13/x14 fixtures: BPE merge order, frequency weighting, greedy
  * non-overlapping application, and tie-breaks; sketch exactness at
  * m ≤ k, the order-statistic error bound past it, and partitioning
  * independence. */
class BpeSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int) =
    Sampling.bpeMerges(spark, texts.toDF("text"), rounds)
      .collect().map(r => (r.getAs[Long]("rnd"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("freq"))).toSeq

  test("x13: merge order follows pair frequency; merged symbols re-enter") {
    // vocab: ab x3, cd x2, x x1 -> round 1 merges (a,b), round 2 (c,d)
    val out = merges(Seq("ab ab ab cd cd x"), 2)
    assert(out == Seq((1L, "a", "b", "ab", 3L), (2L, "c", "d", "cd", 2L)))
  }

  test("x13: pair counts weight by corpus token frequency") {
    // zz freq 5 -> (z,z)=5 beats yyy freq 2 -> (y,y)=4
    val out = merges(Seq(Seq.fill(5)("zz").mkString(" "), "yyy yyy"), 1)
    assert(out == Seq((1L, "z", "z", "zz", 5L)))
  }

  test("x13: greedy left-to-right application; merged pair wins round 2") {
    // aaaa: (a,a) counted at 3 adjacent slots; replace is non-overlapping
    // so (a)(a)(a)(a) -> (aa)(aa), then (aa,aa) is round 2's only pair.
    val out = merges(Seq("aaaa"), 2)
    assert(out == Seq((1L, "a", "a", "aa", 3L), (2L, "aa", "aa", "aaaa", 1L)))
  }

  test("x13: exact count ties break to the lexicographically smallest pair") {
    val out = merges(Seq("dc dc ba ba"), 1)
    assert(out == Seq((1L, "b", "a", "ba", 2L)))
  }

  test("x13: non-alphanumeric tokens are pre-tokenized away") {
    val out = merges(Seq("(((( (((( ok ok"), 1)
    assert(out == Seq((1L, "o", "k", "ok", 2L)))
  }

  private def sketch(rows: Seq[(String, Long, Long)]) =
    Sampling.quantileSketch(spark, rows.toDF("source", "doc_id", "v"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("sample_m"), r.getAs[Long]("p25_micros"),
          r.getAs[Long]("p50_micros"), r.getAs[Long]("p75_micros"),
          r.getAs[Long]("p90_micros"))).toMap

  test("x14: a stratum at or under k rows is EXACT (sample = stratum)") {
    val rows = (1L to 100L).map(i => ("s", i, i))
    assert(sketch(rows)("s") == ((100L, 25L, 50L, 75L, 90L)))
  }

  test("x14: past k the estimate obeys the order-statistic bound") {
    val n = 5000L
    val rows = (1L to n).map(i => ("s", i, i))
    val (m, p25, p50, p75, p90) = sketch(rows)("s")
    assert(m == Sampling.QSketchK.toLong)
    // binomial rank error at k=256 is ~1/sqrt(k) ~ 6% of the range;
    // 15% is a 2.5-sigma envelope on each percentile.
    for ((est, p) <- Seq((p25, 25L), (p50, 50L), (p75, 75L), (p90, 90L)))
      assert(math.abs(est - n * p / 100) <= n * 15 / 100, s"p$p: $est")
  }

  test("x14: output is partitioning-independent") {
    val rows = (1L to 3000L).map(i => ("s" + (i % 3), i, i * 7 % 1000))
    val df = rows.toDF("source", "doc_id", "v")
    val a = Sampling.quantileSketch(spark, df).orderBy("source").collect().toSeq
    val b = Sampling.quantileSketch(spark, df.repartition(7))
      .orderBy("source").collect().toSeq
    assert(a == b)
  }
}
