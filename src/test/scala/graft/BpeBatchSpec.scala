package graft

import graft.operators.Sampling

/** x17 fixtures: batched == sequential where the batch's merges don't
  * interact, the conflict ladder skips a symbol-sharing runner-up, a
  * thin vocabulary degrades gracefully, and round boundaries recount. */
class BpeBatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsOf(tokens: (String, Int)*): org.apache.spark.sql.DataFrame =
    tokens.flatMap { case (t, n) => Seq.fill(n)(t) }
      .grouped(7).map(_.mkString(" ")).toSeq.toDF("text")

  test("non-interacting merges: batched picks equal the sequential table") {
    val docs = docsOf("ab" -> 10, "cd" -> 9)
    val seq2 = Sampling.bpeMergeList(spark, docs, 2)
      .map(p => (p._2, p._3, p._5))
    val bat = Sampling.bpeMergeListBatched(spark, docs, 1, 2)
      .map(p => (p._3, p._4, p._6))
    assert(bat == seq2)
    assert(bat == Seq(("a", "b", 10L), ("c", "d", 9L)))
  }

  test("a symbol-sharing runner-up is skipped for the next disjoint pair") {
    val docs = docsOf("ab" -> 10, "bc" -> 9, "de" -> 8)
    val bat = Sampling.bpeMergeListBatched(spark, docs, 1, 2)
    assert(bat.map(p => (p._3, p._4, p._6)) ==
      Seq(("a", "b", 10L), ("d", "e", 8L)))
    // Sequential DOES take (b, c) second — the engineered divergence
    // batched trainers trade away.
    val seq = Sampling.bpeMergeList(spark, docs, 2)
    assert(seq.map(p => (p._2, p._3)) == Seq(("a", "b"), ("b", "c")))
  }

  test("a vocabulary with fewer disjoint pairs than the batch degrades") {
    val docs = docsOf("abc" -> 10)
    // pairs (a,b) and (b,c) tie at 10; (a,b) wins the tie-break and
    // (b,c) conflicts — the exhausted round accepts one pick.
    val bat = Sampling.bpeMergeListBatched(spark, docs, 1, 2)
    assert(bat.map(p => (p._3, p._4)) == Seq(("a", "b")))
  }

  test("round boundaries recount: merged symbols pair in round 2") {
    val docs = docsOf("abcd" -> 10, "xy" -> 9)
    // Round 1 (batch 2): (a,b) first; (b,c) conflicts on b; (c,d) is
    // disjoint and joins. Round 2 recounts over the merged vocabulary
    // "(ab)(cd)": the (ab,cd) pair now exists and beats (x,y).
    val bat = Sampling.bpeMergeListBatched(spark, docs, 2, 2)
    assert(bat.take(2).map(p => (p._3, p._4)) ==
      Seq(("a", "b"), ("c", "d")))
    assert(bat(2)._3 == "ab" && bat(2)._4 == "cd" && bat(2)._6 == 10L)
    assert(bat(3)._3 == "x" && bat(3)._4 == "y")
  }

  test("gated key shape: rounds x picks, freq non-increasing within a round") {
    val rows = Queries.production("x17_bpe_merges_batched")(spark, sf001)
      .collect()
      .map(r => (r.getAs[Long]("rnd"), r.getAs[Long]("pick"),
        r.getAs[Long]("freq")))
    assert(rows.length == Sampling.BpeBatchRounds * Sampling.BpeBatch)
    for (rnd <- rows.map(_._1).distinct) {
      val fs = rows.filter(_._1 == rnd).sortBy(_._2).map(_._3)
      assert(fs.zip(fs.tail).forall { case (a, b) => a >= b },
        s"round $rnd freqs not argmax-ordered: ${fs.toList}")
    }
  }
}
