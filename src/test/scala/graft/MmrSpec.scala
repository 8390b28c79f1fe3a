package graft

import org.apache.spark.sql.functions._
import graft.functions.GreedyMmr
import graft.operators.Similarity

/** e12 fixtures: the greedy MMR kernel on hand mixtures — a
  * near-duplicate of the top pick is deferred behind a diverse
  * lower-relevance candidate, ties break to the lowest id, short pools
  * truncate, a missing pairwise sim poisons loudly — plus gated-key
  * structure (first pick = relevance argmax; picks ⊂ the exact pool;
  * real divergence from plain top-k on the gate corpus). */
class MmrSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(k: Int, cands: Seq[(Long, Long)],
                  sims: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    Seq((cands, sims)).toDF("cands", "sims")
      .select(explode(GreedyMmr(spark, col("cands"), col("sims"), k)).as("t"))
      .select("t.c_id", "t.rel_micros", "t.mmr_micros")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("a near-dup of the top pick defers behind a diverse candidate") {
    // A(100) ~ B(99) (sim .95); C(50) orthogonal. Plain top-2 = A,B;
    // MMR: A first (mmr=rel), then C (50-0 beats 99-95).
    val out = run(3,
      Seq(1L -> 100L, 2L -> 99L, 3L -> 50L),
      Seq((1L, 2L, 95L), (1L, 3L, 0L), (2L, 3L, 0L)))
    assert(out == Seq((1L, 100L, 100L), (3L, 50L, 50L), (2L, 99L, 4L)))
  }

  test("mmr ties break to the lowest id") {
    // B and C end up with equal mmr; C has the lower id.
    val out = run(2,
      Seq(1L -> 100L, 5L -> 60L, 3L -> 60L),
      Seq((1L, 5L, 10L), (1L, 3L, 10L), (3L, 5L, 0L)))
    assert(out(1)._1 == 3L && out(1)._3 == 50L)
  }

  test("short pools truncate; singleton pool needs no sims") {
    assert(run(10, Seq(7L -> 42L), Nil) == Seq((7L, 42L, 42L)))
    assert(run(10, Seq(1L -> 9L, 2L -> 8L), Seq((1L, 2L, 1L))).length == 2)
  }

  test("a missing pairwise sim fails loudly") {
    val ex = intercept[Exception] {
      run(2, Seq(1L -> 10L, 2L -> 9L), Nil)
    }
    assert(ex.getMessage != null)
  }

  test("e13 gated key: picks ⊂ the ANN pool, first pick = pool rank-1") {
    import org.apache.spark.sql.functions.col
    val e13 = Queries.production("e13_mmr_ann")(spark, sf001).collect()
    // The pool e13 reranks: e05's ladder at MmrPool depth (same plan).
    val ranked = Similarity.e13MmrAnnPool(spark, sf001).collect()
    val pool = ranked.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val top1 = ranked.filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    assert(e13.nonEmpty)
    for (r <- e13) {
      val q = r.getAs[Long]("q_id")
      assert(pool((q, r.getAs[Long]("c_id"))))
      if (r.getAs[Long]("rnk") == 1L) {
        assert(r.getAs[Long]("c_id") == top1(q))
        assert(r.getAs[Long]("mmr_micros") == r.getAs[Long]("rel_micros"))
      }
    }
  }

  test("gated key: first pick is the relevance argmax, picks ⊂ pool") {
    val e12 = Queries.production("e12_mmr_rerank")(spark, sf001).collect()
    val e01 = Queries.production("e01_knn_brute")(spark, sf001)
      .filter($"rnk" === 1L).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    val pool = Similarity.bruteTopK(spark, sf001, Similarity.MmrPool)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    assert(e12.nonEmpty)
    for (r <- e12) {
      val q = r.getAs[Long]("q_id")
      assert(pool((q, r.getAs[Long]("c_id"))))
      if (r.getAs[Long]("rnk") == 1L) {
        assert(r.getAs[Long]("c_id") == e01(q))
        assert(r.getAs[Long]("mmr_micros") == r.getAs[Long]("rel_micros"))
      } else {
        // mmr = rel − maxsim with maxsim ∈ [−10⁶, 10⁶] (cosine micros;
        // a NEGATIVE max sim raises mmr above rel — diversity bonus).
        val d = r.getAs[Long]("mmr_micros") - r.getAs[Long]("rel_micros")
        assert(d >= -1000000L && d <= 1000000L)
      }
    }
  }
}
