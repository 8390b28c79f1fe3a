package graft

/** ANN approximation quality: recall@10 vs the exact e01 ranking.
  * (e02 measured 0.88 on the near-orthogonal synthetic embeddings; floor
  * set with headroom against seed drift.) */
class LshRecallSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    Queries.production(name)(spark, sf001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet

  test("e02 ANN recall@10 >= 0.8 vs e01 brute force") {
    val exact = pairs("e01_knn_brute")
    val ann = pairs("e02_ann_lsh")
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("e03 IVF recall@10 vs e01 beats its scan fraction on learned cells") {
    // Probing 3 of 16 LEARNED cells on near-orthogonal synthetic vectors
    // is IVF's worst case (cell membership barely correlates with
    // similarity); the floor documents that even then, probing the
    // nearest cells beats the 3/16 ≈ 0.19 random-scan baseline. Real
    // clustered embeddings sit far higher.
    val exact = pairs("e01_knn_brute")
    val ivf = pairs("e03_ivf_ann")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall@10 = $recall")
  }
}
