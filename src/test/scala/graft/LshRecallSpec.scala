package graft

/** e02's approximation quality: recall@10 vs the exact e01 ranking.
  * (Measured 0.88 on the near-orthogonal synthetic embeddings; floor set
  * with headroom against seed drift.) */
class LshRecallSpec extends SparkSpecBase {
  test("e02 ANN recall@10 >= 0.8 vs e01 brute force") {
    def pairs(name: String): Set[(Long, Long)] =
      Queries.production(name)(spark, sf001).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val exact = pairs("e01_knn_brute")
    val ann = pairs("e02_ann_lsh")
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }
}
