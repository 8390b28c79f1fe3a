package graft

import graft.operators.Similarity

/** The batched (primitive-loop, partition-local top-k) e01 must be
  * bit-identical to the pure-expression broadcast-join form — same
  * scores, same ranking, same tie-breaks. */
class BatchedKnnSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"),
      r.getAs[Long]("c_id"), r.getAs[Double]("cosine"))).toSet

  test("batched e01 equals the expression form exactly") {
    val a = rows(Similarity.e01KnnBrute(spark, sf001))
    val b = rows(Similarity.e01KnnExpr(spark, sf001))
    assert(a.nonEmpty)
    assert(a == b)
  }
}
