package graft

/** Dev probe (test scope, not shipped): e13 (MMR over the e05 ANN pool)
  * vs e12 (MMR over the exact brute pool) at an arbitrary sf dir — the
  * evidence that swapping the scaled pool in preserves the rerank, and
  * the standing recall-is-corpus-dependent record (re-run after any
  * testdata regeneration before citing numbers). Reports pool recall
  * (ANN pool ∩ brute pool / MmrPool·|q|), pick overlap at K, and the
  * rank-1 agreement rate (relevance argmax survives the pool swap
  * whenever the true top-1 is in the probed cells).
  * `Test/runMain graft.MmrRecallProbeMain <sfDir>`; one JSON line. */
object MmrRecallProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = Sessions.local()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shortlist = operators.Similarity.calibratedPqShortlist(spark, d)
    val exactPool = pairs(operators.Similarity.bruteTopK(spark, d,
      operators.Similarity.MmrPool))
    val e12 = operators.Similarity.e12MmrRerank(spark, d).collect()
    val e13 = operators.Similarity.e13MmrAnn(spark, d, shortlist).collect()
    def picks(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    def top1(rows: Array[org.apache.spark.sql.Row]): Map[Long, Long] =
      rows.filter(_.getAs[Long]("rnk") == 1L)
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("c_id")).toMap
    val annPool = pairs(operators.Similarity.e13MmrAnnPool(spark, d, shortlist))
    val p12 = picks(e12); val p13 = picks(e13)
    val t12 = top1(e12); val t13 = top1(e13)
    val nq = t12.size
    val top1Agree = t12.count { case (q, c) => t13.get(q).contains(c) }
    println(s"""{"metric":"mmr_ann_vs_exact","sf":"$d","n_queries":$nq,""" +
      s""""pq_shortlist":$shortlist,""" +
      s""""pool_recall":${(annPool & exactPool).size.toDouble / exactPool.size},""" +
      s""""pick_overlap":${(p12 & p13).size.toDouble / p12.size},""" +
      s""""top1_agree":${top1Agree.toDouble / nq}}""")
    spark.stop()
  }
}
