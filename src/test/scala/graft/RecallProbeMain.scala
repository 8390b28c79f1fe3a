package graft

/** Dev probe (test scope, not shipped): e02 recall@10 vs exact e01 at an
  * arbitrary sf dir under the CALIBRATED band width — the sf10 evidence
  * that the d05/e02 scale calibration preserves the recall floor, not
  * just the gate-SF spec value. `Test/runMain graft.RecallProbeMain
  * <sfDir>`; one JSON line on stdout, recorded in BENCH.md.
  */
object RecallProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = Sessions.local()
    val bits = operators.Similarity.calibratedRhpBits(spark, d)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(operators.Similarity.e01KnnBrute(spark, d)
      .select("q_id", "c_id"))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      (exact & pairs(df.select("q_id", "c_id"))).size.toDouble / exact.size
    val shortlist = operators.Similarity.calibratedPqShortlist(spark, d)
    val r02 = recallOf(operators.Similarity.e02AnnLsh(spark, d, bits = bits))
    val r03 = recallOf(operators.Similarity.e03IvfAnn(spark, d))
    val r04 = recallOf(operators.Similarity.e04PqAnn(spark, d, shortlist))
    val r05 = recallOf(operators.Similarity.e05IvfPq(spark, d, shortlist))
    println(s"""{"metric":"ann_recall_at_10","sf":"$d","e02_bits":$bits,""" +
      s""""pq_shortlist":$shortlist,"n_exact":${exact.size},""" +
      s""""e02":$r02,"e03":$r03,"e04":$r04,"e05":$r05}""")
    spark.stop()
  }
}
