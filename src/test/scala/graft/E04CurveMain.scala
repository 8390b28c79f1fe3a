package graft

/** Dev probe (test scope, not shipped): e04 recall@10 AND wall-clock as
  * a function of ADC shortlist depth — the measurement behind e04's
  * per-key depth choice (the corpus regeneration invalidated the r9
  * fixed-30 recall row, so the depth is re-derived from this curve, not
  * assumed). `Test/runMain graft.E04CurveMain <sfDir> <depth>...`.
  */
object E04CurveMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val depths = if (args.length > 1) args.tail.map(_.toInt).toSeq
                 else Seq(30, 1000, 2500)
    val spark = Sessions.local()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(operators.Similarity.e01KnnBrute(spark, d))
    // one throwaway pass trains/memoizes the codebooks so per-depth
    // timings measure the query, not the shared training
    operators.Similarity.e04PqAnn(spark, d, depths.head)
      .write.format("noop").mode("overwrite").save()
    for (k <- depths) {
      val t0 = System.nanoTime()
      operators.Similarity.e04PqAnn(spark, d, k)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val got = pairs(operators.Similarity.e04PqAnn(spark, d, k))
      println(s"""{"metric":"e04_depth_curve","sf":"$d","shortlist":$k,""" +
        s""""sec":$sec,"recall":${(exact & got).size.toDouble / exact.size}}""")
    }
    spark.stop()
  }
}
