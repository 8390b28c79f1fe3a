package graft

/** Dev probe (test scope, not shipped): e05 recall@10 as a function of
  * ADC shortlist depth, one shared index build — the measurement behind
  * Similarity.scaledPqShortlist's fraction. `Test/runMain
  * graft.ShortlistCurveMain <sfDir> <depth>...`.
  */
object ShortlistCurveMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val d = args.headOption.getOrElse("/tmp/sf10")
    val depths = if (args.length > 1) args.tail.map(_.toInt).toSeq
                 else Seq(1000, 2500, 5000)
    val spark = Sessions.local()
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val centroids = operators.Similarity.kmeansCentroids(spark, e)
    val index = operators.Similarity.e05Index(spark, e, centroids)
      .localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(operators.Similarity.e01KnnBrute(spark, d))
    for (k <- depths) {
      val got = pairs(operators.Similarity.e05FromIndex(spark, e, centroids, index, k))
      println(s"""{"metric":"e05_shortlist_curve","sf":"$d","shortlist":$k,""" +
        s""""recall":${(exact & got).size.toDouble / exact.size}}""")
    }
    spark.stop()
  }
}
