package graft

/** Dev probe (test scope, not shipped): ANN recall@10 vs exact e01 at an
  * arbitrary sf dir under the CATALOG'S per-key depths — the sf10
  * evidence that the scale calibrations preserve the recall floor, not
  * just the gate-SF spec value. e04/e05 run at the shared calibrated
  * n/20 depth (the catalog's rule — affordable since TopKByScore's
  * heap buffer made depth nearly free);
  * e08's recall is measured against the exact FILTERED brute force (the
  * top-10 of the lang='en' candidate set — the correct oracle for a
  * filtered search, which a post-filtered e01 top-10 would understate).
  * `Test/runMain graft.RecallProbeMain <sfDir>`; one JSON line on
  * stdout, recorded in BENCH.md.
  */
object RecallProbeMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = Sessions.local()
    val bits = operators.Similarity.calibratedRhpBits(spark, d)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(operators.Similarity.e01KnnBrute(spark, d)
      .select("q_id", "c_id"))
    def recallVs(truth: Set[(Long, Long)])(
        df: org.apache.spark.sql.DataFrame): Double =
      (truth & pairs(df.select("q_id", "c_id"))).size.toDouble / truth.size
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      recallVs(exact)(df)
    val shortlist = operators.Similarity.calibratedPqShortlist(spark, d)
    val r02 = recallOf(operators.Similarity.e02AnnLsh(spark, d, bits = bits))
    val r03 = recallOf(operators.Similarity.e03IvfAnn(spark, d))
    val r04 = recallOf(operators.Similarity.e04PqAnn(spark, d, shortlist))
    val r05 = recallOf(operators.Similarity.e05IvfPq(spark, d, shortlist))
    // Exact filtered ground truth for e08: brute-force top-10 over the
    // lang='en' candidate set only (window ranking is fine in a probe).
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val allowed = Tables.documents(spark, d).filter(col("lang") === "en")
      .select(col("doc_id").as("c_id"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val scored = broadcast(q)
      .join(e.toDF("c_id", "cv").join(allowed, Seq("c_id"), "left_semi"),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(graft.functions.CosineSimilarity(spark, col("qv"), col("cv")), 6)
          .as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    val exactFiltered = pairs(scored
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select("q_id", "c_id"))
    val r08 = recallVs(exactFiltered)(
      operators.Similarity.e08FilteredAnn(spark, d))
    println(s"""{"metric":"ann_recall_at_10","sf":"$d","e02_bits":$bits,""" +
      s""""pq_shortlist":$shortlist,""" +
      s""""n_exact":${exact.size},"n_exact_filtered":${exactFiltered.size},""" +
      s""""e02":$r02,"e03":$r03,"e04":$r04,"e05":$r05,"e08_vs_filtered_exact":$r08}""")
    spark.stop()
  }
}
