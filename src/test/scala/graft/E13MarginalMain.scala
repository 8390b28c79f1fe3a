package graft

import org.apache.spark.sql.functions._

/** Dev probe (test scope, not shipped): the e13 PRODUCTION marginal —
  * the cataloged key rebuilds the e05 index in-query (gated-rebuild
  * convention), so its bench row prices index build + query. A
  * deployment persists the cell-partitioned index once and pays only
  * probe + ADC + the MMR tail per query batch. This main writes the
  * index to parquet, then times (a) the full in-query e13 and (b) MMR
  * over the persisted index, printing one JSON line for BENCH.md.
  * `Test/runMain graft.E13MarginalMain <sfDir>`. */
object E13MarginalMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = Sessions.local()
    import operators.Similarity
    val shortlist = Similarity.calibratedPqShortlist(spark, d)
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val centroids = Similarity.corpusCentroids(spark, d)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Index build + persist (the once-per-corpus cost).
    val dir = java.nio.file.Files.createTempDirectory("graft-e13-marg").toString
    val tBuild = time {
      Similarity.e05IndexFrom(spark, e, centroids,
          Similarity.corpusCodebooks(spark, d))
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
    }
    val persisted = spark.read.parquet(dir)
      .select(col("cell"), col("c_id"), col("recon"))
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warmup then timed, both paths.
    drain(Similarity.mmrOverPool(spark, e,
      Similarity.e05FromIndex(spark, e, centroids, persisted, shortlist,
        depth = Similarity.MmrPool)))
    val tMarginal = time(drain(Similarity.mmrOverPool(spark, e,
      Similarity.e05FromIndex(spark, e, centroids, persisted, shortlist,
        depth = Similarity.MmrPool))))
    drain(Similarity.e13MmrAnn(spark, d, shortlist))
    val tFull = time(drain(Similarity.e13MmrAnn(spark, d, shortlist)))
    println(s"""{"metric":"e13_marginal","sf":"$d","shortlist":$shortlist,""" +
      s""""index_build_persist_sec":${math.round(tBuild * 1000) / 1000.0},""" +
      s""""marginal_query_sec":${math.round(tMarginal * 1000) / 1000.0},""" +
      s""""full_inquery_sec":${math.round(tFull * 1000) / 1000.0}}""")
    spark.stop()
  }
}
