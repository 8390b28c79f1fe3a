package graft.tools

import graft.operators.{Dedup, Similarity}

/** Dev-only: bench ONE scale-calibrated band variant of d05/e02 on
  * SPARK_GRAFT_SF_DIR. Single timed noop pass per JVM: at sf10 these
  * shuffles spill tens of GB and Spark retains shuffle files until
  * context teardown, so min-of-N passes in one JVM fills the disk (the
  * graft.Bench policy is fine for the catalog's bounded shuffles).
  *
  * Usage: Test/runMain graft.tools.BenchScaled <d05|e02> <bits>
  */
object BenchScaled {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val op = args(0)
    val spark = graft.Sessions.local()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val bits = if (args.length > 1) args(1).toInt else Similarity.scaledRhpBits(n)
    println(s"corpus=$n bits=$bits tables=${Similarity.RhpTables}")
    val df = op match {
      case "d05" => Dedup.d05EmbeddingDedup(spark, sfDir, bits)
      case "e02" => Similarity.e02AnnLsh(spark, sfDir, bits)
    }
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"RESULT $op[bits=$bits] ${(System.nanoTime() - t0) / 1e9}%.2f s (single cold pass)")
    spark.stop()
  }
}
