package graft

/** Benchmark main: times every production query (sort-free plans — see
  * [[Queries]]) on SPARK_GRAFT_SF_DIR with full materialization.
  *
  * Measurement policy (round-1 lesson): `.count()` lets Catalyst prune
  * unreferenced projections, so pure-projection queries would measure an
  * empty scan. Each query is instead written to the `noop` sink — every
  * row and column is computed and serialized, nothing lands on disk. One
  * untimed warmup pass absorbs session/codegen/JIT startup; the reported
  * numbers are the steady-state second pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try Queries.production(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    val names = Queries.production.keys.toSeq.sorted
    names.foreach(materialize) // warmup: codegen + JIT + file-footer caches
    // two timed passes, keep the min — steady-state time with scheduler
    // noise suppressed (single-pass jitter is ±20-30% at toy SFs)
    val pass1 = names.map(n => n -> materialize(n)).toMap
    val results = names.map(n => n -> math.min(pass1(n), materialize(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
