package graft

import graft.operators.Curation

/** Dev probe (test scope, not shipped): per-node metrics of the x08
  * incremental merge over an EXISTING IncBench state dir — finds the
  * batch-independent cost terms the marginal carries.
  * `Test/runMain graft.CurProbeMain <sfDir> <stateDir/cur> <mod>`;
  * dumps the executed plan + SQL node metrics of one delta pass to
  * target/cur_probe.txt.
  */
object CurProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val (d, dir, mod) = (args(0), args(1), args(2).toInt)
    val cap = PlanCapture.install(spark)
    val prev = cap.mark()
    val t0 = System.nanoTime()
    val df = Curation.curationDeltaFromState(spark, d, dir, mod)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val tWrite = (System.nanoTime() - t1) / 1e9
    println(s"""{"metric":"cur_probe_split","build_sec":$tBuild,"write_sec":$tWrite}""")
    val sec = tBuild + tWrite
    cap.awaitAfter(prev).foreach { qe =>
      val w = new java.io.PrintWriter("target/cur_probe.txt")
      try {
        w.println(s"delta pass: $sec s")
        w.println(PlanCapture.fingerprint(qe)._2)
        w.println("---- node metrics ----")
        w.println(PlanCapture.metricsReport(qe))
      } finally w.close()
    }
    println(s"""{"metric":"cur_probe","sec":$sec}""")
    spark.stop()
  }
}
