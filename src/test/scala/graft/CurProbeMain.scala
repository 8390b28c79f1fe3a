package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import graft.operators.Curation

/** Dev probe (test scope, not shipped): per-node metrics of the x08
  * incremental merge over an EXISTING IncBench state dir — finds the
  * batch-independent cost terms the marginal carries.
  * `Test/runMain graft.CurProbeMain <sfDir> <stateDir/cur> <mod>
  * [outFile]`; dumps the executed plan + SQL node metrics of EVERY
  * execution in the delta pass (the lineage-cut checkpoints move most
  * merge cost into eager sub-executions, so capturing only the final
  * assembly would miss the work dominating build_sec) to `outFile`
  * (default target/cur_probe.txt relative to the CWD — pass an
  * absolute path when invoking from elsewhere).
  */
object CurProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val (d, dir, mod) = (args(0), args(1), args(2).toInt)
    val qes = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, dur: Long): Unit = {
        qes.add(qe); ()
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    val t0 = System.nanoTime()
    val df = Curation.curationDeltaFromState(spark, d, dir, mod)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val tWrite = (System.nanoTime() - t1) / 1e9
    println(s"""{"metric":"cur_probe_split","build_sec":$tBuild,"write_sec":$tWrite}""")
    // Drain the async listener bus, then dump every captured execution.
    var (settled, quiet) = (qes.size, 0)
    val deadline = System.nanoTime + 15L * 1000000000L
    while (quiet < 5 && System.nanoTime < deadline) {
      Thread.sleep(50)
      if (qes.size == settled) quiet += 1 else { settled = qes.size; quiet = 0 }
    }
    spark.listenerManager.unregister(l)
    val out = new java.io.File(
      args.lift(3).getOrElse("target/cur_probe.txt"))
    Option(out.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(out)
    try {
      w.println(s"delta pass: build=$tBuild s write=$tWrite s; " +
        s"${qes.size} executions captured")
      qes.asScala.zipWithIndex.foreach { case (qe, i) =>
        w.println(s"==== execution $i ====")
        w.println(PlanCapture.fingerprint(qe)._2)
        w.println("---- node metrics ----")
        w.println(PlanCapture.metricsReport(qe))
      }
    } finally w.close()
    println(s"""{"metric":"cur_probe","sec":${tBuild + tWrite}}""")
    spark.stop()
  }
}
