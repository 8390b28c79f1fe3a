package graft

import graft.operators.Incremental

/** Dev probe (test scope, not shipped): delta-vs-corpus write volumes
  * for the incremental ingest over an EXISTING IncBench state dir —
  * `Test/runMain graft.IncProbeMain <sfDir> <stateDir/groups> <mod>`. */
object IncProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val (d, dir, mod) = (args(0), args(1), args(2).toInt)
    val delta = Incremental.mergeDeltaFromState(spark, d, dir, mod).count()
    val full = Incremental.mergeFromState(spark, d, dir, mod).count()
    println(s"""{"metric":"inc_write_volume","sf":"$d","mod":$mod,"delta_rows":$delta,"full_rows":$full}""")
    spark.stop()
  }
}
