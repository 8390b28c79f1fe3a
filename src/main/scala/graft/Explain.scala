package graft

/** Dev tool: dump the formatted physical plan of one or all catalog
  * queries. Usage:
  *   sbt "runMain graft.Explain [key ...]"        (default: all keys)
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001 — plan shape, not perf). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local("8")
    val keys = if (args.nonEmpty) args.toSeq else Queries.production.keys.toSeq.sorted
    keys.foreach { name =>
      println(s"\n========== $name ==========")
      Queries.production(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
