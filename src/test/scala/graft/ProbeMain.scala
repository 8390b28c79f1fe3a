package graft

/** Dev probe (test scope, not shipped): time individual production
  * queries on an arbitrary sf dir — `Test/runMain graft.ProbeMain <dir>
  * <key>...`. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val d = args.head
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      Queries.production(name)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
