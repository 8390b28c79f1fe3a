package graft

import org.apache.spark.sql.SparkSession

/** One place for the local SparkSession configuration shared by Bench,
  * Verify, and the test suite. Nothing here is data-dependent: shuffle
  * partitions match local cores (AQE coalesces at cluster scale), ANSI is
  * off (the reference's errors='coerce' semantics), and the legacy
  * nanos-as-long flag is set once so reads of the TIMESTAMP(NANOS) events
  * parquet behave identically everywhere (no per-loader conf mutation). */
object Sessions {

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
