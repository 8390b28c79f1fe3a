package graft

/** Dev probe (test scope, not shipped): the BATCH form of s07's
  * view→purchase window join — same semantics, no streaming machinery —
  * to split s07's drain cost into engine work vs stream-harness price.
  * `Test/runMain graft.S07BatchProbeMain <sfDir>`.
  */
object S07BatchProbeMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = Sessions.local()
    val wUs = graft.streaming.StreamOps.s07JoinWindowUs(spark, d)
    def run(): Double = {
      val ev = Tables.eventsWithTs(spark, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts_ns DIV 1000").as("us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("us").as("v_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u2"), col("event_id").as("purchase_id"),
          col("us").as("p_us"))
      val j = v.join(p, col("u2") === col("user_id") &&
          col("p_us") >= col("v_us") && col("p_us") <= col("v_us") + lit(wUs))
        .select(col("view_id"), col("purchase_id"), col("user_id"),
          (col("p_us") - col("v_us")).as("lag_us"))
      val t0 = System.nanoTime()
      j.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val sec = math.min(run(), run())
    println(s"""{"metric":"s07_batch_form","sf":"$d","sec":$sec}""")
    spark.stop()
  }
}
