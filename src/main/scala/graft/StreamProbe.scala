package graft

import graft.streaming.StreamOps

/** Measures the s05 state-store bucket-occupancy claim at a given SF
  * (the IncBench pattern: a separate probe main for a property the
  * gated key argues but the gate SFs can't exercise). Prints one JSON
  * line with the bucket count, the max per-bucket occupancy the stream's
  * state would reach after the full corpus, and how many buckets exceed
  * [[StreamOps.NearDupBucketCap]] (expected 0 at every tested SF —
  * a non-zero value means the degraded add-no-more-partners mode bit).
  *
  * Usage: StreamProbe [sfDir]; defaults to SPARK_GRAFT_SF_DIR.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Sessions.local()
    val row = StreamOps.s05BucketOccupancy(
      Tables.documents(spark, sfDir).select("doc_id", "text")).collect()(0)
    println(s"""{"metric":"s05_bucket_occupancy","sf":"$sfDir",""" +
      s""""n_buckets":${row.getLong(0)},"max_occupancy":${row.getLong(1)},""" +
      s""""buckets_over_cap":${row.getLong(2)},"cap":${StreamOps.NearDupBucketCap}}""")
    spark.stop()
    // Over-cap buckets mean s05's pair set depends on arrival order —
    // FAIL the probe, don't just report (StreamNearDupSpec enforces the
    // same invariant at the gate SFs).
    if (row.getLong(2) > 0L) sys.exit(1)
  }
}
