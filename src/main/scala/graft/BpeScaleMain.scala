package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Prices BPE training at a production batch point (the x17 feasibility
  * claim, measured): a 256-merge table at B=16 on sf1, comparing
  *  - x13's sequential trainer (per-merge cost extrapolated from its
  *    first 16 merges — 256 sequential rounds is exactly the job storm
  *    the batched form exists to avoid),
  *  - x17's batched trainer with the FULL per-round pair recount,
  *  - the DELTA-maintained recount ([[Sampling.bpeMergeListBatchedDelta]])
  *    — the policy a real 32k-merge vocabulary needs, where the full
  *    recount is a millions-of-words pass per round.
  * Prints one JSON line. Usage: BpeScaleMain [sfDir [rounds [batch]]],
  * or `BpeScaleMain --synthetic N [rounds [batch]]` to measure the
  * recount-policy CROSSOVER on an N-word synthetic vocabulary (base-36
  * words — ~1.3k distinct char pairs, so a 16-merge batch touches ~10%
  * of words per round: the Zipf-less lower bound of delta's win; the
  * corpus vocabularies where full recount wins are measured by the
  * sfDir mode). Skips the sequential arm (pointless at vocab scale). */
object BpeScaleMain {
  def main(args: Array[String]): Unit = {
    val synthetic = args.headOption.contains("--synthetic")
    val sfDir = if (synthetic) s"synthetic:${args(1)}"
      else args.headOption.getOrElse(
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1"))
    val shift = if (synthetic) 1 else 0
    val rounds = args.lift(1 + shift).map(_.toInt).getOrElse(16)
    val batch = args.lift(2 + shift).map(_.toInt).getOrElse(16)
    val spark = Sessions.local()
    val docs =
      if (synthetic)
        spark.range(args(1).toLong).select(
          // pmod, not abs: abs(Int.MinValue) is still negative and its
          // conv() would carry a '-' that bpeVocab's ^[a-z0-9]+$ filter
          // silently drops (a tiny skew in the synthetic vocabulary).
          lower(conv(pmod(hash(col("id")), lit(Int.MaxValue)).cast("string"),
            10, 36)).as("text"))
      else Tables.documents(spark, sfDir).select(col("text"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (seq, tSeq) =
      if (synthetic) (Seq.empty[(Long, String, String, String, Long)], 0.0)
      else timed(Sampling.bpeMergeList(spark, docs, batch))
    val (full, tFull) = timed(Sampling.bpeMergeListBatched(spark, docs, rounds, batch))
    val (delta, tDelta) = timed(Sampling.bpeMergeListBatchedDelta(spark, docs, rounds, batch))
    require(full == delta,
      s"delta picks diverged from full recount (${delta.size} vs ${full.size})")
    val merges = full.size
    println(s"""{"metric":"bpe_scale","unit":"sec","sf":"$sfDir",""" +
      s""""rounds":$rounds,"batch":$batch,"merges_trained":$merges,""" +
      s""""seq_merges":${seq.size},"seq_sec":$tSeq,""" +
      s""""seq_per_merge":${tSeq / math.max(seq.size, 1)},""" +
      s""""batched_full_sec":$tFull,"batched_full_per_merge":${tFull / math.max(merges, 1)},""" +
      s""""batched_delta_sec":$tDelta,"batched_delta_per_merge":${tDelta / math.max(merges, 1)}}""")
    spark.stop()
  }
}
