package graft

import org.apache.spark.sql.DataFrame

/** Lineage cuts for multiply-consumed merge intermediates.
  *
  * Default: `localCheckpoint()` — executor-local block storage, no DFS
  * round-trip; the right trade for a minutes-long batch merge where
  * rerun-on-failure is acceptable (an executor loss during the merge
  * fails the job, there is no lineage to recompute).
  *
  * Deployment-grade switch: setting `spark.graft.reliableCheckpointDir`
  * (via Sessions' `SPARK_GRAFT_CONF="spark.graft.reliableCheckpointDir=
  * /dfs/path"` passthrough, or any SparkConf route) swaps every cut for
  * a RELIABLE `checkpoint()` against that directory — intermediates
  * survive executor loss, for pipelines that cannot resubmit a failed
  * merge. Both forms are EAGER and sever lineage identically, so merge
  * results are frame-equal either way (CheckpointModeSpec) — only the
  * failure-recovery story and the write cost differ (premium priced by
  * IncBench, BENCH.md). */
object Checkpoints {

  val ReliableDirKey = "spark.graft.reliableCheckpointDir"

  def cut(df: DataFrame): DataFrame =
    // Idempotent: a frame that IS already a bare checkpoint leaf (its
    // analyzed plan is a single LogicalRDD scan) has no lineage to cut —
    // re-checkpointing it would copy the materialized blocks for nothing
    // (x09's state wrapper cut frames curationStateFrom had already cut).
    df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _ => cutAlways(df)
    }

  private def cutAlways(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val cp = s.conf.getOption(ReliableDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // getCheckpointDir returns the QUALIFIED path (scheme-prefixed),
        // so equality with the conf value can't be checked directly —
        // set once when unset; repeated set is a cheap assign+mkdir.
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
    // A checkpoint severs LINEAGE but carries the origin plan's
    // ESTIMATED sizeInBytes into the new leaf (LogicalRDD.fromDataset's
    // originStats) — so chained cuts compound the estimate
    // multiplicatively until Catalyst's size-only stats visitor is
    // multiplying million-digit BigInts on the driver (x19's 345 s
    // pathology, round 19's fix). Reset the leaf to the MEASURED
    // materialized size, which both bounds the digits and gives the
    // planner honest broadcastability information.
    org.apache.spark.sql.execution.GraftCheckpointStats.withMeasuredStats(cp)
  }
}
