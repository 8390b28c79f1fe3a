package org.apache.spark.sql.execution

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Resets a checkpointed frame's statistics to its MEASURED size.
  *
  * Why this exists: `Dataset.localCheckpoint()/checkpoint()` wrap the
  * materialized RDD in a [[LogicalRDD]] via `LogicalRDD.fromDataset`,
  * which passes `rewriteStatsAndConstraints(logicalPlan, optimizedPlan)`
  * as `originStats` — i.e. the leaf KEEPS the origin plan's ESTIMATED
  * `sizeInBytes`, not the real materialized size. Catalyst's
  * `SizeInBytesOnlyStatsPlanVisitor.visitJoin` multiplies child sizes,
  * so a chain of checkpointed steps whose plans contain joins compounds
  * the estimate MULTIPLICATIVELY across steps: by x19's second merge the
  * carried BigInts had ~10⁶ digits and the driver spent 200+ s of
  * single-threaded CPU inside `BigInteger.multiplyToomCook3` under the
  * stats visitor (jstack-confirmed, round 18/19). A lineage cut that
  * does not also cut the SIZE ESTIMATE only bounds the depth of each
  * step's plan, not the magnitude of its leaves.
  *
  * The fix is to replace `originStats` with the measured size of the
  * checkpointed data itself: block-manager bytes for a localCheckpoint,
  * checkpoint-file bytes for a reliable checkpoint, and a
  * `Long.MaxValue` cap as the (still digit-bounded) fallback. Honest
  * leaf sizes also let the planner make the join-strategy decisions the
  * estimates were denying it (a megabyte-scale cut frame is
  * auto-broadcastable again). Everything here is public Spark API plus
  * the `LogicalRDD` constructor, which is why this one file lives in
  * `org.apache.spark.sql.execution`. */
object GraftCheckpointStats {

  /** Rewrap `df` (fresh from localCheckpoint/checkpoint) with its
    * measured size as the leaf statistics. No-op for non-LogicalRDD
    * plans. */
  def withMeasuredStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[ClassicSession]
        val size = measuredSize(session, lr)
          .getOrElse(BigInt(Long.MaxValue))
          .max(BigInt(1))
        Dataset.ofRows(session,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            session, Some(Statistics(sizeInBytes = size)), None))
      case _ => df
    }

  private def measuredSize(s: ClassicSession, lr: LogicalRDD): Option[BigInt] =
    fromBlockManager(s, lr).orElse(fromCheckpointFiles(s, lr))

  /** localCheckpoint: the RDD is persisted, its blocks are registered in
    * the block manager by the time the eager checkpoint returns. */
  private def fromBlockManager(s: ClassicSession, lr: LogicalRDD): Option[BigInt] =
    s.sparkContext.getRDDStorageInfo
      .find(_.id == lr.rdd.id)
      .map(i => BigInt(i.memSize) + BigInt(i.diskSize))
      .filter(_ > 0)

  /** Reliable checkpoint: sum the checkpoint directory's file sizes. */
  private def fromCheckpointFiles(s: ClassicSession, lr: LogicalRDD): Option[BigInt] =
    lr.rdd.getCheckpointFile.flatMap { dir =>
      try {
        val p = new Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        Some(BigInt(fs.getContentSummary(p).getLength)).filter(_ > 0)
      } catch { case _: Exception => None }
    }
}
