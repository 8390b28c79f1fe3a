package graft

import graft.operators.{Curation, Incremental}

/** The reliable-checkpoint switch: with `spark.graft.reliableCheckpointDir`
  * set, every merge lineage cut becomes a reliable `checkpoint()` (files
  * land under the dir, survive executor loss); without it, cuts are
  * executor-local. The merge RESULT must be frame-equal either way. */
class CheckpointModeSpec extends SparkSpecBase {

  private def withReliable[A](f: => A): (A, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-relck").toFile
    spark.conf.set(Checkpoints.ReliableDirKey, dir.getAbsolutePath)
    try (f, dir)
    finally spark.conf.unset(Checkpoints.ReliableDirKey)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("group-state merge is frame-equal in local and reliable checkpoint modes") {
    val st = java.nio.file.Files.createTempDirectory("graft-ck-groups").toString
    Incremental.writeGroupState(spark, sf001, st)
    val local = rowsOf(Incremental.mergeFromState(spark, sf001, st))
    val (reliable, dir) = withReliable {
      rowsOf(Incremental.mergeFromState(spark, sf001, st))
    }
    assert(reliable == local && local.nonEmpty)
    def fileCount(d: java.io.File): Int = {
      val kids = Option(d.listFiles()).toSeq.flatten
      kids.count(_.isFile) + kids.filter(_.isDirectory).map(fileCount).sum
    }
    assert(fileCount(dir) > 0,
      "reliable mode must actually write checkpoint files under the dir")
  }

  test("curation merge is frame-equal in local and reliable checkpoint modes") {
    val st = java.nio.file.Files.createTempDirectory("graft-ck-cur").toString
    Curation.writeCurationState(spark, sf001, st)
    val local = rowsOf(Curation.mergeCurationFromState(spark, sf001, st))
    val (reliable, _) = withReliable {
      rowsOf(Curation.mergeCurationFromState(spark, sf001, st))
    }
    assert(reliable == local && local.nonEmpty)
  }
}
