package graft

import graft.operators.{Curation, Incremental}

/** Prices incremental ingestion the way production pays for it: state
  * is PERSISTED between batches, so the number that matters is the
  * MARGINAL cost of merging a batch from on-disk state — not the
  * self-contained gated keys (d09/e06), which rebuild the base state
  * in-query so the oracle can hash-check them.
  *
  * Phases, each timed separately (one JSON line on stdout):
  *   build_group_state / build_index_state / build_curation_state — the
  *   once-per-corpus cost;
  *   d09_marginal / e06_marginal / x08_marginal (+ the _delta variants:
  *   the batch-bounded row set a daily pipeline persists) — the
  *   per-batch cost from disk, one untimed warmup then min of two timed
  *   noop materializations (the Bench protocol).
  *
  * Usage: IncBench [sfDir [stateDir [mod]]]; sfDir defaults to
  * SPARK_GRAFT_SF_DIR, stateDir to a temp dir, mod to
  * [[Incremental.IngestMod]] (ids ≡ 0 mod `mod` form the batch, so
  * mod 5 = a 20% batch, mod 50 = 2% — the slope of marginal cost in
  * batch fraction is the incremental-ingestion scaling claim, measured).
  */
object IncBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val stateDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-inc-state").toString)
    val mod = args.lift(2).map(_.toInt).getOrElse(Incremental.IngestMod)
    val spark = Sessions.local()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val tGroup = timed(Incremental.writeGroupState(spark, sfDir, s"$stateDir/groups", mod))
    val tIndex = timed(Incremental.writeIndexState(spark, sfDir, s"$stateDir/ann", mod))
    def marginal(df: => org.apache.spark.sql.DataFrame): Double = {
      noop(df) // warmup
      math.min(timed(noop(df)), timed(noop(df)))
    }
    val d09m = marginal(Incremental.mergeFromState(spark, sfDir, s"$stateDir/groups", mod))
    val d09d = marginal(Incremental.mergeDeltaFromState(spark, sfDir, s"$stateDir/groups", mod))
    val e06m = marginal(Incremental.appendFromState(spark, sfDir, s"$stateDir/ann", mod))
    // Curation: the x08 composition from persisted state — the price of
    // an incremental curation decision over a new batch (vs the gated
    // x08, which rebuilds all five stages from scratch in-query).
    val tCur = timed(Curation.writeCurationState(spark, sfDir, s"$stateDir/cur", mod))
    val x08m = marginal(Curation.mergeCurationFromState(spark, sfDir, s"$stateDir/cur", mod))
    val x08d = marginal(Curation.curationDeltaFromState(spark, sfDir, s"$stateDir/cur", mod))
    val x08DeltaRows =
      Curation.curationDeltaFromState(spark, sfDir, s"$stateDir/cur", mod).count()
    val x08FullRows =
      Curation.mergeCurationFromState(spark, sfDir, s"$stateDir/cur", mod).count()
    // Write volume of the delta form (the rows a daily upsert actually
    // lands) vs the full merge's obligatory corpus rewrite — the claim
    // BENCH.md's marginal table tracks per batch fraction.
    val deltaRows =
      Incremental.mergeDeltaFromState(spark, sfDir, s"$stateDir/groups", mod).count()
    val fullRows =
      Incremental.mergeFromState(spark, sfDir, s"$stateDir/groups", mod).count()
    println(s"""{"metric":"incremental_marginal","unit":"sec","sf":"$sfDir","mod":$mod,""" +
      s""""build_group_state":$tGroup,"build_index_state":$tIndex,""" +
      s""""d09_marginal":$d09m,"d09_delta_marginal":$d09d,"e06_marginal":$e06m,""" +
      s""""d09_delta_rows":$deltaRows,"d09_full_rows":$fullRows,""" +
      s""""build_curation_state":$tCur,"x08_marginal":$x08m,""" +
      s""""x08_delta_marginal":$x08d,"x08_delta_rows":$x08DeltaRows,""" +
      s""""x08_full_rows":$x08FullRows}""")
    spark.stop()
  }
}
