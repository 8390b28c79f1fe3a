package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting covers
  * sort-merge joins at runtime; explicit salting is still the tool when
  * a hot key must be split BEFORE a shuffle AQE can't rewrite (windows,
  * or a build side that must replicate).
  */
object Skew {

  /** Salted equi-join: the (possibly skewed) left side gets a
    * deterministic salt in [0, buckets) derived from cheap non-key
    * columns, the (smaller) right side is replicated `buckets` times, and
    * the join key becomes (key, salt) — a hot key now spreads over
    * `buckets` reducers. Row multiplicity is unchanged: every left row
    * matches exactly its original right rows (one replica each).
    *
    * `saltSource` must be deterministic per row (e.g. a row id column) so
    * the same input always lands in the same bucket.
    *
    * Only inner/left-flavored joins are supported: the right side is
    * replicated `buckets` times, so a right/full outer join would emit
    * each UNMATCHED right row once per replica (matched rows are fine —
    * a left row meets exactly one replica of its partner). Semi/anti are
    * safe because they only test existence against the replica set. */
  private val saltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, buckets: Int,
                 how: String = "inner"): DataFrame = {
    require(buckets > 0)
    val howNorm = how.toLowerCase.replace("_", "")
    require(saltableJoinTypes(howNorm),
      s"saltedJoin supports ${saltableJoinTypes.mkString("/")} joins; '$how' " +
        "would duplicate unmatched right rows across salt replicas")
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l("__salt") === r("__salt") && l(key) === r(key), how)
      .drop(l("__salt")).drop(r("__salt")).drop(r(key))
  }

  /** Row cap for [[boundedBroadcast]]: 4M rows of a two-long relabel map
    * is ~64 MB serialized — comfortably inside Spark's broadcast limits
    * and a sane driver/executor memory budget, while anything larger
    * falls back to a shuffle join. Tunable per deployment via
    * SPARK_GRAFT_BROADCAST_CAP (rows) — smaller executors want a lower
    * cap; IncBench --adversarial uses it to demonstrate the degraded
    * path at real scale. */
  lazy val BroadcastRowCap: Long =
    sys.env.get("SPARK_GRAFT_BROADCAST_CAP").map(_.toLong).getOrElse(4L << 20)

  /** Size-GUARDED broadcast hint. A forced `broadcast()` is honored by
    * the planner REGARDLESS of runtime size — the frame is collected to
    * the driver and shipped to every executor, so a hint on a frame
    * that is merely EXPECTED to be small (a relabel map bounded by
    * "daily batches are small") turns into a driver-OOM scale-killer
    * the day a batch is not (the ~100%-near-dup crawl batch). This
    * guard counts the frame and hints only under `capRows`; an
    * oversized frame returns UNhinted, so the join degrades to a
    * shuffle — slower, never fatal.
    *
    * `df` must be cheap to count: already materialized
    * (localCheckpoint/cache) or a narrow projection/filter over a
    * materialized frame — otherwise the count re-runs its lineage.
    *
    * The fallback is LOUD: it bumps [[broadcastFallbacks]] and logs the
    * offending size. The degradation is correctness-neutral but can be a
    * silent bench cliff (d14's "zero-shuffle" probe joins become
    * corpus-wide gram shuffles past the cap) — a probe-able counter
    * turns a mystery regression into a one-line diagnosis. */
  def boundedBroadcast(df: DataFrame, capRows: Long = BroadcastRowCap,
                       tag: String = ""): DataFrame =
    boundedBroadcastKnown(df, df.count(), capRows, tag)

  /** [[boundedBroadcast]] when the caller ALREADY KNOWS the row count
    * (a cached corpus count, a just-collected frame's length): same
    * guard, zero count jobs. Callers that hint several projections of
    * one frame (d05's two vector sides) pay no per-call scan — the r14
    * shape re-counted the same table once per hint. */
  def boundedBroadcastKnown(df: DataFrame, knownRows: Long,
                            capRows: Long = BroadcastRowCap,
                            tag: String = ""): DataFrame = {
    if (knownRows <= capRows) broadcast(df)
    else {
      broadcastFallbacks.incrementAndGet()
      val t = if (tag.isEmpty) "" else s" [$tag]"
      System.err.println(
        s"[graft] boundedBroadcast$t: $knownRows rows > cap $capRows — " +
          "returning unhinted frame (join degrades to shuffle)")
      df
    }
  }

  /** Number of [[boundedBroadcast]] calls since JVM start that exceeded
    * their cap and returned the frame unhinted. Specs and bench harnesses
    * read this to assert (or surface) the degraded path. */
  val broadcastFallbacks = new java.util.concurrent.atomic.AtomicLong(0L)
}
