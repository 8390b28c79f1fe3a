package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.EventOps

/** The bucketed (skew-hardened) as-of fill must be EXACTLY the
  * single-window fill — boundary stitching is lossless — while bounding
  * any one window partition to a (user, bucket) slice instead of a whole
  * hot user's history. */
class AsofSkewSpec extends SparkSpecBase {
  import spark.implicits._

  private val HourUs = 3600L * 1000000L

  /** One pathologically hot user (10k rows over ~60 days, a purchase
    * every 40 events) + two cold users, pre-tagged in the asofTagged
    * layout. */
  private def skewedTagged: DataFrame = {
    val hot = (0 until 10000).map { i =>
      (0L, i * 500L * 1000000L, i.toLong, i % 40 == 0)
    }
    val cold = Seq(
      (1L, 10L * HourUs, 20000L, true), (1L, 11L * HourUs, 20001L, false),
      (2L, 5L * HourUs, 20002L, false)) // user 2: no purchase at all
    val rows = (hot ++ cold).map { case (u, t, id, isP) => (u, t, id, isP) }
    val ev = rows.toDF("user_id", "t", "event_id", "is_purchase")
    val left = ev.select(col("user_id"), col("t"), lit(0).as("is_p"),
      col("event_id"),
      lit(null).cast("bigint").as("p_id"), lit(null).cast("double").as("p_value"),
      lit(null).cast("bigint").as("p_t"))
    val right = ev.filter(col("is_purchase"))
      .select(col("user_id"), col("t"), lit(1).as("is_p"),
        lit(null).cast("bigint").as("event_id"),
        col("event_id").as("p_id"), (col("event_id") * 2).cast("double").as("p_value"),
        col("t").as("p_t"))
    left.unionByName(right)
  }

  private def resultSet(df: DataFrame): Set[(Long, Long, Option[Long], Option[Long])] =
    df.collect().map { r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        Option(r.getAs[java.lang.Long]("last_purchase_id")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong))
    }.toSet

  test("bucketed as-of == single-window as-of on a hot-user log") {
    val tagged = skewedTagged
    val single = resultSet(EventOps.asofFillSingleWindow(tagged))
    val bucketed = resultSet(EventOps.asofFillBucketed(tagged, EventOps.AsofBucketUs))
    assert(bucketed == single)
    // sanity: the no-purchase user keeps null fills in both forms
    assert(single.exists { case (id, u, p, g) => u == 2L && p.isEmpty && g.isEmpty })
  }

  test("bucketing bounds a window partition to a user-week, not a user-history") {
    val tagged = skewedTagged.withColumn("bkt",
      expr(s"t DIV ${EventOps.AsofBucketUs}"))
    val hotTotal = tagged.filter(col("user_id") === 0L).count()
    val maxPartition = tagged.groupBy("user_id", "bkt").count()
      .agg(max("count")).collect()(0).getLong(0)
    // 10k hot rows over ~8 weekly buckets: any one window task sees at
    // most ~1/8 of the hot user's history
    assert(maxPartition * 4 < hotTotal,
      s"hot user not split: max partition $maxPartition of $hotTotal")
  }

  test("bucketed == single-window across seeded random logs with boundary ties") {
    // Randomized (deterministic seed) logs deliberately clustered around
    // bucket boundaries: purchases exactly ON a boundary, events at the
    // same instant as a purchase, users with no purchases. Any stitching
    // error — off-by-one at a bucket edge, a dropped carry-in, wrong tie
    // order — shows up as a set difference.
    val rnd = new scala.util.Random(42)
    val bucket = EventOps.AsofBucketUs
    for (_ <- 1 to 3) {
      val rows = (0 until 3000).map { i =>
        val u = rnd.nextInt(7).toLong
        val base = rnd.nextInt(12).toLong * bucket
        val t = if (rnd.nextInt(4) == 0) base // exactly on a boundary
                else base + rnd.nextInt(2000000).toLong * 1000L
        (u, t, i.toLong, rnd.nextInt(10) == 0)
      }
      val ev = rows.toDF("user_id", "t", "event_id", "is_purchase")
      val left = ev.select(col("user_id"), col("t"), lit(0).as("is_p"),
        col("event_id"),
        lit(null).cast("bigint").as("p_id"), lit(null).cast("double").as("p_value"),
        lit(null).cast("bigint").as("p_t"))
      val right = ev.filter(col("is_purchase"))
        .groupBy("user_id", "t")
        .agg(max(col("event_id")).as("p_id"))
        .select(col("user_id"), col("t"), lit(1).as("is_p"),
          lit(null).cast("bigint").as("event_id"),
          col("p_id"), (col("p_id") * 2).cast("double").as("p_value"),
          col("t").as("p_t"))
      val tagged = left.unionByName(right)
      assert(resultSet(EventOps.asofFillBucketed(tagged, bucket)) ==
        resultSet(EventOps.asofFillSingleWindow(tagged)))
    }
  }

  test("cataloged q22 equals the single-window form on real data") {
    val a = resultSet(graft.Queries.production("q22_asof_join")(spark, sf001))
    val b = resultSet(EventOps.asofJoinSingleWindow(spark, sf001))
    assert(a == b)
  }
}
