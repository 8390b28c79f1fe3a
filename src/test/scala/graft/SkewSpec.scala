package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Skew}

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin: same rows as a plain join, key spread over buckets") {
    val left = Seq.tabulate(1000)(i =>
      (if (i < 900) "hot" else s"k$i", i.toLong)).toDF("key", "row_id")
    val right = Seq(("hot", 1.0), ("k950", 2.0)).toDF("key", "w")
    val plain = left.join(right, "key")
    val salted = Skew.saltedJoin(left, right, "key", col("row_id"), 8)
    assert(salted.count() == plain.count())
    assert(salted.select("key", "row_id", "w").exceptAll(
      plain.select("key", "row_id", "w")).count() == 0)
    // the hot key really lands in multiple buckets
    val spread = left.filter(col("key") === "hot")
      .select(pmod(hash(col("row_id")), lit(8)).as("b"))
      .distinct().count()
    assert(spread > 1)
  }

  test("saltedJoin rejects join types that would duplicate unmatched right rows") {
    val l = Seq(("a", 1L)).toDF("key", "row_id")
    val r = Seq(("a", 1.0)).toDF("key", "w")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "key", col("row_id"), 4, how = "full")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, r, "key", col("row_id"), 4, how = "right_outer")
    }
    // left_anti is allowed and correct: unmatched left rows survive
    assert(Skew.saltedJoin(l.union(Seq(("b", 2L)).toDF), r, "key",
      col("row_id"), 4, how = "left_anti").collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("df cutoff collapses the hot-shingle candidate blowup from f² to bounded") {
    // 100 docs all share one stop-shingle (df=100), and docs (2i, 2i+1)
    // share a distinctive shingle (df=2). Uncapped, the stop-shingle
    // alone manufactures C(100,2)=4950 candidate pairs; with the cutoff
    // the index keeps only the distinctive shingles and exactly the 50
    // true partner pairs survive — the f² → bounded collapse that keeps
    // the inverted index alive at corpus scale.
    val sh = (0 until 100).map(i =>
      (i.toLong, Seq("the and of", s"unique ${i / 2} marker"))).toDF("doc_id", "sh")
    val uncapped = Dedup.ngramJaccardPairs(sh, 0.3, None).count()
    val capped = Dedup.ngramJaccardPairs(sh, 0.3, Some(50)).count()
    assert(uncapped == 4950L, s"every pair shares the stop-shingle: $uncapped")
    assert(capped == 50L, s"only true partner pairs survive the cutoff: $capped")
  }

  test("ngramJaccard df-cutoff drops stop-shingles but keeps true pairs") {
    val sh = Seq(
      (1L, Seq("a b c", "x y z")),
      (2L, Seq("a b c", "x y z")),
      (3L, Seq("a b c", "q r s")),
      (4L, Seq("a b c", "t u v"))).toDF("doc_id", "sh")
    // uncapped: docs 1,2 pair at 1.0; 'a b c' (df=4) also links 3,4 at 1/3
    val uncapped = Dedup.ngramJaccardPairs(sh, 0.3, None).count()
    // df cap 3 removes 'a b c' from the index: only the 1-2 pair remains
    val capped = Dedup.ngramJaccardPairs(sh, 0.3, Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped > 1)
    assert(capped == Set((1L, 2L)))
  }

  test("saltedJoin measurably spreads the hot key where the plain join pins one reducer") {
    // Runtime evidence for the q25 claim, same SparkListener pattern as
    // the d06 giant-component spec: shuffle-read records per task. One
    // key holds 90% of a 200k-row left side; under the PLAIN join its
    // composite hash lands every hot row on a single reducer task, while
    // the SALTED join's (key, salt) composite spreads them over ~buckets
    // tasks. AQE skew-join is left at default thresholds (256MB — far
    // above this fixture), so nothing splits the plain hot partition for
    // us; the coalescing floors are scaled to the fixture as in DedupSpec.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val left = spark.range(0, 200000).select(
      when(col("id") % 10 < 9, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("key"),
      col("id").as("row_id"))
    val right = (Seq(("hot", 1.0)) ++
      (0 until 50).map(i => (s"k${i * 10 + 9}", 2.0))).toDF("key", "w")

    def measure(df: org.apache.spark.sql.DataFrame): List[(Int, Long)] = {
      val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          reads.synchronized {
            if (t.taskMetrics != null)
              reads += ((t.stageId, t.taskMetrics.shuffleReadMetrics.recordsRead))
          }
      }
      spark.sparkContext.addSparkListener(listener)
      try df.write.format("noop").mode("overwrite").save()
      finally {
        var last = -1
        var spins = 0
        while (reads.synchronized(reads.size) != last && spins < 20) {
          last = reads.synchronized(reads.size); spins += 1; Thread.sleep(250)
        }
        spark.sparkContext.removeSparkListener(listener)
      }
      reads.synchronized(reads.toList)
    }

    try {
      // join-sized stages = those shuffle-reading at least the left rows
      def joinStages(reads: List[(Int, Long)]) = reads.groupBy(_._1).values
        .map(ts => (ts.size, ts.map(_._2).max, ts.map(_._2).sum))
        .filter(_._3 >= 150000L).toList
      val plain = joinStages(measure(left.join(right, "key")))
      assert(plain.nonEmpty, "plain join produced no join-sized stage")
      assert(plain.exists { case (_, mx, tot) => mx * 10L >= tot * 7L },
        s"fixture failed to pin a reducer under the plain join: $plain")
      val salted = joinStages(measure(
        Skew.saltedJoin(left, right, "key", col("row_id"), 8)))
      assert(salted.nonEmpty, "salted join produced no join-sized stage")
      for ((nTasks, mx, tot) <- salted) {
        assert(nTasks >= 4, s"salted hot key still ran in $nTasks task(s)")
        assert(mx * 2L <= tot,
          s"one salted task read $mx of $tot records — hot key not spread")
      }
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("q25: salted catalog plan equals the plain unsalted join aggregate") {
    import org.apache.spark.sql.functions._
    val salted = Queries.production("q25_salted_join")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val userOrders = Tables.orders(spark, sf001)
      .groupBy(pmod(col("o_custkey"), lit(150)).as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val plain = Tables.eventsWithTs(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .join(userOrders, "user_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("n_orders")).as("sum_user_orders"),
        graft.functions.Parse.dsum(col("value")).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(salted == plain)
  }
}
