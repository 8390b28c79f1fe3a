package graft

import org.apache.spark.sql.functions._

/** Dedup operator semantics beyond the oracle gate. */
class DedupSpec extends SparkSpecBase {

  test("d01: every content group collapses to one kept id (the minimum)") {
    val out = Queries.production("d01_dedup_exact")(spark, sf001)
    val n = Tables.documents(spark, sf001).count()
    assert(out.count() == n) // doubled input -> one group per original doc
    assert(out.filter(col("n_copies") =!= 2).count() == 0)
    assert(out.filter(col("keep_id") >= 1000000L).count() == 0,
      "kept id must be the original, not the shifted copy")
  }

  test("d05 bucketed pairs are a subset of exact pairs with high recall") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(operators.Dedup.d05ExactPairs(spark, sf001))
    val bucketed = pairSet(Queries.production("d05_embedding_dedup")(spark, sf001))
    assert(bucketed.subsetOf(exact),
      "band candidates are exact-verified, so no false pairs can appear")
    if (exact.nonEmpty) {
      val recall = (exact & bucketed).size.toDouble / exact.size
      assert(recall >= 0.8, s"d05 recall = $recall (missed ${exact -- bucketed})")
    }
  }

  test("d02 capped index yields identical pairs to uncapped at this SF") {
    // max shingle df here is far below NgramMaxDf, so the cataloged
    // capped plan must be EXACTLY the uncapped exact result (the cap only
    // bites on stop-shingle corpora — SkewSpec covers that behavior).
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.functions.GraftShingles(spark, col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val uncapped = pairSet(operators.Dedup.ngramJaccardPairs(docs, 0.5, None))
    val capped = pairSet(Queries.production("d02_ngram_jaccard")(spark, sf001))
    assert(capped == uncapped)
  }

  test("d03 LSH finds the full exact >=0.5 Jaccard pair set here") {
    def pairSet(name: String): Set[(Long, Long)] =
      Queries.production(name)(spark, sf001).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet("d02_ngram_jaccard")
    val lsh = pairSet("d03_minhash_lsh")
    assert(lsh.subsetOf(exact), "LSH-verified pairs must be true pairs")
    assert(lsh == exact, s"missed: ${exact -- lsh}")
  }

  test("connectedComponents: known fixture resolves to component minima") {
    import spark.implicits._
    // chain {1,2,3}, pair {10,11}, singletons {20, 21}
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = operators.Dedup.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("connectedComponents: 64-vertex chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // Adversarial for plain label propagation: one path of diameter 63,
    // where hop-only needs 63 rounds. With path compression the label
    // tree halves in depth each round — assert the log bound holds in
    // practice, not just in the scaladoc.
    val n = 64
    val verts = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = operators.Dedup.connectedComponentsWithRounds(verts, edges)
    assert(labels.filter(col("lbl") =!= 0L).count() == 0,
      "every chain vertex must resolve to the minimum (0)")
    assert(rounds <= 10, s"expected O(log 63) ≈ 6-8 rounds, took $rounds")
  }

  test("connectedComponents: giant component (50% of vertices) — log rounds, hub skew splits") {
    import spark.implicits._
    // The classic CC failure at scale is LABEL-hub skew: once half the
    // graph carries one min-label, the path-compression join keys half
    // its left side on a single value and a hash shuffle pins it to one
    // reducer. The defense is AQE's skew-join split (a skewed reducer
    // partition splits by mapper ranges; the unique-keyed right side is
    // duplicated per split) — which triggers on BYTES thresholds sized
    // for clusters. Scale those thresholds down to test size, disable
    // auto-broadcast (at real scale the label frame exceeds it), and
    // assert with a task-metrics listener that no task shuffle-reads a
    // component-sized row count. Graph: 16k vertices in ONE component
    // shaped as a binary tree (diameter ~26 — adversarial for hop-only
    // propagation), 16k more in 2-vertex components.
    val n = 1 << 15
    val half = n / 2
    val verts = spark.range(n).select(col("id"))
    val treeEdges = (1 until half).map(i => (i.toLong, (i / 2).toLong))
    val pairEdges = (half until n by 2).map(i => (i.toLong, (i + 1).toLong))
    val edges = (treeEdges ++ pairEdges).toDF("id_a", "id_b").repartition(32)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        reads.synchronized {
          if (t.taskMetrics != null)
            reads += ((t.stageId, t.taskMetrics.shuffleReadMetrics.recordsRead))
        }
    }
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    // parallelismFirst coalescing floors at minPartitionSize (1MB default
    // — larger than this whole graph), so scale it with the other knobs.
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val (labels, rounds) =
        operators.Dedup.connectedComponentsWithRounds(verts, edges)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rounds <= 10, s"expected O(log 26) rounds, took $rounds")
      for (i <- 0L until half.toLong)
        assert(got(i) == 0L, s"tree vertex $i labeled ${got(i)}")
      for (i <- half.toLong until n.toLong)
        assert(got(i) == i - (i - half) % 2, s"pair vertex $i labeled ${got(i)}")
    } finally {
      // Listener events are async: drain (buffer-stabilization wait)
      // BEFORE removing the listener — removal permanently drops any
      // task-end events still queued on the bus, and the per-stage skew
      // assertions below need the complete sample.
      var last = -1
      var spins = 0
      while (reads.synchronized(reads.size) != last && spins < 20) {
        last = reads.synchronized(reads.size); spins += 1; Thread.sleep(250)
      }
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach { case (k, v) => conf.set(k, v) }
    }
    // No-straggler bound, per stage: any stage that shuffle-reads a
    // graph-sized row count must spread it over tasks, with no task
    // holding the lion's share. A pinned hub reducer fails BOTH clauses
    // (measured: without the scaled AQE floors, every round's checkpoint
    // stage runs 1 task × 98304 records; with them, 4+ tasks, max ~36%
    // of the stage — label-0 visibly enlarges its task but splits stay
    // effective).
    val byStage = reads.synchronized(reads.toList).groupBy(_._1).values
      .map(ts => (ts.size, ts.map(_._2).max, ts.map(_._2).sum))
    assert(byStage.nonEmpty, "listener captured no tasks")
    for ((nTasks, mx, tot) <- byStage if tot >= 20000) {
      assert(nTasks >= 2, s"a $tot-record stage ran as a single task")
      assert(mx * 10L <= tot * 6L,
        s"one task read $mx of $tot records — hub label pinned a reducer")
    }
  }

  test("d06 catalog entry: labels are transitive over d03 pairs, keepers are minima") {
    val out = Queries.production("d06_dup_groups")(spark, sf001)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("canonical_id"),
        r.getAs[Long]("group_size"), r.getAs[Boolean]("is_keeper")))
    val nDocs = Tables.documents(spark, sf001).count()
    assert(out.length == nDocs, "every document gets a group verdict")
    val lbl = out.map(t => t._1 -> t._2).toMap
    // every d03 pair must land in one group (near-dup transitivity)
    val pairs = Queries.production("d03_minhash_lsh")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty, "fixture needs real near-dup pairs to resolve")
    for ((a, b) <- pairs) assert(lbl(a) == lbl(b), s"pair ($a,$b) split across groups")
    // canonical = component minimum; keeper flag consistent; sizes add up
    for ((id, c, _, keep) <- out) {
      assert(c <= id, s"canonical $c above member $id")
      assert(keep == (id == c))
    }
    val bySize = out.groupBy(_._2)
    for ((c, members) <- bySize; (_, _, sz, _) <- members)
      assert(sz == members.length, s"group $c size column disagrees with membership")
    assert(out.count(_._4) == bySize.size, "exactly one keeper per group")
  }

  test("d12 catalog entry: SemDeDup keeper is the group member nearest its centroid") {
    val out = Queries.production("d12_semantic_groups")(spark, sf001)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("group_id"),
        r.getAs[Long]("group_size"), r.getAs[Double]("cscore"),
        r.getAs[Long]("keeper_id"), r.getAs[Boolean]("is_keeper")))
    assert(out.length == Tables.embeddings(spark, sf001).count(),
      "every embedding gets a group verdict")
    val lbl = out.map(t => t._1 -> t._2).toMap
    // every d05 pair lands in one group (transitivity over cosine pairs)
    val pairs = Queries.production("d05_embedding_dedup")(spark, sf001)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty, "fixture needs real embedding near-dup pairs")
    for ((a, b) <- pairs) assert(lbl(a) == lbl(b), s"pair ($a,$b) split across groups")
    for ((g, members) <- out.groupBy(_._2)) {
      assert(g == members.map(_._1).min, "group label is the component minimum")
      val expect = members.maxBy(m => (m._4, -m._1))._1
      assert(members.forall(_._5 == expect),
        s"group $g keeper must be argmax cscore (tie: min id), got ${members.head._5}")
      assert(members.forall(m => m._6 == (m._1 == m._5)))
      assert(members.forall(_._3 == members.length), s"group $g size mismatch")
    }
    // the keeper rule differs from d06's min-id convention somewhere in a
    // multi-member group, or the SemDeDup half would be vacuous here
    assert(out.exists(m => m._3 > 1), "fixture needs a multi-member group")
  }

  test("d06-style resolution is generic: resolves d05 embedding pairs too") {
    import spark.implicits._
    val pairs = Queries.production("d05_embedding_dedup")(spark, sf001)
      .select(col("id_a"), col("id_b"))
    val verts = Tables.embeddings(spark, sf001).select(col("vec_id").as("id"))
    val lbl = operators.Dedup.connectedComponents(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edgeList = pairs.as[(Long, Long)].collect()
    assert(edgeList.nonEmpty)
    for ((a, b) <- edgeList) assert(lbl(a) == lbl(b))
    assert(lbl.values.toSet.forall(c => lbl(c) == c), "component roots label themselves")
  }

  test("d07: planted benchmark overlap is flagged, clean and short docs are not") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"w$i").mkString(" ") // one full 8-gram
    val docs = Seq(
      (1L, s"benchmark prefix $span benchmark suffix", true),   // bench doc
      (2L, s"training copies the span $span and more text here", false), // contaminated
      (3L, "completely unrelated training text with no overlap at all whatsoever", false),
      (4L, "too short for grams", false),                        // < 8 tokens
      (5L, s"another train doc also embedding $span yes", false) // contaminated
    ).toDF("doc_id", "text", "is_bench")
    val out = operators.Dedup.decontaminate(spark, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(2L, 3L, 4L, 5L), "every training doc appears exactly once")
    assert(out(2L)._3 && out(2L)._1 == 1 && out(2L)._2 == 1)
    assert(out(5L)._3 && out(5L)._1 == 1 && out(5L)._2 == 1)
    assert(out(3L) == ((0L, 0L, false)))
    assert(out(4L) == ((0L, 0L, false)))
  }

  test("d07 with a realistically tiny benchmark: the gram join broadcasts") {
    // The scaladoc's scale claim, asserted at the plan level: a REAL
    // eval suite is MBs against a TB corpus, so the gram-hash join's
    // build side must broadcast and the whole check become one map-side
    // pass over the training grams — no corpus shuffle. Here 2 bench
    // docs against the sf0.001 corpus: AQE (or static planning) must
    // pick a broadcast join for the bench side.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import spark.implicits._
    val corpus = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text"), lit(false).as("is_bench"))
    val span = (1 to 8).map(i => s"tinybench$i").mkString(" ")
    val bench = Seq((900001L, s"eval item one $span", true),
      (900002L, "eval item two entirely distinct", true))
      .toDF("doc_id", "text", "is_bench")
    val out = operators.Dedup.decontaminate(spark, corpus.unionByName(bench))
    out.write.format("noop").mode("overwrite").save() // finalize AQE
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case other => other +: other.children.flatMap(flatten)
    }
    val ops = flatten(out.queryExecution.executedPlan)
    assert(ops.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "tiny benchmark side must broadcast into the gram join")
  }

  test("d08: containment catches a short doc embedded in a long one that Jaccard misses") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"       // 6 tokens → 4 3-grams
    val filler = (0 until 60).map(i => s"w$i").mkString(" ") // unrelated bulk
    val docs = Seq(
      (1L, quote),                    // the short doc
      (2L, s"$quote $filler"),        // long doc containing it verbatim
      (3L, "totally different words here man")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.GraftShingles(spark, col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val cont = operators.Dedup.containmentPairs(docs, 0.85, None).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("containment") == 1.0,
      "every 3-gram of the quote appears in the long doc")
    // symmetric Jaccard on the same pair is far below any dedup threshold
    val jac = operators.Dedup.ngramJaccardPairs(docs, 0.0001, None)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .collect().head.getAs[Double]("jaccard")
    assert(jac < 0.2, s"jaccard=$jac should be diluted by the long doc")
  }

  test("d10/d11: a corpus-wide boilerplate span never pins one task (skew-hardened)") {
    import spark.implicits._
    // Every doc opens with the SAME 8-token license header (one hot span
    // fingerprint, df = nDocs) followed by 4 unique tokens — the exact
    // shape that pinned the former Window.partitionBy(fingerprint) form:
    // the hot fingerprint's whole occurrence list landed in ONE window
    // task, and AQE's skew split cannot divide window partitions. The
    // hardened forms must (a) keep the values exact and (b) spread every
    // corpus-sized shuffle stage over tasks with no straggler. AQE
    // thresholds scale down to test size (giant-component recipe);
    // auto-broadcast off so the d11 stats join exercises the salted
    // shuffle-join path rather than broadcasting the tiny stats side.
    val n = 4000
    val header = (1 to 8).map(i => s"lic$i").mkString(" ")
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit(header + " "),
        concat_ws(" ", (1 to 4).map(j =>
          concat(lit(s"u${j}_"), col("id"))): _*)).as("text"))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        reads.synchronized {
          if (t.taskMetrics != null)
            reads += ((t.stageId, t.taskMetrics.shuffleReadMetrics.recordsRead))
        }
    }
    // Shuffle bytes are lz4-compressed and the hot partition is highly
    // repetitive (one fingerprint), so the skew threshold must sit well
    // below the raw row volume for the split to trigger at test size.
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4KB")
    // parallelismFirst coalesces to the core count (4 tasks here), which
    // would let balanced background load mask a pinned hot partition in
    // the per-task stats; size-targeted coalescing gives ~32 tasks and a
    // mean sharp enough for the straggler bound below.
    conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    // The shared test session runs 4 shuffle partitions; a 4-way split
    // cannot distinguish a pinned hot partition from balanced load.
    conf.set("spark.sql.shuffle.partitions", "32")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.addSparkListener(listener)
    try {
      // d10: per-doc stats. 12 tokens → 5 windows; window 0 is the hot
      // header (df = n), windows 1-4 carry unique tokens (df = 1).
      val stats = operators.Dedup.spanDupStats(spark, docs)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      assert(stats.size == n)
      for ((id, (nSpans, nDup, nMasked, frac)) <- stats) {
        assert(nSpans == 5L, s"doc $id n_spans")
        assert(nDup == 1L, s"doc $id n_dup")
        assert(nMasked == (if (id == 0L) 0L else 1L), s"doc $id n_masked")
        assert(frac == 0.2, s"doc $id dup_frac")
      }
      // d11: every non-keeper doc gets its 8 header tokens masked.
      val masked = operators.Dedup.spanMask(spark, docs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(masked.size == n)
      assert(masked(0L)._1 == 0L && masked(0L)._2.startsWith(header),
        "keeper doc 0 stays unmasked")
      for (id <- 1L until n.toLong) {
        assert(masked(id)._1 == 8L, s"doc $id masked-token count")
        assert(masked(id)._2.startsWith(("[DUP] " * 8).trim),
          s"doc $id header must be masked")
      }
    } finally {
      var last = -1
      var spins = 0
      while (reads.synchronized(reads.size) != last && spins < 20) {
        last = reads.synchronized(reads.size); spins += 1; Thread.sleep(250)
      }
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach { case (k, v) => conf.set(k, v) }
    }
    // The straggler bound. The hot fingerprint has n = 4000 occurrences;
    // the former window form shuffle-read all of them in one task. The
    // hardened forms bound any single task's read strictly below the hot
    // occurrence count: d10's df/keeper partials collapse the hot span
    // map-side, and d11's stats join splits under AQE. (Collect-stage
    // driver reads are not shuffle reads, so the assertion sees only the
    // real exchanges.)
    val byStage = reads.synchronized(reads.toList).groupBy(_._1).toList.sortBy(_._1)
      .map { case (st, ts) => (st, ts.size, ts.map(_._2).max, ts.map(_._2).sum) }
    info(byStage.map { case (st, k, mx, tot) => s"stage $st: $k tasks max $mx tot $tot" }
      .mkString("; "))
    assert(byStage.nonEmpty, "listener captured no tasks")
    assert(byStage.exists(_._4 >= n), "expected at least one corpus-sized shuffle stage")
    // A task holding the whole hot occurrence list reads ~n records plus
    // its balanced share — ≥ 9x the stage mean here — while the hardened
    // plans stay within ~2x of the mean (map-side partials for d10,
    // salt-bucket spreading for d11's stats join, hash-balanced doc keys
    // in the rebuild).
    for ((st, nTasks, mx, tot) <- byStage if tot >= n) {
      assert(nTasks >= 4, s"stage $st: $tot records ran as only $nTasks tasks")
      assert(mx <= 5L * tot / nTasks, s"stage $st: one task shuffle-read $mx of $tot " +
        s"records across $nTasks tasks — the boilerplate fingerprint pinned a reducer")
    }
  }
}
