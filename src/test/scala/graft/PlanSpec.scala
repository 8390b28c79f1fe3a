package graft

/** Plan-shape assertions: the SCALE properties (broadcast, pushdown,
  * pruning, sort-free production paths) hold in the optimized plans, not
  * just in intent. */
class PlanSpec extends SparkSpecBase {

  private def physical(name: String): String =
    Queries.production(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  test("q04: dims join as broadcast hash joins") {
    val p = physical("q04_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q02: filter is pushed to the parquet scan and columns pruned") {
    val p = Queries.production("q02_filter_project")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("o_orderpriority"), "predicate should reach the scan")
    // pruned read schema: none of the untouched wide columns
    assert(!p.contains("o_comment"), "column pruning must drop o_comment")
  }

  test("q26: one pruned scan feeds the whole triage") {
    // Column pruning: the scan reads exactly the four columns the four
    // triage targets derive from; and the frame is scanned ONCE — the
    // per-column stats are one aggregation, not a pass per column.
    val p = Queries.production("q26_column_triage")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("o_custkey") && !p.contains("o_orderstatus"),
      "untouched orders columns must be pruned from the scan")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"triage must scan orders once, plan:\n${p.take(1500)}")
  }

  test("production emitters carry no global Sort (ordering is verify-only)") {
    for (q <- Seq("q07_parse_dollars", "q08_multi_date", "q16_type_coercion",
        "q18_runtime_parse")) {
      val p = physical(q)
      assert(!p.contains("Sort ["), s"$q production plan has a global sort:\n${p.take(1500)}")
    }
  }

  test("q03: top-N collapses to TakeOrderedAndProject (no full sort)") {
    val p = physical("q03_join_agg")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("e01: batched scoring — no join materializes the scored relation") {
    // The batched form scores inside mapPartitions with partition-local
    // top-k, so the (queries × corpus) relation never exists as rows:
    // no join of any kind, and the only exchange is the final bounded
    // graft_topk merge keyed by query.
    val p = physical("e01_knn_brute")
    assert(p.contains("MapPartitions"), p.take(2000))
    assert(!p.contains("Join"), s"scored relation must not materialize via a join:\n${p.take(2000)}")
    assert(p.contains("graft_topk"), p.take(2000))
  }

  test("e01/e02: top-k is the bounded partial aggregate, not a window sort") {
    for (q <- Seq("e01_knn_brute", "e02_ann_lsh")) {
      val p = physical(q)
      assert(p.contains("graft_topk"), s"$q should aggregate with graft_topk")
      assert(!p.contains("Window"), s"$q must not shuffle-sort through a window")
    }
  }

  test("x03: KMV min-k is the bounded partial aggregate — no window, no sort") {
    val p = physical("x03_kmv_distinct")
    assert(p.contains("graft_mink"), s"x03 should aggregate with graft_mink:\n${p.take(2000)}")
    assert(!p.contains("Window"), s"x03 must not shuffle-sort the vocabulary through a window:\n${p.take(2000)}")
    assert(!p.contains("Sort ["), s"x03 plan must be sort-free:\n${p.take(2000)}")
  }

  test("d01: exact dedup is a single hash aggregate with map-side partials") {
    val p = physical("d01_dedup_exact")
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("e02/d05: no shuffle ships candidate pairs with vector payloads") {
    // The candidate dedup keys on ids only; vectors rejoin AFTER. The
    // only exchange allowed to carry a float vector is the corpus-side
    // rejoin (one vector per row, keyed by a single id) — never a
    // pair-shaped row with two vector payloads (the round-2 shape that
    // hashed and shipped ~512 B of floats per candidate).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case other => other +: other.children.flatMap(flatten)
    }
    for (q <- Seq("e02_ann_lsh", "d05_embedding_dedup")) {
      val exchanges = flatten(
        Queries.production(q)(spark, sf001).queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.nonEmpty, s"$q should have shuffles to audit")
      for (e <- exchanges) {
        val vecCols = e.output.count(_.dataType == ArrayType(FloatType, containsNull = true)) +
          e.output.count(_.dataType == ArrayType(FloatType, containsNull = false))
        assert(vecCols <= 1,
          s"$q shuffles a pair of vector payloads: ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
      }
    }
  }

  test("m05: the dedup exchange carries digests, never payload bytes") {
    // Content-addressed dedup's whole scale trick: md5 + length compute
    // map-side (partial aggregate), so the one shuffle ships (digest,
    // length, min-id, count) regardless of media size. A BinaryType
    // attribute in any exchange would mean payload bytes on the wire.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.BinaryType
    def flatten2(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten2(a.executedPlan)
      case other => other +: other.children.flatMap(flatten2)
    }
    val exchanges = flatten2(
      Queries.production("m05_media_dedup")(spark, sf001).queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.nonEmpty, "m05 should have the dedup shuffle to audit")
    for (e <- exchanges)
      assert(!e.output.exists(_.dataType == BinaryType),
        s"m05 shuffles payload bytes: ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}")}")
  }
}
