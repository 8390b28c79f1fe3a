package graft

import java.security.MessageDigest
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** EXECUTED-plan capture for the bench artifact (VERDICT r10 task 2):
  * the round-10 d11/q09 outliers showed that a min-of-2 timing alone
  * cannot distinguish "the machine was slow" from "the session picked a
  * different physical plan". Bench now records, per key, a fingerprint
  * of the FINAL (post-AQE) executed plan, so a plan flip between two
  * sessions shows up as a one-line `plan_fp` diff in bench_diff.py
  * instead of a 5× timing mystery.
  *
  * Mechanics: a [[QueryExecutionListener]] sees every action's
  * [[QueryExecution]] AFTER it finishes (so `executedPlan` under AQE is
  * the final re-optimized plan, `isFinalPlan=true`). Events are posted
  * asynchronously on the shared listener bus but in completion order,
  * and the noop write is always the LAST execution of a bench
  * materialize — so the capture for a key is "the newest event, polled
  * until the bus has delivered past our sequence mark". The fingerprint
  * is md5 over the plan tree with per-session noise (expression ids,
  * plan ids) normalized away; AQE DECISIONS (join strategy, coalesced
  * partition counts, reused vs re-built exchanges) are deliberately
  * kept — those are exactly the flips worth seeing. */
object PlanCapture {

  final class Listener extends QueryExecutionListener {
    private val last = new AtomicReference[QueryExecution](null)
    private val seq = new AtomicLong(0L)

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      last.set(qe); seq.incrementAndGet()
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    /** Sequence mark: take before the action, pass to [[awaitAfter]]. */
    def mark(): Long = seq.get()

    /** Newest execution delivered after `prev`, waiting for the async
      * bus. An extra short quiescence wait absorbs any earlier pending
      * events (driver-side collects inside query construction) so the
      * returned execution is the final one — the noop write. */
    def awaitAfter(prev: Long, timeoutMs: Long = 8000): Option[QueryExecution] = {
      val deadline = System.nanoTime + timeoutMs * 1000000L
      while (seq.get() == prev && System.nanoTime < deadline) Thread.sleep(5)
      if (seq.get() == prev) return None
      var settled = seq.get()
      var quiet = 0
      while (quiet < 3 && System.nanoTime < deadline) {
        Thread.sleep(20)
        if (seq.get() == settled) quiet += 1
        else { settled = seq.get(); quiet = 0 }
      }
      Option(last.get())
    }
  }

  def install(s: SparkSession): Listener = {
    val l = new Listener
    s.listenerManager.register(l)
    l
  }

  /** Strip per-session identifiers the SAME plan does not share across
    * JVMs; keep everything that encodes a planner/AQE decision. Noise
    * classes found by running the full catalog twice and diffing all 69
    * dumps: lambda identities (JVM-assigned, typed-API nodes), object
    * hashes, and AQE query-stage NUMBERS (a session-global counter, so
    * a key's stage ids depend on everything the session ran before it). */
  def normalize(planText: String): String =
    planText
      .replaceAll("#\\d+L?", "#")                 // expression ids
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[id=#?\\d+\\]", "[id=x]")     // exchange/codegen ids
      .replaceAll("(?i)isFinalPlan=(true|false)", "isFinalPlan=x")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
      .replaceAll("memory_\\w+", "memory_x")      // memory-sink table names
      .replaceAll("s05_sink_\\w+", "s05_sink_x")
      .replaceAll("\\$\\$?Lambda[$/][\\w/.$]*(@[0-9a-fA-F]+)?", ".Lambda")
      .replaceAll("@[0-9a-fA-F]{6,16}\\b", "@x")  // Object.toString hashes
      .replaceAll("QueryStage \\d+", "QueryStage x")
      // codegen stage ids are assigned in AQE stage-materialization
      // order, which is concurrent and nondeterministic; the codegen
      // SPAN stays visible through the tree structure
      .replaceAll("\\*\\(\\d+\\)", "*(x)")
      .replaceAll("WholeStageCodegen \\(\\d+\\)", "WholeStageCodegen (x)")
      .replaceAll("ExistingRDD\\[\\d*\\]", "ExistingRDD[x]")
      .replaceAll("rdd_\\d+", "rdd_x")
      .replaceAll("cachedrdd-\\d+", "cachedrdd-x")

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** (12-hex fingerprint, normalized plan text) of the executed plan. */
  def fingerprint(qe: QueryExecution): (String, String) = {
    val txt =
      try qe.executedPlan.toString
      catch { case e: Throwable => s"<plan unavailable: ${e.getMessage}>" }
    val norm = normalize(txt)
    (md5Hex(norm).take(12), norm)
  }

  /** Every node of an ADAPTIVE plan, descending through the AQE wrapper
    * and materialized query stages (a bare `plan.collect` sees only the
    * wrapper — the PlanAuditSpec lesson). */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec        => q +: allNodes(q.plan)
    case other                    => other +: other.children.flatMap(allNodes)
  }

  /** Post-execution per-node SQL metrics (rows, bytes, spill, timing) —
    * the stage-level evidence the r10 outlier A/B needs. Not part of the
    * fingerprint (values vary run to run by design). */
  def metricsReport(qe: QueryExecution): String = {
    val nodes = try allNodes(qe.executedPlan) catch { case _: Throwable => Nil }
    nodes.map { n =>
      val ms = n.metrics.toSeq
        .map { case (k, m) => s"$k=${m.value}" }.sorted.mkString(", ")
      s"${n.nodeName}: $ms"
    }.mkString("\n")
  }
}
