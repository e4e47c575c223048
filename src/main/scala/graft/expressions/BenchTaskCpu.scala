// Bridge package: see PortableHash.scala — LiveListenerBus.waitUntilEmpty
// is private[spark], so the drain lives under org.apache.spark.sql.
package org.apache.spark.sql.graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/**
 * Per-query EXECUTOR task CPU for the bench harness (round-19 verdict
 * item 1b): the process-wide OperatingSystemMXBean CPU the bench also
 * records absorbs every concurrent thread — the CodegenWarmer pool
 * compiling OTHER queries' plans during sweep 1, GC, the streaming
 * engine — which on a contended host falsified the "wall AND cpu
 * inflated ⇒ real regression" adjudication rule exactly when it
 * mattered (driver q44: 372 process-cpu-s vs 8.1 idle). This listener
 * scopes attribution to the QUERY: it sums `executorCpuTime` over tasks
 * of stages belonging to jobs whose job group carries the bench's
 * per-query prefix, so warmer jobs (no group) and other queries'
 * (different group) never pollute a sample.
 *
 * Attribution is best-effort by design: a streaming query's micro-batch
 * jobs run on the stream-execution thread, which inherits the group set
 * on the launching thread at `start()` (InheritableThreadLocal), and a
 * late task-end posted after a query's snapshot lands in the NEXT
 * query's delta — [[snapshotSec]] drains the listener bus first to make
 * that window negligible. Executor task CPU also excludes driver-side
 * work (plan/codegen/collect valves), which is exactly the separation
 * the gate reader wants: task CPU tracks the distributed work's cost.
 */
class BenchTaskCpu(groupPrefix: String) extends SparkListener {
  private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g = Option(js.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (g != null && g.startsWith(groupPrefix))
      js.stageIds.foreach(id => stages.add(id))
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    if (stages.contains(te.stageId) && te.taskMetrics != null)
      cpuNs.addAndGet(te.taskMetrics.executorCpuTime)

  /** Cumulative attributed executor CPU seconds, after draining the
    * async listener bus so in-flight task-end events are counted.
    * The wait is bounded TIGHT (2 s): an idle bus drains in
    * milliseconds, and on a host contended enough to exceed this the
    * measurement is already contention-dominated — a missed drain only
    * blurs one sample's attribution (exec_cpu is best-effort by
    * contract), while two 10 s waits per query across a 188-query
    * sweep could meaningfully eat a degraded run's deadline. */
  def snapshotSec(sc: SparkContext): Double = {
    try sc.listenerBus.waitUntilEmpty(2000L)
    catch { case _: Throwable => () }
    cpuNs.get() / 1e9
  }
}

object BenchTaskCpu {
  def install(sc: SparkContext, groupPrefix: String): BenchTaskCpu = {
    val l = new BenchTaskCpu(groupPrefix)
    sc.addSparkListener(l)
    l
  }
}
