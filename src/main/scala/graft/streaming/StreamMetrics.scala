package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Listener-accumulated stream counters (§2.1 #19). Summing
  * `query.recentProgress` undercounts silently on long runs — Spark
  * caps it at spark.sql.streaming.numRecentProgressUpdates (default
  * 100) entries — so a StreamingQueryListener folds every progress
  * update into monotonic per-query totals instead. */
object StreamMetrics {

  final class Totals {
    @volatile var messages: Long = 0L
    @volatile var rows: Long = 0L
  }

  private val byRun = new ConcurrentHashMap[UUID, Totals]()
  // Weak keys: a stopped SparkSession must be collectable — a strong
  // key-set would pin every session ever registered in a long-lived
  // multi-session process.
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  // Totals of TERMINATED runs stay readable (tests and operators read
  // finals after stop) but only the most recent `Retention` of them —
  // unbounded byRun growth across query churn is a slow leak.
  private val terminated = new java.util.concurrent.ConcurrentLinkedQueue[UUID]()
  private val Retention = 64

  /** Registers the accumulator listener once per session. */
  def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val t = byRun.computeIfAbsent(e.progress.runId, _ => new Totals)
          val om = e.progress.observedMetrics
          Option(om.get("graft_raw")).foreach(r => t.messages += r.getLong(0))
          Option(om.get("graft_rows")).foreach(r => t.rows += r.getLong(0))
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
          terminated.add(e.runId)
          while (terminated.size > Retention) {
            val old = terminated.poll()
            if (old != null) byRun.remove(old)
          }
        }
      })
    }

  def messages(runId: UUID): Long =
    Option(byRun.get(runId)).map(_.messages).getOrElse(0L)
  def rows(runId: UUID): Long =
    Option(byRun.get(runId)).map(_.rows).getOrElse(0L)
}
