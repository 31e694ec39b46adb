package graft.scale

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Subprocess entry for the spill-discipline proof (ScaleSpec): runs
  * one inventory query start-to-finish inside a deliberately
  * memory-starved JVM (the caller passes a small -Xmx, a low
  * `spark.memory.fraction`, and force-spill thresholds as system
  * properties, which SparkSession picks up as conf) and reports the
  * bytes execution spilled. Completing here — by spilling to disk,
  * not OOMing — is the discipline a 100 TB executor needs when a
  * partition outgrows its memory share: every blocking operator in
  * the hot queries (shuffle write, sort, window buffer, hash-agg
  * fallback) must degrade to its external implementation.
  *
  * Usage: SpillProbe <query_id> <sfDir>; prints
  * `SPILL_PROBE ok spilled=<bytes>` on success.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    graft.Bench.exec(graft.SparkEntry.queries(name)(spark, sfDir))
    // The listener bus is async and this JVM is deliberately starved,
    // so a GC pause can stall dispatch well past a naive settle check.
    // All tasks HAVE ended (exec is synchronous); wait until the
    // counter is stable across three consecutive 1 s reads, capped at
    // 60 s — under-reporting here would flake the spill assertion.
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var last = -1L
    var stable = 0
    while (stable < 3 && System.nanoTime() < deadline) {
      val now = spilled.get()
      if (now == last) stable += 1 else { stable = 0; last = now }
      Thread.sleep(1000)
    }
    println(s"SPILL_PROBE ok spilled=${spilled.get()}")
    spark.stop()
  }
}
