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
    // the listener bus is async — give queued task-end events a
    // moment to drain before reading the counter
    var last = -1L
    while (spilled.get() != last) { last = spilled.get(); Thread.sleep(500) }
    println(s"SPILL_PROBE ok spilled=${spilled.get()}")
    spark.stop()
  }
}
