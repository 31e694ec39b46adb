package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.streaming.StreamingQuery

import scala.jdk.CollectionConverters._

/** Shared scaffolding for the transformWithState streaming specs: the
  * jsonl user-event fixture writer, the RocksDB provider guard, and
  * the ingestion/result pollers. ONE copy — a flakiness tweak to the
  * wait logic (e.g. around recentProgress only retaining the last ~100
  * updates) applies to every spec at once. */
trait StreamingSpecHarness { self: SparkSpec =>

  /** (user_id, event_id, ts_ms, event_type) rows as one jsonl batch
    * file — the file-source micro-batch fixture. */
  def writeUserEvents(dir: Path, file: String,
      es: Seq[(Long, Long, Long, String)]): Unit =
    Files.write(dir.resolve(file), es.map { case (u, e, ts, et) =>
      s"""{"user_id": $u, "event_id": $e, "ts_ms": $ts, "event_type": "$et"}"""
    }.asJava)

  /** transformWithState needs the RocksDB provider (named state,
    * timers); set for the body, always unset after. */
  def withRocksDB[T](body: => T): T = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Batch q56 truth (lag → break → running-sum → per-session agg)
    * over an in-memory event frame — the sessionization ground truth
    * every streaming parity spec compares against. ONE copy so the
    * fixture spec and the randomized spec can never drift apart. */
  def batchSessions(es: Seq[(Long, Long, Long, String)], gapMs: Long):
      Set[(Long, Long, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    es.toDF("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("brk",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  def ingested(q: StreamingQuery): Long =
    q.recentProgress.map(_.numInputRows).sum

  /** Poll until the query has ingested >= n rows (asserts on timeout). */
  def awaitIngest(q: StreamingQuery, n: Long, timeoutSec: Long = 60): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000 * 1000
    while (ingested(q) < n && System.nanoTime() < deadline) Thread.sleep(100)
    assert(ingested(q) >= n,
      s"timed out waiting for $n input rows (got ${ingested(q)})")
  }

  /** Poll until `cond` holds or the timeout passes (no assert — some
    * specs check a NEGATIVE afterwards). */
  def awaitCond(timeoutSec: Long = 60)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutSec * 1000L * 1000 * 1000
    while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
  }
}
