package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s14: streaming sessionization must reproduce the batch q56 session
  * boundaries — ids, spans and composition — over the same events,
  * exercising BOTH close paths: arrival-close (a later same-user event
  * beyond the gap) and timer-close (watermark passes last_event + gap
  * with no further events).
  *
  * Fixture timeline (gap = 30 min, watermark delay = 1 s):
  *   user 1: t0, t0+10m           — session 1 (closed by the t0+45m arrival)
  *           t0+45m, t0+50m       — session 2 (closed by timer)
  *   user 2: t0+5m (purchase)     — session 1 (closed by timer)
  * A far-future sentinel event (user 999) advances the watermark past
  * every open session's gap so the timers fire; the sentinel's own
  * session stays open and must NOT be emitted.
  */
class StreamingSessionizeSpec extends SparkSpec with StreamingSpecHarness {

  private val GapMs = 30L * 60 * 1000
  private val t0 = 1700000000000L

  private val schema = new StructType()
    .add("user_id", LongType).add("event_id", LongType)
    .add("ts_ms", LongType).add("event_type", StringType)

  private val batch1 = Seq(
    (1L, 101L, t0, "view"),
    (1L, 102L, t0 + 10 * 60 * 1000, "click"),
    (2L, 201L, t0 + 5 * 60 * 1000, "purchase"))
  private val batch2 = Seq(
    (1L, 103L, t0 + 45 * 60 * 1000, "purchase"),
    (1L, 104L, t0 + 50 * 60 * 1000, "view"))
  private val sentinel = Seq(
    (999L, 901L, t0 + 10L * 60 * 60 * 1000, "view"))

  /** The q56 chain over an in-memory frame — the batch truth the
    * stream must match (shared harness copy). */
  private def batchSessions(es: Seq[(Long, Long, Long, String)]): Set[(Long, Long, Long, Long, Long, Long)] =
    batchSessions(es, GapMs)

  test("streaming sessions match batch q56 boundaries via both close paths") {
    withRocksDB {
      val dir = Files.createTempDirectory("sess_in")
      val ckpt = Files.createTempDirectory("sess_ckpt")
      val collected = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, Long, Long, Long, Long, Long)]()

      writeUserEvents(dir, "b1.jsonl", batch1)
      val stream = spark.readStream.schema(schema).json(dir.toString)
      val q = StreamingSessionize(stream, GapMs, "1 second")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("user_id", "session_id", "start_ms", "end_ms",
              "n_events", "n_purchases")
            .collect().foreach(r => collected.add((r.getLong(0), r.getLong(1),
              r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        }
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        awaitIngest(q, batch1.size.toLong)
        writeUserEvents(dir, "b2.jsonl", batch2)
        awaitIngest(q, (batch1.size + batch2.size).toLong)
        // user 1's first session closes on ARRIVAL of the t0+45m event.
        // batch2 also advances the watermark to t0+50m−1s, PAST user
        // 2's t0+35m timer — so user 2's session may close here too
        // (timer path), timing-dependent. User 1's session 2 (timer at
        // t0+80m) must NOT appear before the sentinel.
        val u1s1 = (1L, 1L, t0, t0 + 10 * 60 * 1000, 2L, 0L)
        val u2s1 = (2L, 1L, t0 + 5 * 60 * 1000, t0 + 5 * 60 * 1000, 1L, 1L)
        awaitCond()(collected.size >= 1)
        assert(collected.asScala.contains(u1s1),
          s"arrival-close should emit user 1 session 1, got $collected")
        assert(collected.asScala.toSet.subsetOf(Set(u1s1, u2s1)),
          s"user 1 session 2 must still be open, got $collected")

        // Sentinel pushes the watermark past every open gap → timers
        // fire for user 1 session 2 and user 2 session 1.
        writeUserEvents(dir, "b3.jsonl", sentinel)
        awaitCond()(collected.size >= 3)
      } finally q.stop()

      val expected = batchSessions(batch1 ++ batch2)
      assert(collected.asScala.toSet == expected,
        s"stream sessions must equal batch q56 sessions:\n" +
          s"got      ${collected.asScala.toSet}\nexpected $expected")
      assert(!collected.asScala.exists(_._1 == 999L),
        "the sentinel's still-open session must not be emitted")
    }
  }

  /** The exact (buffer-until-watermark) variant closes the default's
    * documented cross-batch disorder gap. Fixture (gap 30 min,
    * watermark delay 40 min): batch 1 delivers t0 then t0+50m — the
    * O(1) default immediately arrival-closes {t0} as a session; batch
    * 2 delivers t0+20m, which stitches all three events into ONE batch
    * session (every gap ≤ 30 min) — an assignment the default can no
    * longer produce, but the exact variant must. */
  test("exact variant matches batch q56 under cross-batch out-of-order events") {
    withRocksDB {
      val b1 = Seq(
        (1L, 101L, t0, "view"),
        (1L, 102L, t0 + 50 * 60 * 1000, "purchase"))
      // older than user 1's open session, admitted by the 40m watermark
      val b2 = Seq((1L, 103L, t0 + 20 * 60 * 1000, "click"))
      val sentinelB = Seq((999L, 901L, t0 + 10L * 60 * 60 * 1000, "view"))

      val dir = Files.createTempDirectory("sessx_in")
      val ckpt = Files.createTempDirectory("sessx_ckpt")
      val collected = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, Long, Long, Long, Long, Long)]()

      writeUserEvents(dir, "b1.jsonl", b1)
      val stream = spark.readStream.schema(schema).json(dir.toString)
      val q = StreamingSessionize(stream, GapMs, "40 minutes", exact = true)
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("user_id", "session_id", "start_ms", "end_ms",
              "n_events", "n_purchases")
            .collect().foreach(r => collected.add((r.getLong(0), r.getLong(1),
              r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        }
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        awaitIngest(q, b1.size.toLong)
        // nothing may close yet: the only provable prefix is {t0}
        // (wm = t0+10m), whose session stays open pending t0+20m
        assert(collected.isEmpty,
          s"exact variant must not close before the watermark proves it, got $collected")
        writeUserEvents(dir, "b2.jsonl", b2)
        awaitIngest(q, (b1.size + b2.size).toLong)
        writeUserEvents(dir, "b3.jsonl", sentinelB)
        awaitCond()(!collected.isEmpty)
      } finally q.stop()

      val expected = batchSessions(b1 ++ b2)
      assert(collected.asScala.toSet == expected,
        s"exact stream sessions must equal batch q56 sessions:\n" +
          s"got      ${collected.asScala.toSet}\nexpected $expected")
      // the fixture really is the divergence case: one stitched session
      assert(expected == Set((1L, 1L, t0, t0 + 50 * 60 * 1000, 3L, 1L)))
    }
  }
}
