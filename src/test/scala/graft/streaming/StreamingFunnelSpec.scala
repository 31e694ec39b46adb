package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s16: the streaming funnel must emit exactly the CONVERTED rows the
  * batch q78 chain computes — same stage timestamps — and nothing for
  * users whose funnel never completes.
  *
  * Fixture (events per user, all within one watermark horizon):
  *   user 1: view t0, click t0+1m, purchase t0+2m      — converts
  *   user 2: click t0, view t0+1m, purchase t0+2m      — click precedes
  *           every view → never converts
  *   user 3: view t0, purchase t0+1m                   — no click → no
  *   user 4: view t0, click t0 (tie → rejected by strict >),
  *           click t0+1m, purchase t0+3m               — converts
  *   user 5: staged ACROSS batches (view | click, purchase) — converts,
  *           proving stage state survives batch boundaries
  */
class StreamingFunnelSpec extends SparkSpec with StreamingSpecHarness {

  private val t0 = 1700000000000L
  private val m = 60L * 1000

  private val schema = new StructType()
    .add("user_id", LongType).add("event_id", LongType)
    .add("ts_ms", LongType).add("event_type", StringType)

  private val batch1 = Seq(
    (1L, 101L, t0, "view"),
    (1L, 102L, t0 + 1 * m, "click"),
    (1L, 103L, t0 + 2 * m, "purchase"),
    (2L, 201L, t0, "click"),
    (2L, 202L, t0 + 1 * m, "view"),
    (2L, 203L, t0 + 2 * m, "purchase"),
    (3L, 301L, t0, "view"),
    (3L, 302L, t0 + 1 * m, "purchase"),
    (4L, 401L, t0, "view"),
    (4L, 402L, t0, "click"),
    (4L, 403L, t0 + 1 * m, "click"),
    (4L, 404L, t0 + 3 * m, "purchase"),
    (5L, 501L, t0, "view"))
  private val batch2 = Seq(
    (5L, 502L, t0 + 5 * m, "click"),
    (5L, 503L, t0 + 6 * m, "purchase"))

  /** The q78 chain over an in-memory frame, filtered to converted
    * users — the batch truth the stream must match. */
  private def batchConverted(es: Seq[(Long, Long, Long, String)]): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy("user_id")
    es.toDF("user_id", "event_id", "ts_ms", "event_type")
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts_ms") > col("t_view"),
          col("ts_ms"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts_ms") > col("t_click"),
          col("ts_ms"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t_view")).as("tv"), min(col("t_click")).as("tc"),
        min(col("t_purchase")).as("tp"))
      .filter(col("tp").isNotNull)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("streaming funnel emits exactly the batch q78 converted rows") {
    withRocksDB {
      val dir = Files.createTempDirectory("funnel_in")
      val ckpt = Files.createTempDirectory("funnel_ckpt")
      val collected = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, Long, Long, Long)]()

      writeUserEvents(dir, "b1.jsonl", batch1)
      val stream = spark.readStream.schema(schema).json(dir.toString)
      val q = StreamingFunnel(stream, "1 second")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("user_id", "t_view_ms", "t_click_ms", "t_purchase_ms")
            .collect().foreach(r => collected.add((r.getLong(0), r.getLong(1),
              r.getLong(2), r.getLong(3))))
        }
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        awaitIngest(q, batch1.size.toLong)
        // users 1 and 4 complete within batch 1; user 5 must NOT have
        // emitted yet (funnel half-armed across the batch boundary).
        awaitCond()(collected.size >= 2)
        assert(!collected.asScala.exists(_._1 == 5L),
          s"user 5's funnel is still open, got $collected")

        writeUserEvents(dir, "b2.jsonl", batch2)
        awaitIngest(q, (batch1.size + batch2.size).toLong)
        awaitCond()(collected.size >= 3)
      } finally q.stop()

      val expected = batchConverted(batch1 ++ batch2)
      assert(collected.asScala.toSet == expected,
        s"stream conversions must equal batch q78 converted rows:\n" +
          s"got      ${collected.asScala.toSet}\nexpected $expected")
      assert(!collected.asScala.exists(t => t._1 == 2L || t._1 == 3L),
        "users without a qualifying click→purchase chain must not emit")
    }
  }
}
