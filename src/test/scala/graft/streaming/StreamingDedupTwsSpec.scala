package graft.streaming

import java.nio.file.{Files, Path}
import java.time.Duration

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** transformWithState dedup: parity with the fMGWS operator, plus the
  * TTL retention contract (keeper state expires, so a duplicate
  * arriving after the window becomes a fresh keeper, not a verdict).
  *
  * Harness note: with TimeMode.ProcessingTime the engine schedules a
  * batch every trigger unconditionally (processing time always
  * advances, so `shouldRunAnotherBatch` never goes false) — both
  * `processAllAvailable` and Trigger.AvailableNow spin forever. Each
  * step therefore runs as its own throttled-trigger query against a
  * SHARED checkpoint (state and its wall-clock TTL survive restarts),
  * polls until the step's input rows are ingested, and stops
  * explicitly.
  */
class StreamingDedupTwsSpec extends SparkSpec with StreamingSpecHarness {

  private def tmp(p: String): Path = Files.createTempDirectory(p)
  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private val base =
    "the fast key order sort table scan merge part window small hash join"

  private def writeDocs(dir: Path, file: String, ds: Seq[(Long, String)]): Unit =
    Files.write(dir.resolve(file), ds.map { case (id, text) =>
      s"""{"doc_id": $id, "text": "$text"}"""
    }.asJava)

  /** One run over whatever is new in `dir`, returning the verdicts
    * THIS run emitted. Sink is foreachBatch (the memory sink cannot
    * recover from a checkpoint, foreachBatch can). Polls ingestion
    * progress (sum of numInputRows across progress reports) up to a
    * deadline, then stops the query. */
  private def runOnce(dir: Path, ckpt: Path, ttl: Duration,
      expectInput: Long): Set[(Long, Long)] = {
    val collected =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
    val stream = spark.readStream.schema(schema).json(dir.toString)
    val q = StreamingDedupTws(stream, ttl)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("doc_id", "dup_of").collect()
          .foreach(r => collected.add((r.getLong(0), r.getLong(1))))
      }
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      awaitIngest(q, expectInput)
      Thread.sleep(500) // grace: let the emitting batch commit to the sink
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    collected.asScala.toSet
  }

  test("without ttl, tws dedup matches the fmgws operator's verdicts") {
    withRocksDB {
      val dir = tmp("twsd1")
      val ckpt = tmp("ckpt1")
      writeDocs(dir, "b1.jsonl", Seq(1L -> base, 3L -> ("unrelated stream " +
        "state value batch row group filter customer line tokens about")))
      val v1 = runOnce(dir, ckpt, ttl = null, expectInput = 2)
      writeDocs(dir, "b2.jsonl", Seq(2L -> (base + " extra"), 4L -> base))
      val v2 = runOnce(dir, ckpt, ttl = null, expectInput = 2)
      assert(v1.isEmpty)
      assert(v2.map(_._1) == Set(2L, 4L))
      assert(v2.forall(_._2 == 1L))
    }
  }

  test("keeper state expires after ttl: late duplicate becomes a fresh keeper") {
    withRocksDB {
      val dir = tmp("twsd2")
      val ckpt = tmp("ckpt2")
      writeDocs(dir, "b1.jsonl", Seq(1L -> base))
      val v1 = runOnce(dir, ckpt, ttl = Duration.ofMillis(500), expectInput = 1)
      Thread.sleep(1500) // let batch-1's keeper state pass its TTL
      writeDocs(dir, "b2.jsonl", Seq(4L -> base))
      val v2 = runOnce(dir, ckpt, ttl = Duration.ofMillis(500), expectInput = 1)
      // doc 4 is an exact dup of doc 1, but arrives after the window:
      // state expired, so it is a fresh keeper and NOT flagged
      assert(v1.isEmpty && v2.isEmpty, s"expected no verdicts, got $v1 / $v2")
    }
  }

  test("within ttl, duplicates are still flagged") {
    withRocksDB {
      val dir = tmp("twsd3")
      val ckpt = tmp("ckpt3")
      writeDocs(dir, "b1.jsonl", Seq(1L -> base))
      val v1 = runOnce(dir, ckpt, ttl = Duration.ofMinutes(10), expectInput = 1)
      writeDocs(dir, "b2.jsonl", Seq(4L -> base))
      val v2 = runOnce(dir, ckpt, ttl = Duration.ofMinutes(10), expectInput = 1)
      assert(v1.isEmpty)
      assert(v2 == Set(4L -> 1L))
    }
  }
}
