package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s15: the watermarked stream-stream conversion join must produce
  * exactly the rows of the identical batch join over the same events —
  * including a click matching MULTIPLE purchases, a purchase outside
  * the window matching nothing, and a user with no purchases at all. */
class StreamingJoinSpec extends SparkSpec {

  private val t0 = 1700000000000L
  private val WindowMs = 10L * 60 * 1000

  private val schema = new StructType()
    .add("user_id", LongType).add("event_id", LongType).add("ts_ms", LongType)

  // user 1: clicks at t0 and t0+2m; purchase at t0+5m (in-window for
  // both clicks) and t0+30m (out of window for both).
  // user 2: click only. user 3: purchase only.
  private val clicks = Seq(
    (1L, 101L, t0), (1L, 102L, t0 + 2 * 60 * 1000), (2L, 201L, t0))
  private val purchases = Seq(
    (1L, 901L, t0 + 5 * 60 * 1000), (1L, 902L, t0 + 30 * 60 * 1000),
    (3L, 903L, t0 + 60 * 1000))

  private def writeJson(dir: Path, es: Seq[(Long, Long, Long)]): Unit =
    Files.write(dir.resolve("b.jsonl"), es.map { case (u, e, ts) =>
      s"""{"user_id": $u, "event_id": $e, "ts_ms": $ts}"""
    }.asJava)

  test("stream-stream conversion join equals the batch join") {
    import spark.implicits._
    val cDir = Files.createTempDirectory("sj_clicks")
    val pDir = Files.createTempDirectory("sj_purch")
    writeJson(cDir, clicks)
    writeJson(pDir, purchases)

    val joined = StreamingJoin.conversions(
      spark.readStream.schema(schema).json(cDir.toString),
      spark.readStream.schema(schema).json(pDir.toString),
      WindowMs)
    assert(joined.isStreaming, "must be a genuine stream-stream join")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .option("checkpointLocation",
        Files.createTempDirectory("sj_ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sj_out")
      .as[(Long, Long, Long, Long)].collect().toSet

    def batchDf(es: Seq[(Long, Long, Long)]): DataFrame =
      es.toDF("user_id", "event_id", "ts_ms")
    val c = batchDf(clicks)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_ms").as("click_ms"))
    val p = batchDf(purchases)
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts_ms").as("purchase_ms"))
    val expected = c.join(p,
        col("user_id") === col("pu") &&
          col("purchase_ms") >= col("click_ms") &&
          col("purchase_ms") <= col("click_ms") + WindowMs)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_ms") - col("click_ms")).as("delay_ms"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(expected == Set(
      (1L, 101L, 901L, 5L * 60 * 1000),
      (1L, 102L, 901L, 3L * 60 * 1000)), s"fixture sanity: $expected")
    assert(got == expected,
      s"stream join must equal batch join:\ngot      $got\nexpected $expected")
  }
}
