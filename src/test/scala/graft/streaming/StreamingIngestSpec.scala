package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s19: the streaming ingestion dedup gate is BATCHING-INVARIANT —
  * streaming the src1 shard through the gate in two micro-batches
  * (AvailableNow + maxFilesPerTrigger) produces exactly the verdicts
  * of one batch gate() call over the whole shard, because every
  * verdict is a pure function of (document, static index). Also
  * pins the left-join contract: every incoming doc gets exactly one
  * verdict row even when it shares nothing with the index.
  */
class StreamingIngestSpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("two-batch streamed verdicts equal the one-shot batch gate") {
    val docs = graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val idx = StreamingIngestDedup.buildIndex(
      docs.filter(col("source") =!= "src1").select("doc_id", "text"))

    val incoming = docs.filter(col("source") === "src1")
      .select("doc_id", "text").collect()
    assert(incoming.nonEmpty, "fixture must have src1 docs")

    // The gate must consume the CACHED index — without the persist a
    // second batch re-runs the corpus-wide shingle build per batch.
    val gatePlan = planString(StreamingIngestDedup.gate(
      docs.filter(col("source") === "src1").select("doc_id", "text"), idx))
    assert(gatePlan.contains("InMemoryTableScan") ||
      gatePlan.contains("TableCacheQueryStage"),
      s"the index side of the gate join must hit the cache:\n$gatePlan")

    // shard as two jsonl files, forced into two micro-batches
    val dir = tmp("ingest").resolve("landing")
    Files.createDirectories(dir)
    incoming.grouped((incoming.length + 1) / 2).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.write(dir.resolve(s"shard$i.jsonl"), chunk.map(r =>
          s"""{"doc_id": ${r.getLong(0)}, "text": "${escJson(r.getString(1))}"}""")
          .toSeq.asJava)
    }
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)

    val outDir = tmp("ingest-out").toString + "/verdicts"
    val q = StreamingIngestDedup.start(stream, idx, outDir,
      tmp("ingest-ckpt").toString)
    q.awaitTermination(120000)

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "best_match", "jaccard", "action").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
        .toSet
    val streamed = asSet(spark.read.parquet(outDir))
    val oneShot = asSet(StreamingIngestDedup.gate(
      docs.filter(col("source") === "src1").select("doc_id", "text"), idx))

    assert(streamed.size == incoming.length,
      s"one verdict per incoming doc: ${streamed.size} != ${incoming.length}")
    assert(streamed == oneShot,
      s"batching must not change verdicts: extra=${streamed.diff(oneShot)} missing=${oneShot.diff(streamed)}")

    // Replay idempotence: re-running the whole stream against the
    // SAME output dir (fresh checkpoint = every batch replays — the
    // worst-case at-least-once scenario) must REPLACE each batch's
    // partition, not duplicate verdicts.
    val q2 = StreamingIngestDedup.start(stream, idx, outDir,
      tmp("ingest-ckpt2").toString)
    q2.awaitTermination(120000)
    val replayed = spark.read.parquet(outDir).count()
    assert(replayed == incoming.length,
      s"replay must not duplicate verdicts: $replayed != ${incoming.length}")

    idx.release() // the refresh-cadence hook: unpin the cached trio
  }
}
