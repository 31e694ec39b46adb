package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** End-to-end ingestion pipeline (the s19+s20+ShardWriter
  * composition, accounting asserted at every boundary — the q55
  * discipline applied to the streaming side): a landing directory of
  * jsonl shards, some lines corrupt, flows through
  *
  *   quarantine (s20) → index dedup gate (s19) → keep-filter →
  *   batch_id-idempotent staging → final ShardWriter publish
  *
  * and every landed line is accounted for exactly once:
  * corrupt + dropped + published = total.
  */
class IngestPublishE2ESpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("landing -> quarantine -> gate -> publish accounts for every line") {
    val docs = graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val idx = StreamingIngestDedup.buildIndex(
      docs.filter(col("source") =!= "src1").select("doc_id", "text"))
    val incoming = docs.filter(col("source") === "src1")
      .select("doc_id", "text").collect()

    // landing dir: two shards, the second with two corrupt lines
    val dir = tmp("e2e").resolve("landing")
    Files.createDirectories(dir)
    val lines = incoming.map(r =>
      s"""{"doc_id": ${r.getLong(0)}, "text": "${escJson(r.getString(1))}"}""")
    val (a, b) = lines.splitAt((lines.length + 1) / 2)
    Files.write(dir.resolve("s0.jsonl"), a.toSeq.asJava)
    Files.write(dir.resolve("s1.jsonl"),
      (b ++ Seq("""{torn record""", """{"doc_id": "NaN", "text": 3}"""))
        .toSeq.asJava)

    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add(DeadLetter.CorruptCol, StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("columnNameOfCorruptRecord", DeadLetter.CorruptCol)
      .json(dir.toString)

    val badDir = tmp("e2e-bad").toString + "/raw"
    val stageDir = tmp("e2e-stage").toString + "/kept"
    val q = stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val cached = batch.persist()
      try {
        val (good, bad) = DeadLetter.split(cached)
        IdempotentSink.putBatch(bad, id, badDir)
        val verdicts = StreamingIngestDedup.gate(good, idx)
        IdempotentSink.putBatch(good.join(
          verdicts.filter(col("action") === "keep").select("doc_id"),
          Seq("doc_id"), "left_semi"), id, stageDir)
      } finally { cached.unpersist(); () }
    }
      .option("checkpointLocation", tmp("e2e-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // nightly compaction: publish the staged keepers as read-shards
    val staged = spark.read.parquet(stageDir).select(
      col("doc_id"), col("text"),
      pmod(graft.T.phash(concat(lit("shard:"), col("doc_id"))), lit(4))
        .as("shard"))
    val outDir = tmp("e2e-out").toString + "/corpus"
    val manifest = graft.sinks.ShardWriter.publish(staged, outDir, "shard", 10L)

    // boundary accounting
    val nBad = spark.read.parquet(badDir).count()
    assert(nBad == 2, s"both corrupt lines quarantined: $nBad")
    val expectKept = StreamingIngestDedup.gate(
      docs.filter(col("source") === "src1").select("doc_id", "text"), idx)
      .filter(col("action") === "keep").count()
    val published = spark.read.parquet(outDir).count()
    assert(published == expectKept,
      s"published ($published) must equal the one-shot gate's keepers ($expectKept)")
    assert(manifest.agg(sum("rows")).head.getLong(0) == published,
      "the manifest must account for every published row")
    // total accounting: corrupt + dropped + published = landed lines
    val dropped = incoming.length - expectKept
    assert(nBad + dropped + published == lines.length + 2,
      "every landed line is exactly one of corrupt/dropped/published")

    idx.release()
  }
}
