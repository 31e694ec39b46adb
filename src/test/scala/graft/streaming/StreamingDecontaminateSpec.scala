package graft.streaming

import java.nio.file.{Files, Path}

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s17: the streaming decontamination gate equals batch q84 on the
  * same corpus — the stream sees the sf0.001 training docs (source <>
  * 'src0') in two micro-batches against the static src0 eval gram
  * set, and the per-doc rollup of its append-mode hits must equal
  * q84's (doc_id, n_hits) exactly.
  */
class StreamingDecontaminateSpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("stream-static 8-gram gate matches batch q84 per-doc hit counts") {
    import spark.implicits._
    val docs = graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source")).collect()

    // static eval grams from the batch side's own scheme
    val evalGrams = graft.T.tbl(spark, sfDir, "documents")
      .filter(col("source") === "src0")
      .select(graft.functions.GramHash
        .tokenHashes(split(col("text"), " ")).as("hh"))
      .select(explode(graft.functions.GramHash
        .gram8FromTokenHashes(col("hh"))).as("h"))
      .distinct()

    // training docs as two jsonl micro-batch files
    val dir = tmp("decon").resolve("docs")
    Files.createDirectories(dir)
    val train = docs.filter(_.getString(2) != "src0")
    train.grouped((train.length + 1) / 2).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.write(dir.resolve(s"b$i.jsonl"), chunk.map(r =>
          s"""{"doc_id": ${r.getLong(0)}, "text": "${escJson(r.getString(1))}"}""")
          .toSeq.asJava)
    }
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)

    val q = StreamingDecontaminate(stream, evalGrams)
      .writeStream.format("memory").queryName("decon_out")
      .option("checkpointLocation", tmp("ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("decon_out")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = SparkEntry.queries("q84_bloom_decontaminate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce at least one contaminated doc")
    assert(streamed == batch,
      s"stream hits $streamed must equal batch q84 $batch")
  }

  /** The stream-static eval broadcast rides the batch q58 fence: the
    * static side is counted once at stream-build time, and past
    * T.VocabBroadcastCap the per-micro-batch broadcast flips to a
    * shuffled hash build. apply() is plan-level, so the flip is
    * asserted on batch frames (same plan the micro-batches replay). */
  test("eval-gram fence: broadcast below the vocab cap, shuffled hash build above") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val small = spark.range(10).select(col("id").as("h"))
    val below = planString(StreamingDecontaminate(docs, small))
    assert(below.contains("BroadcastHashJoin") && !below.contains("ShuffledHashJoin"),
      s"small eval set must broadcast:\n$below")
    val big = spark.range(graft.T.VocabBroadcastCap + 1).select(col("id").as("h"))
    val above = planString(StreamingDecontaminate(docs, big))
    assert(above.contains("ShuffledHashJoin") && !above.contains("SortMergeJoin"),
      s"oversized eval set must hash-build, never sort the doc stream:\n$above")
  }
}
