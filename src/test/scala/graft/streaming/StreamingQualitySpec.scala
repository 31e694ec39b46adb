package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s21: the streaming quality gate equals the batch q33 score + gate
  * on the same corpus — the stream sees the sf0.001 documents in two
  * micro-batches and its append-mode survivors must equal the batch
  * side's (doc_id, quality) at the same threshold, quality
  * bit-for-bit (one shared row-local body on both sides).
  */
class StreamingQualitySpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("stream survivors equal batch q33 gate, scores bit-exact") {
    val docs = graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()

    val dir = tmp("qual").resolve("docs")
    Files.createDirectories(dir)
    docs.grouped((docs.length + 1) / 2).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.write(dir.resolve(s"b$i.jsonl"), chunk.map(r =>
          s"""{"doc_id": ${r.getLong(0)}, "text": "${escJson(r.getString(1))}"}""")
          .toSeq.asJava)
    }
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)

    val q = StreamingQualityGate(stream, 0.6)
      .writeStream.format("memory").queryName("qual_out")
      .option("checkpointLocation", tmp("qual-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("qual_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = graft.queries.TextAnalysis
      .qualityScored(graft.T.tbl(spark, sfDir, "documents"))
      .filter(col("quality") >= 0.6)
      .select("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(batch.nonEmpty && batch.size < docs.length,
      "threshold must be selective, not vacuous")
    assert(streamed == batch,
      s"stream survivors must equal batch: extra=${streamed.diff(batch)} missing=${batch.diff(streamed)}")
  }
}
