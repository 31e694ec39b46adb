package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

class StreamingDedupSpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  private val base =
    "the fast key order sort table scan merge part window small hash join"
  private val docs = Seq(
    (1L, base), // keeper
    (2L, base + " extra"), // near-dup of 1 (shares almost all shingles)
    (3L, "completely different tokens about stream state value batch " +
      "row group filter customer line"), // unrelated
    (4L, base) // exact dup of 1
  )

  test("streaming near-dup flags later arrivals against first-seen state") {
    val dir = tmp("sd").resolve("docs")
    Files.createDirectories(dir)
    Files.write(dir.resolve("docs.jsonl"), docs.map { case (id, text) =>
      s"""{"doc_id": $id, "text": "$text"}"""
    }.asJava)
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val stream = spark.readStream.schema(schema).json(dir.toString)
    val q = StreamingDedup(stream)
      .writeStream.format("memory").queryName("dedup_stream_out")
      .option("checkpointLocation", tmp("ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val verdicts = spark.table("dedup_stream_out")
      .select("doc_id", "dup_of").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 2 and 4 flagged as duplicates of 1; doc 3 clean
    assert(verdicts.map(_._1) == Set(2L, 4L))
    assert(verdicts.forall(_._2 == 1L))
  }

  test("band signatures agree between batch and stream code path") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val sigs = StreamingDedup.bandSignatures(df).collect()
    assert(sigs.length == docs.length * 4) // 4 bands per doc
    // exact duplicates share ALL band signatures
    val byDoc = sigs.groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getString(2))).toSet)
    assert(byDoc(1L) == byDoc(4L))
    assert(byDoc(1L) != byDoc(3L))
  }
}
