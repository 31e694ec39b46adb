package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s20: the dead-letter quarantine accounts for every landed line —
  * valid rows flow through intact, malformed lines (broken JSON and
  * type mismatches) are captured VERBATIM with their batch id, and
  * valid + quarantined = total ingested (nothing silently nulled).
  */
class DeadLetterSpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("valid rows pass, corrupt lines are quarantined verbatim, nothing is lost") {
    val dir = tmp("dl").resolve("landing")
    Files.createDirectories(dir)
    val good0 = Seq(
      """{"doc_id": 1, "text": "alpha beta"}""",
      """{"doc_id": 2, "text": "gamma"}""")
    val mixed = Seq(
      """{"doc_id": 3, "text": "delta"}""",
      """{broken json line""",
      """{"doc_id": "not a number", "text": "epsilon"}""",
      """{"doc_id": 4, "text": "zeta"}""")
    Files.write(dir.resolve("b0.jsonl"), good0.asJava)
    Files.write(dir.resolve("b1.jsonl"), mixed.asJava)

    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add(DeadLetter.CorruptCol, StringType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("columnNameOfCorruptRecord", DeadLetter.CorruptCol)
      .json(dir.toString)

    val goodDir = tmp("dl-good").toString + "/rows"
    val badDir = tmp("dl-bad").toString + "/raw"
    val q = DeadLetter.start(stream, goodDir, badDir, tmp("dl-ckpt").toString)
    q.awaitTermination(120000)

    val good = spark.read.parquet(goodDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "alpha beta"), (2L, "gamma"),
      (3L, "delta"), (4L, "zeta")), s"got $good")

    val bad = spark.read.parquet(badDir)
      .select("raw_line").collect()
      .map(r => r.getString(0)).toSet
    assert(bad == Set("""{broken json line""",
      """{"doc_id": "not a number", "text": "epsilon"}"""),
      s"corrupt lines must be captured verbatim: $bad")

    assert(good.size + bad.size == good0.size + mixed.size,
      "valid + quarantined must account for every landed line")

    // Replay idempotence: a full re-run against the same sinks (fresh
    // checkpoint = every batch replays) must replace, not duplicate —
    // the accounting invariant has to survive at-least-once delivery.
    val q2 = DeadLetter.start(stream, goodDir, badDir,
      tmp("dl-ckpt2").toString)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(goodDir).count() == good.size &&
      spark.read.parquet(badDir).count() == bad.size,
      "replay must not duplicate rows in either sink")
  }
}
