package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ShardWriter: the landed layout honors the partition scheme and the
  * per-file row bound, the manifest accounts for every row, and a
  * re-read round-trips the corpus exactly.
  */
class ShardWriterSpec extends SparkSpec {

  test("publish lands a bounded, partitioned, fully-accounted layout") {
    import spark.implicits._
    val docs = graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val n = docs.count()
    val out = Files.createTempDirectory("shards").toString + "/corpus"

    val manifest = ShardWriter.publish(docs, out, "source", 10L).collect()

    // every file respects the bound; every row is accounted for
    assert(manifest.forall(_.getLong(2) <= 10L),
      s"file over the row bound: ${manifest.filter(_.getLong(2) > 10L).mkString}")
    assert(manifest.map(_.getLong(2)).sum == n,
      "manifest must account for every published row")
    // layout is partition-directory structured (prunable on read)
    assert(manifest.forall(_.getString(1).contains("source=")),
      "files must land under source=<value> partition dirs")
    val sources = docs.select("source").distinct().as[String].collect().toSet
    assert(manifest.map(_.getString(0)).toSet == sources,
      "every source must have at least one landed file")

    // round-trip: the published corpus re-reads exactly
    val back = spark.read.parquet(out)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val orig = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == orig, "published corpus must round-trip bit-exactly")
  }

  test("an empty (fully-gated) publish reports an empty manifest, not a crash") {
    val docs = graft.T.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .filter(lit(false))
    val out = Files.createTempDirectory("shards-empty").toString + "/corpus"
    assert(ShardWriter.publish(docs, out, "source", 10L).count() == 0)
  }
}
