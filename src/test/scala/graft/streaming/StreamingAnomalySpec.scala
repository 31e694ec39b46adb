package graft.streaming

import java.nio.file.{Files, Path}

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** s18: the streaming z-score gate equals batch q82 on the same
  * events — the stream sees the sf0.001 events in two micro-batches
  * against the static per-type moments built from the same corpus,
  * and its append-mode flags must equal q82's rows exactly
  * (event_id, z bit-for-bit: both sides run the shared zGate body on
  * the same doubles — Double round-trips through jsonl losslessly).
  */
class StreamingAnomalySpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("zStats excludes degenerate types (n=1, zero variance) deterministically") {
    import spark.implicits._
    // A single-event type makes the sample variance 0/0 (NaN std) and
    // a constant type makes std = 0 (z = ±Inf): both previously leaked
    // NaN/Inf z into the gate, passing or failing on NaN total-order
    // semantics. The stats side must drop them so no z is ever
    // non-finite — the s18 static window plausibly contains such types.
    val e = Seq(
      (1L, "solo", 5.0),
      (2L, "flat", 1.0), (3L, "flat", 1.0),
      (4L, "ok", 0.0), (5L, "ok", 100.0), (6L, "ok", 50.0))
      .toDF("event_id", "event_type", "value")
    val stats = graft.queries.Extras.zStats(e)
    assert(stats.select("event_type").as[String].collect().toSet == Set("ok"),
      "degenerate types must be excluded from the stats side")
    val z = graft.queries.Extras.zGate(e, stats)
      .select("z").as[Double].collect()
    assert(z.forall(java.lang.Double.isFinite), s"non-finite z leaked: ${z.toSeq}")
  }

  test("stream-static z-score gate matches batch q82 exactly") {
    val events = graft.T.tbl(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value")).collect()

    val stats = graft.queries.Extras
      .zStats(graft.T.tbl(spark, sfDir, "events"))

    val dir = tmp("anom").resolve("events")
    Files.createDirectories(dir)
    // escJson + the finiteness guard: a corrupted line (bad escape or
    // a non-finite double, invalid as a JSON number) would parse to
    // nulls under the PERMISSIVE reader and silently shrink the
    // streamed side.
    events.grouped((events.length + 1) / 2).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.write(dir.resolve(s"b$i.jsonl"), chunk.map { r =>
          assert(java.lang.Double.isFinite(r.getDouble(2)),
            s"fixture value must be a valid JSON number: $r")
          s"""{"event_id": ${r.getLong(0)}, "event_type": "${escJson(r.getString(1))}", "value": ${r.getDouble(2)}}"""
        }.toSeq.asJava)
    }
    val schema = new StructType()
      .add("event_id", LongType).add("event_type", StringType)
      .add("value", DoubleType)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)

    val q = StreamingAnomalyGate(stream, stats)
      .writeStream.format("memory").queryName("anom_out")
      .option("checkpointLocation", tmp("ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("anom_out")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("q82_zscore_anomaly")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
    assert(batch.nonEmpty, "fixture must flag at least one anomaly")
    assert(streamed == batch,
      s"stream flags must equal batch q82: extra=${streamed.diff(batch)} missing=${batch.diff(streamed)}")
  }
}
