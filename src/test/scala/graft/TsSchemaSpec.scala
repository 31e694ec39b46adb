package graft

import org.apache.spark.sql.types.TimestampType

/** Pins the `T.tbl` normalization invariant: whatever physical parquet
  * encoding the driver last wrote for `events.ts` (TIMESTAMP(NANOS)
  * read as nanos-long, or TIMESTAMP_NTZ from a µs/isAdjustedToUTC=false
  * file), the loaded frame must expose a plain UTC TimestampType so
  * every `unix_millis`/`window`/frame call site stays encoding-agnostic.
  * A driver-side testdata re-encoding broke 11 queries in round 7; this
  * spec makes the next one fail loudly in one obvious place. */
class TsSchemaSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every testdata table with a ts column loads it as TimestampType") {
    val withTs = tables.flatMap { name =>
      val df = T.tbl(spark, sfDir, name)
      df.schema.find(_.name == "ts").map(f => (name, f.dataType))
    }
    assert(withTs.nonEmpty, "expected at least one table with a ts column")
    withTs.foreach { case (name, dt) =>
      assert(dt == TimestampType,
        s"$name.ts loaded as $dt — T.tbl must normalize to TimestampType")
    }
  }

  test("normalized ts carries correct epoch millis (UTC instant parity)") {
    val ev = T.tbl(spark, sfDir, "events")
    val r = ev.selectExpr("min(unix_millis(ts)) AS lo", "max(unix_millis(ts)) AS hi")
      .collect()(0)
    val lo = r.getLong(0)
    val hi = r.getLong(1)
    // Driver data is generated in a sane modern range; a wrong-zone or
    // wrong-unit interpretation lands decades away or out of order.
    assert(lo > 946684800000L, s"min epoch-ms $lo predates 2000-01-01")
    assert(hi < 4102444800000L, s"max epoch-ms $hi is past 2100-01-01")
    assert(lo <= hi)
  }
}
