package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Degenerate-input robustness sweep (round 10): every registered
  * query must PLAN and EXECUTE against a zero-row corpus — same
  * schemas, no data — without throwing, and must keep its column
  * names (the oracle-compare contract surface).
  *
  * At 100 TB this is not a corner case: a date-partition filter that
  * matches nothing, a shard with an empty stratum, a fresh ingest dir
  * before the first batch lands — all hand an operator the empty
  * frame. A driver-side scalar derivation that `.head`s a collected
  * row, a fence ladder that divides by a corpus count, or a centroid
  * seed taken from "the first k vectors" each crash exactly here and
  * nowhere else in the test pyramid (QueriesSpec asserts rows > 0 at
  * sf0.001, so the empty frame was previously never executed).
  *
  * No row-count assertion: a global aggregate legitimately returns
  * its one zero/null row on empty input, everything else returns
  * zero rows — both are correct; only crashes and schema drift are
  * defects.
  */
class DegenerateInputSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // route through T.tbl so the written encodings are the NORMALIZED
    // ones (events.ts nanos-long and the NTZ date columns come out as
    // plain UTC timestamps — re-reading them takes T.tbl's no-op
    // branch and the loaded schemas match the sf0.001 ones exactly)
    tables.foreach { t =>
      graft.T.tbl(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name survives an empty corpus") {
      val full = fn(spark, sfDir).schema.fieldNames.toSeq
      val df = fn(spark, emptyDir)
      assert(df.schema.fieldNames.toSeq == full,
        s"$name schema drifts on empty input: ${df.schema.fieldNames.toSeq} vs $full")
      df.collect() // must not throw
    }
  }
}
