package graft

import org.apache.spark.sql.functions._

/** The snapshot-scalar caches key on dir CONTENT, not dir path
  * (T.dirFingerprint): a dir rewritten in place within one JVM — the
  * round-7 testdata-regen failure mode, or a test overwriting a tmp
  * path — must yield fresh scalars, never silently replay the previous
  * corpus's counts/centroids. */
class SnapshotCacheSpec extends SparkSpec {

  test("snapScalar invalidates when the dir's parquet bytes change in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-snapfp").toString
    spark.range(100).select(col("id").as("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(T.snapCount(spark, tmp, "embeddings") == 100L)
    // memoized: a second read is served from cache (compute not re-run)
    var computed = false
    T.snapScalar(tmp, "count:embeddings") { computed = true; -1L }
    assert(!computed, "unchanged dir must serve the memoized scalar")
    // in-place rewrite → new fingerprint → fresh count, not stale 100
    Thread.sleep(5) // ensure mtime can differ even on coarse clocks
    spark.range(250).select(col("id").as("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(T.snapCount(spark, tmp, "embeddings") == 250L,
      "rewritten dir must re-derive the scalar")
  }

  test("fingerprint is stable across reads and distinct across contents") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-snapfp2").toString
    spark.range(10).write.mode("overwrite").parquet(s"$tmp/t.parquet")
    val f1 = T.dirFingerprint(tmp)
    assert(T.dirFingerprint(tmp) == f1)
    Thread.sleep(5)
    spark.range(20).write.mode("overwrite").parquet(s"$tmp/t.parquet")
    assert(T.dirFingerprint(tmp) != f1, "content change must change the fingerprint")
    // non-local (absent) paths degrade to a constant — caller-owned
    // immutability, documented in T.dirFingerprint
    assert(T.dirFingerprint("/graft-no-such-dir") == "nonlocal")
  }
}
