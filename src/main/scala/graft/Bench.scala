package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query and total seconds at
  * SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 runs first (untimed)
  * so the timed pass measures steady-state execution, not JVM/codegen/
  * parquet-footer warmup (first-query overhead measured ~5s).
  *
  * Queries are executed with a noop-sink write, NOT `.count()`: under a
  * count Catalyst prunes unreferenced projections and drops sorts, so
  * projection-heavy queries would be timed as little more than parquet
  * row-count scans. The noop write materializes every output column. */
object Bench {

  /** Force full execution of every column with zero sink I/O. */
  def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmupDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try exec(fn(spark, warmupDir)) catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
