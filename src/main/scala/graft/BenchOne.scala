package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench for ONE query: `tools/run.sh graft.BenchOne <query_id>
  * [runs]` — same session config and noop-sink execution as
  * [[Bench]], prints every run's seconds plus the minimum. For
  * bisecting a single query's regression without paying for the full
  * inventory. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try Bench.exec(fn(spark, Bench.WarmupDir))
    catch { case t: Throwable => println(s"warmup failed: ${t.toString.take(200)}") }
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      Bench.exec(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    println(s"$name runs=${times.map(t => f"$t%.2f").mkString(",")} min=${f"${times.min}%.2f"}")
    spark.stop()
  }
}
