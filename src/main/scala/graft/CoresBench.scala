package graft

import org.apache.spark.sql.SparkSession

/** Measures the shared-core amortization the Cores API buys:
  * `tools/run.sh graft.CoresBench [runs]` times the q48/q70/q80
  * family (a) self-contained — each query re-derives the q25 pair
  * core, the default bench's verification shape — and (b) over ONE
  * Cores.materialize + consumers reading the parquet. Prints one
  * line per variant; numbers recorded in BASELINE.md round 6. The
  * default Bench is deliberately unchanged (per-query independence
  * is the oracle-gate contract). */
object CoresBench {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = Bench.session()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup at the smoke scale (parquet footers, codegen)
    Seq("q48_dedup_clusters", "q70_cluster_keep_best", "q80_dup_by_source")
      .foreach(q => Bench.exec(SparkEntry.queries(q)(spark, Bench.WarmupDir)))

    val self = (1 to runs).map { _ =>
      time {
        Seq("q48_dedup_clusters", "q70_cluster_keep_best", "q80_dup_by_source")
          .foreach(q => Bench.exec(SparkEntry.queries(q)(spark, sfDir)))
      }
    }
    val shared = (1 to runs).map { _ =>
      val dir = java.nio.file.Files.createTempDirectory("coresbench").toString
      time {
        // pairs core only — the one this consumer family reads
        graft.queries.Cores.materializePairs(spark, sfDir, dir)
        val p = graft.queries.Cores.nearDupPairs(spark, dir)
        Bench.exec(graft.queries.Corpus.q48From(p))
        Bench.exec(graft.queries.Corpus.q70From(spark, sfDir, p))
        Bench.exec(graft.queries.Corpus.dupBySourceFrom(spark, sfDir, p)
          .orderBy("source"))
      }
    }
    // LSH-core family (round-11 judge task 6): q55/q88 re-pay q28's
    // banded candidate join; the materialized path computes it once.
    // Round 13 adds q28 itself (the published-pairs artifact) as the
    // THIRD consumer — the materialize-at-≥3-consumers guidance was
    // extrapolated from a 2-consumer wash; this measures the crossover.
    val lshFam =
      Seq("q55_curation_pipeline", "q88_minhash_estimate", "q28_minhash_lsh")
    lshFam.foreach(q => Bench.exec(SparkEntry.queries(q)(spark, Bench.WarmupDir)))
    val lshSelf = (1 to runs).map { _ =>
      time {
        lshFam.foreach(q => Bench.exec(SparkEntry.queries(q)(spark, sfDir)))
      }
    }
    val lshShared = (1 to runs).map { _ =>
      val dir = java.nio.file.Files.createTempDirectory("coresbench-lsh").toString
      time {
        graft.queries.Cores.materializeLsh(spark, sfDir, dir)
        val c = graft.queries.Cores.lshCandidates(spark, dir)
        Bench.exec(graft.queries.Pipeline.q55From(spark, sfDir, c))
        Bench.exec(graft.queries.Dedup.q88From(spark, sfDir, c))
        Bench.exec(graft.queries.Dedup.q28From(c))
      }
    }

    println(f"self-contained q48+q70+q80: runs=${self.map(t => f"$t%.2f").mkString(",")} min=${self.min}%.2f")
    println(f"materialized core + consumers: runs=${shared.map(t => f"$t%.2f").mkString(",")} min=${shared.min}%.2f")
    println(f"self-contained q55+q88: runs=${lshSelf.map(t => f"$t%.2f").mkString(",")} min=${lshSelf.min}%.2f")
    println(f"materialized LSH core + consumers: runs=${lshShared.map(t => f"$t%.2f").mkString(",")} min=${lshShared.min}%.2f")
    // machine-readable artifact line for judge.sh --cores / BASELINE.md
    // round tracking (the deployment-shape number the default bench
    // deliberately cannot show)
    val json = f"""{"metric":"cores_bench","unit":"sec","runs":$runs,""" +
      f""""self_min":${self.min}%.2f,"shared_min":${shared.min}%.2f,""" +
      f""""amortization":${self.min / shared.min}%.2f,""" +
      f""""lsh_self_min":${lshSelf.min}%.2f,"lsh_shared_min":${lshShared.min}%.2f,""" +
      f""""lsh_amortization":${lshSelf.min / lshShared.min}%.2f}"""
    sys.env.get("SPARK_GRAFT_CORES_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), json.getBytes); ()
    }
    println(json)
    spark.stop()
  }
}
