package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The materialized-core contract (Cores): consumer outputs over
  * cores read back from parquet are ROW-IDENTICAL to the
  * self-contained queries. This is what licenses a production
  * deployment to amortize the pair/candidate/centroid builds across
  * consumers — the verification contract (per-query independence in
  * the oracle gate) stays intact because the default `queries` map
  * never routes through Cores. */
class CoresParitySpec extends SparkSpec {

  private lazy val coreDir = {
    val dir = Files.createTempDirectory("graft-cores").toString
    Cores.materialize(spark, sfDir, dir)
    dir
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("materialized near-dup pairs equal the inline q25 core") {
    val mat = rows(Cores.nearDupPairs(spark, coreDir).orderBy("da", "db"))
    val inline = rows(Dedup.nearDupPairs(spark, sfDir).orderBy("da", "db"))
    assert(mat == inline)
    assert(mat.nonEmpty, "fixture corpus must contain near-dup pairs")
  }

  test("materialized LSH candidates equal the inline q28 core") {
    val mat = rows(Cores.lshCandidates(spark, coreDir).orderBy("da", "db"))
    val inline = rows(Dedup.lshCandidates(spark, sfDir).orderBy("da", "db"))
    assert(mat == inline)
  }

  test("materialized centroids equal the inline Lloyd's chain") {
    val mat = rows(Cores.lloydCentroids(spark, coreDir).orderBy("cid"))
    val inline = rows(Similarity.lloydCentroids(spark, sfDir).orderBy("cid"))
    assert(mat == inline)
    assert(mat.size <= 8)
  }

  test("q48/q70/q80 over the materialized core equal the self-contained queries") {
    val p = Cores.nearDupPairs(spark, coreDir)
    assert(rows(Corpus.q48From(p)) ==
      rows(graft.SparkEntry.queries("q48_dedup_clusters")(spark, sfDir)))
    assert(rows(Corpus.q70From(spark, sfDir, p)) ==
      rows(graft.SparkEntry.queries("q70_cluster_keep_best")(spark, sfDir)))
    assert(rows(Corpus.dupBySourceFrom(spark, sfDir, p).orderBy("source")) ==
      rows(graft.SparkEntry.queries("q80_dup_by_source")(spark, sfDir)))
  }

  test("q55/q88 over the materialized LSH core equal the self-contained queries") {
    // q55's equality is structural (band signatures are row-local, so
    // the full-corpus candidate set restricted to survivors IS the
    // survivor-built candidate set — q55From scaladoc); this pins it.
    val c = Cores.lshCandidates(spark, coreDir)
    assert(rows(Pipeline.q55From(spark, sfDir, c)) ==
      rows(graft.SparkEntry.queries("q55_curation_pipeline")(spark, sfDir)))
    assert(rows(Dedup.q88From(spark, sfDir, c)) ==
      rows(graft.SparkEntry.queries("q88_minhash_estimate")(spark, sfDir)))
    // the third consumer (round-13): the published sorted-pairs
    // artifact is q28 itself over the materialized core
    assert(rows(Dedup.q28From(c)) ==
      rows(graft.SparkEntry.queries("q28_minhash_lsh")(spark, sfDir)))
  }

  test("cores are written round-robin sharded, not key-clustered") {
    // the skew-lever prerequisite (DedupScaleSpec): a hot key must
    // span shards so AQE can split its partition downstream
    val files = new java.io.File(s"$coreDir/near_dup_pairs.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1, s"pairs core must shard (got $files files)")
  }
}
