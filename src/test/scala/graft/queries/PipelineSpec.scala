package graft.queries

import java.nio.file.Files

import graft.{SparkSpec, SparkEntry}

/** q55 curation pipeline: every stage must demonstrably fire — the
  * pipeline is verified on a synthetic corpus where each stage has a
  * document only IT can drop (round-1 lesson: a stage whose predicate
  * never fires on the test corpus verifies vacuously). */
class PipelineSpec extends SparkSpec {

  private def samplePass(id: Long): Boolean =
    graft.T.phashDriver(s"sample:$id") % 2 == 0

  test("every pipeline stage drops the document built to trigger it") {
    import spark.implicits._
    val good =
      "unique alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val goodB =
      "different bravo charlie delta echo foxtrot golf hotel india juliet " +
        "kilo lima mike november oscar papa quebec romeo sierra tango whisky"
    // stage-1 victim: stopword soup => stop_ratio ~1, tiny ttr => q < 0.6
    val lowQ = Seq.fill(20)("the a and of to in").mkString(" ")
    val docs = Seq(
      (1L, good, "en"),
      (2L, good, "en"), // stage-2 victim: exact duplicate of 1
      (3L, goodB, "en"),
      (4L, goodB + " extra", "en"), // stage-3 victim: near-dup of 3
      (5L, lowQ, "en"))
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'synthetic' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val dir = Files.createTempDirectory("q55corpus")
    docs.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)

    val out = SparkEntry.queries("q55_curation_pipeline")(spark, dir.toString)
      .select("doc_id").as[Long].collect().toSet

    // stage victims are gone regardless of the sample coin
    assert(!out.contains(2L), "exact duplicate (higher id) must be dropped")
    assert(!out.contains(4L), "near-duplicate (higher id) must be dropped")
    assert(!out.contains(5L), "low-quality doc must be dropped")
    // survivors appear iff the deterministic sample keeps them
    val expected = Set(1L, 3L).filter(samplePass)
    assert(out == expected, s"expected $expected, got $out")
    assert(out.nonEmpty, "sample ids chosen so at least one survivor passes")
  }
}
