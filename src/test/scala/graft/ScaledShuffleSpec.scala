package graft

/** T.applyScaledShuffle — the harness's data-proportional
  * shuffle-partition lever (BASELINE.md round 12's q25/q88 spill
  * attribution, encoded as a default): identity below ~sf2.4,
  * cores × ⌈maxTableRatio/24⌉ + parallelismFirst=false above, keyed
  * on ROW ratios per volume table (not bytes — replicated corpora
  * compress ~14×; not a total — GenScale scales only
  * documents/embeddings). */
class ScaledShuffleSpec extends SparkSpec {

  test("identity below the sf2.4 crossover, row-proportional above it") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // the sf0.001 fixture: maxRatio ≪ 24 → conf untouched
    T.applyScaledShuffle(spark, sfDir)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "sub-crossover corpora must leave the session untouched")

    // sf30-like seeded counts (the snapScalar seeding discipline —
    // nonexistent dir, constant fingerprint): documents 300× the sf0.1
    // anchor → factor ⌈300/24⌉ = 13
    val dir = "/graft-scaledshuffle-sf30"
    Seq("documents" -> 1500000L, "events" -> 100000L,
        "lineitem" -> 600000L, "embeddings" -> 600000L).foreach {
      case (t, n) => T.snapScalar(dir, s"count:$t")(n)
    }
    T.applyScaledShuffle(spark, dir)
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(parts == spark.sparkContext.defaultParallelism * 13,
      s"expected cores×13 at a 300× documents ratio, got $parts")
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst") == "false",
      "the extra partitions are inert unless AQE's parallelism-first " +
        "coalescing is disabled")
    assert(spark.conf.get(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes").toLong ==
      (64L << 20) / 13,
      "size-based coalescing must scale its target down with the " +
        "factor, or it merges the heavy reduce stages right back " +
        "(measured: 64 MB compressed target re-created the 13 GB spill " +
        "that 160 partitions were set to eliminate)")

    // a GenScale-style corpus where ONLY embeddings grew (the max-per-
    // table rule: a total would dilute the 550× embeddings ratio)
    val dir2 = "/graft-scaledshuffle-emb550"
    Seq("documents" -> 5000L, "events" -> 100000L,
        "lineitem" -> 600000L, "embeddings" -> 1100000L).foreach {
      case (t, n) => T.snapScalar(dir2, s"count:$t")(n)
    }
    T.applyScaledShuffle(spark, dir2)
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
      spark.sparkContext.defaultParallelism * 23, // ⌈550/24⌉
      "the MAX per-table ratio must drive the factor")

    spark.conf.set("spark.sql.shuffle.partitions", before)
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
  }
}
