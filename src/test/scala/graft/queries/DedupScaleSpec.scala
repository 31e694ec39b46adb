package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Scale-shape proofs for the dedup/similarity family: the blocked
  * pairing paths (q29 band-prefix, q52 IVF-bucketed) must produce the
  * same rows as their all-pairs definitions WITHOUT any cartesian /
  * broadcast-nested-loop join in the physical plan, and the
  * hot-shingle frequency cap must bound the exact-Jaccard self-join's
  * fan-out without changing results below the cap. */
class DedupScaleSpec extends SparkSpec {

  test("hot-shingle cap: a stop-phrase shared by every doc stops driving pairs") {
    import spark.implicits._
    // 20 docs all share one hot shingle; docs 1 and 2 additionally
    // share 5 rare shingles (a genuine near-dup pair).
    val hot = (1 to 20).map(d => (d.toLong, "the quick brown"))
    val rare = (1 to 5).flatMap(i => Seq((1L, s"rare shingle $i"), (2L, s"rare shingle $i")))
    val unique = (3 to 20).map(d => (d.toLong, s"unique to $d"))
    val sh = (hot ++ rare ++ unique).toDF("doc_id", "shingle")

    val uncapped = Dedup.nearDupPairsFrom(sh, Seq(1000L).toDF("cap"))
      .select("da", "db").as[(Long, Long)].collect().toSet
    val capped = Dedup.nearDupPairsFrom(sh, Seq(10L).toDF("cap"))
      .select("da", "db").as[(Long, Long)].collect().toSet

    // Uncapped, the hot shingle makes the small docs pairwise similar
    // (jaccard 1/3) — the quadratic blowup in miniature.
    assert(uncapped.size > 100, s"expected hot-shingle pair blowup, got ${uncapped.size}")
    // Capped, only the genuinely-similar pair survives.
    assert(capped == Set((1L, 2L)), s"got $capped")
  }

  test("hot-shingle cap does not change q25 at test scale") {
    import spark.implicits._
    val def_ = Dedup.nearDupPairs(spark, sfDir).orderBy("da", "db").collect().toSeq
    val unc = Dedup.nearDupPairsFrom(
      Dedup.shinglesBy(spark, sfDir, "doc_id"), Seq(Long.MaxValue).toDF("cap"))
      .orderBy("da", "db").collect().toSeq
    assert(def_ == unc)
  }

  test("hot-shingle cap scalar: fraction of corpus with an absolute floor") {
    import spark.implicits._
    // Small corpus: the floor binds (0.1% of 20 docs rounds to 0).
    val small = (1 to 20).map(d => (d.toLong, s"shingle $d")).toDF("doc_id", "shingle")
    assert(Dedup.hotShingleCap(small).as[Long].head() == 1000L)
    // Large corpus (distinct doc ids beyond floor/fraction): the
    // fraction binds — 0.1% of 3,000,000 docs = 3000 > floor 1000.
    val big = spark.range(3000000).select(col("id").as("doc_id"), lit("x").as("shingle"))
    assert(Dedup.hotShingleCap(big).as[Long].head() == 3000L)
  }

  test("q29 band-prefix blocking: exact vs all-pairs, no cartesian in plan") {
    import spark.implicits._
    val q29 = SparkEntry.queries("q29_simhash_neardup")(spark, sfDir)
    val plan = planString(q29)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q29 pairing must be an equality join, not all-pairs:\n$plan")
    // All-pairs reference recomputed inline from the same signatures.
    val sim = Dedup.simhashSignatures(spark, sfDir)
    val a = sim.select(col("doc_id").as("da"), col("sim").as("sa"))
    val b = sim.select(col("doc_id").as("db"), col("sim").as("sb"))
    val ref = a.join(b, col("da") < col("db"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("da", "db", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val got = q29.as[(Long, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("q52 IVF-blocked near-dup: subset of q30, no cartesian in plan") {
    import spark.implicits._
    val q52 = SparkEntry.queries("q52_embed_neardup_blocked")(spark, sfDir)
    val plan = planString(q52)
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    // The ONLY nested-loop joins allowed are the centroid assignments
    // (one per Lloyd's pass: seed assign ×2 + final assign), each
    // broadcasting the bounded ≤8-row centroid table — that's the IVF
    // design, not an all-pairs blowup.
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 3,
      s"only the ≤8-row centroid broadcasts may be nested-loop:\n$plan")
    // Pair generation itself must be keyed on the cluster id.
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cluster".r
        .findFirstIn(plan).isDefined,
      s"pair join must be an equality join on cluster:\n$plan")
    val got = q52.select("va", "vb").as[(Long, Long)].collect().toSet
    val base = SparkEntry.queries("q30_embed_neardup")(spark, sfDir)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "q52 should find candidate near-dups at test sf")
    assert(got.subsetOf(base),
      s"blocked pairs must all satisfy the exact predicate; extras: ${got.diff(base)}")
  }

  test("q53 LSH ANN: candidate generation is an equality join, no cartesian") {
    val q53 = SparkEntry.queries("q53_ann_lsh")(spark, sfDir)
    val plan = planString(q53)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q53 candidates must come from the (band, value) equality join:\n$plan")
  }

  test("q57 all-vectors LSH top-k: equality-join candidates, reused exchange") {
    val q57 = SparkEntry.queries("q57_ann_lsh_all")(spark, sfDir)
    val plan = planString(q57)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q57 candidates must come from the (band, value) equality join:\n$plan")
    // Both join sides are the same banded signature frame — the
    // signature build must run once, not once per side.
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"q57's self-join should reuse the (b, bv) exchange:\n$plan")
  }

  test("q25 pair core: the capped-shingle chain materializes once (reused exchange)") {
    // pairOverlaps pins the capped frame to a (shingle) repartition so
    // its four consumer subtrees (join sides + the two `sizes`
    // aliases) share ONE exchange instead of re-running the
    // count-over-window cap chain each.
    val q25 = SparkEntry.queries("q25_minhash_textdedup")(spark, sfDir)
    val plan = planString(q25)
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"pair-core consumers must share the capped-shingle exchange:\n$plan")
  }

  test("q28 self-join computes the signature build once (reused exchange)") {
    val q28 = SparkEntry.queries("q28_minhash_lsh")(spark, sfDir)
    val plan = planString(q28)
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage"),
      s"q28's (band,sig) self-join should reuse one exchange:\n$plan")
  }

  test("q26/q30 fence: above FenceCap the anchor side thins to a modulus sample") {
    import spark.implicits._
    // FenceCap+1 vectors → fk = ceil(n/FenceCap) = 2: only even vec_ids
    // may anchor a pair. Deterministic small-dim embeddings suffice —
    // the fence is about plan/anchor shape, not cosine values.
    val n = Similarity.FenceCap + 1
    val tmp = java.nio.file.Files.createTempDirectory("graft-fence").toString
    spark.range(n).select(col("id").as("vec_id"),
        array((0 until 4).map(j =>
          ((col("id") % (7 + 2 * j)) + 1).cast("float")): _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val q26 = SparkEntry.queries("q26_cosine_topk")(spark, tmp)
    val rows = q26.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(0) % 2 == 0),
      s"every anchor must be in the fk=2 modulus sample: ${rows.map(_.getLong(0)).toSeq}")
    // The fence must be IN the plan (pair build bounded by construction,
    // not by data luck): a pmod filter on the anchor ids against the
    // corpus-derived step, fed by the withScalar broadcast hash join.
    val plan = planString(q26)
    assert(plan.contains("pmod"), s"fence filter missing from plan:\n$plan")
    // Below the cap the fence is the identity: odd anchors survive.
    val base = SparkEntry.queries("q30_embed_neardup")(spark, sfDir)
    assert(base.filter(col("va") % 2 === 1).count() > 0,
      "at test scale fk = 1 — the fence must not thin anchors")
  }

  test("probe-stride fence: 50 below ProbeCapN, grows with the corpus above it") {
    import spark.implicits._
    // the stride only counts rows — a vec_id-only embeddings file
    // suffices; ProbeCapN+1 rows → pstep = 100 (probe set halved),
    // test corpora → pstep = 50 exactly (byte-identical oracles).
    val tmp = java.nio.file.Files.createTempDirectory("graft-pfence").toString
    spark.range(Similarity.ProbeCapN + 1).select(col("id").as("vec_id"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(Similarity.probeStride(spark, tmp).as[Long].head() == 100L)
    assert(Similarity.probeStride(spark, sfDir).as[Long].head() == 50L)
    // and the sample itself thins accordingly: every 100th id above
    // the cap (the shared probeSample body all four probe queries use)
    val ids = Similarity.probeSample(
        spark.read.parquet(s"$tmp/embeddings.parquet"),
        Similarity.probeStride(spark, tmp))
      .select("vec_id").as[Long].collect()
    assert(ids.length == 1001 && ids.forall(_ % 100 == 0),
      s"expected the %100 sample, got ${ids.length} ids")
  }

  test("q92 drop set equals the symmetric pair view across the shard boundary") {
    import spark.implicits._
    // q92 shares q25's shingle frame, cap, and capped sizes, so an
    // incoming doc must drop iff SOME symmetric near-dup pair (q25)
    // crosses the src1/existing boundary at the same threshold.
    val dropped = SparkEntry.queries("q92_incremental_dedup")(spark, sfDir)
      .filter(col("action") === "drop")
      .select("doc_id").as[Long].collect().toSet
    val src = graft.T.tbl(spark, sfDir, "documents").select("doc_id", "source")
    val pairs = Dedup.nearDupPairs(spark, sfDir)
      .join(src.select(col("doc_id").as("da"), col("source").as("sa")), Seq("da"))
      .join(src.select(col("doc_id").as("db"), col("source").as("sb")), Seq("db"))
    val expect = pairs.filter(col("sa") === "src1" && col("sb") =!= "src1")
      .select(col("da"))
      .union(pairs.filter(col("sb") === "src1" && col("sa") =!= "src1")
        .select(col("db")))
      .as[Long].collect().toSet
    assert(dropped == expect, s"got $dropped expected $expect")
  }
}
