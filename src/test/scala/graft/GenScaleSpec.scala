package graft

/** The rehearsal generator's isomorphism invariants — the properties
  * that make GenScale corpora a valid measuring stick (BASELINE.md
  * round 6): per-replica work must be EXACTLY the source corpus's
  * work, and replicas must not interact. If either breaks, scaling
  * exponents measured on a GenScale corpus stop being attributable to
  * the engine. */
class GenScaleSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("permutation: seed 0 is the identity; others are deterministic bijections") {
    assert(GenScale.permutation(64, 0).toSeq == (0 until 64))
    val p1 = GenScale.permutation(64, 1)
    assert(p1.toSeq == GenScale.permutation(64, 1).toSeq) // deterministic
    assert(p1.sorted.toSeq == (0 until 64)) // bijection
    assert(p1.toSeq != (0 until 64)) // not the identity
    assert(GenScale.permutation(64, 2).toSeq != p1.toSeq) // per-replica
  }

  test("document replicas: bijective token rename, disjoint ids, exact n_chars") {
    import spark.implicits._
    val r0 = GenScale.documentsReplica(spark, sfDir, 0)
    val r1 = GenScale.documentsReplica(spark, sfDir, 1)
    // ids disjoint by the stride offset
    assert(r0.join(r1, Seq("doc_id"), "inner").count() == 0)
    // every replica-1 token carries the suffix → ZERO shared tokens
    // (hence zero shared shingles of any length) across replicas
    val toks0 = r0.select(explode(split(col("text"), " ")).as("t")).distinct()
    val toks1 = r1.select(explode(split(col("text"), " ")).as("t")).distinct()
    assert(toks0.join(toks1, Seq("t"), "inner").count() == 0)
    // the rename is bijective per doc: token COUNT sequences identical
    val n0 = r0.select((col("doc_id") % GenScale.Stride).as("k"),
      size(split(col("text"), " ")).as("n"))
    val n1 = r1.select((col("doc_id") % GenScale.Stride).as("k"),
      size(split(col("text"), " ")).as("n1"))
    assert(n0.join(n1, Seq("k")).filter(col("n") =!= col("n1")).count() == 0)
    // n_chars is recomputed, not copied
    assert(r1.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  test("embedding replicas: permutation preserves norms and within-replica dots exactly") {
    import spark.implicits._
    val r0 = GenScale.embeddingsReplica(spark, sfDir, 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val r1 = GenScale.embeddingsReplica(spark, sfDir, 1)
      .select((col("vec_id") % GenScale.Stride).as("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(r0.keySet == r1.keySet)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    // same multiset of components per vector (permutation, no edit)...
    r0.keys.take(50).foreach { id =>
      assert(r0(id).sorted.toSeq == r1(id).sorted.toSeq, s"vec $id not a permutation")
    }
    // ...and within-replica dot products equal up to SUMMATION ORDER
    // (the permutation reorders the fold's terms → ≤ ~1 ulp; the
    // queries round cosines to 6dp, so per-replica results are
    // identical — the isometry that keeps cosine structure constant)
    val ids = r0.keys.toSeq.sorted.take(20)
    for (i <- ids; j <- ids if i < j) {
      val (d0, d1) = (dot(r0(i), r0(j)), dot(r1(i), r1(j)))
      assert(math.abs(d0 - d1) <= 1e-12 * math.max(1.0, math.abs(d0)),
        s"dot($i,$j) drifted beyond summation-order rounding: $d0 vs $d1")
    }
  }

  test("main: flags parse non-positionally; --docs-passthrough byte-copies documents") {
    // round-11 ADVICE: `GenScale src dest --zipf` crashed with
    // NumberFormatException (args(2) parsed as the replica count);
    // round-12: --docs-passthrough replicates embeddings only (the
    // ANN-crossover rehearsal) and byte-copies documents
    val dst = java.nio.file.Files.createTempDirectory("genscale-flags").toString
    try {
      GenScale.run(Array(sfDir, dst, "3", "--zipf", "--docs-passthrough"), spark)
      // documents byte-copied, not replicated (and not boilerplated
      // despite --zipf: passthrough wins)
      val srcBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
      val dstBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dst/documents.parquet"))
      assert(java.util.Arrays.equals(srcBytes, dstBytes),
        "--docs-passthrough must byte-copy documents.parquet")
      // embeddings replicated 3x
      val n0 = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      val n1 = spark.read.parquet(s"$dst/embeddings.parquet").count()
      assert(n1 == 3 * n0, s"expected ${3 * n0} embeddings, got $n1")
    } finally GenScale.zipf = false
  }
}
