package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Pathological-embedding sweep (round 10, TextEdgeSpec's sibling):
  * the similarity family must survive the vectors a real encoder
  * fleet emits — the all-zero vector (failed encode), a
  * sub-quantization-resolution vector (every element < 1/1000, which
  * floors to the zero vector in the family's integer space), a
  * huge-magnitude vector, and an exact duplicate. Before the round-10
  * guards, ONE zero-norm vector killed 9 of the 13 similarity queries
  * with ANSI DIVIDE_BY_ZERO through the unguarded `dot/(na*nb)`
  * cosines; now `vecs`/`qvecs`/`lqvecs` exclude zero-norm (and
  * zero-in-quantized-space) vectors — cosine is undefined for them —
  * with every DuckDB oracle CTE mirroring the filter, so the same
  * fixture is hash-exact against the oracles (swept out-of-band via
  * Verify + check.py, 13/13; BASELINE.md session-4 record).
  *
  * The huge-magnitude vector caught a second, subtler class: one
  * 1e6-valued vector OVERFLOWED the exact BIGINT quantized space
  * (Spark's ldot wrapped silently, DuckDB's double replay drifted —
  * five quantized-chain queries diverged with no crash anywhere).
  * [[Similarity.QuantDomainMax]] now bounds the admitted quantized
  * magnitude on both engines, so corruption degrades to exclusion.
  *
  * The NaN-element vector caught a third: NaN orders LARGEST in both
  * engines, so a bare `nrm > 0` guard ADMITS it, and it then poisons
  * cosines, means and ANSI casts differently per engine. The guards
  * therefore require a FINITE norm (`nrm < ∞` is false for NaN on
  * both sides) — the admissibility contract is 0 < ‖v‖ < ∞.
  */
class VectorEdgeSpec extends SparkSpec {

  private val ZeroId = 9000001L
  private val TinyId = 9000002L
  private val NanId = 9000005L

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vedge").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents")
    tables.foreach { t =>
      graft.T.tbl(spark, sfDir, t)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val base = graft.T.tbl(spark, sfDir, "embeddings")
    val dim = base.selectExpr("size(embedding)").head().getInt(0)
    val someVec = base.selectExpr("embedding").head()
      .getSeq[Float](0).toArray
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val edge = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(ZeroId, Array.fill(dim)(0.0f).toSeq, 3),
        Row(TinyId, Array.fill(dim)(1e-4f).toSeq, 3),
        Row(9000003L, Array.fill(dim)(1e6f).toSeq, 2),
        Row(9000004L, someVec.toSeq, 1),
        Row(NanId, (Float.NaN +: Array.fill(dim - 1)(0.5f)).toSeq, 2)),
      schema)
    base.unionByName(edge)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private val family = Seq(
    "q26_cosine_topk", "q30_embed_neardup", "q31_ann_ivf",
    "q52_embed_neardup_blocked", "q53_ann_lsh", "q57_ann_lsh_all",
    "q76_embed_quantize", "q86_label_centroids", "q93_centroid_classify",
    "q94_confusion_matrix", "q95_ann_recall", "q97_ivf_stats",
    "q106_hard_negatives", "q112_semdedup")

  family.foreach { name =>
    test(s"$name survives pathological embeddings") {
      SparkEntry.queries(name)(spark, dir).collect() // must not throw
    }
  }

  test("degenerate vectors are excluded from cosine space, kept where defined") {
    // the zero vector has no defined cosine anywhere — the
    // brute-force top-k must never emit it on either side. The
    // sub-resolution vector is different: its RAW cosine is defined
    // (nrm ≈ 2.8e-4 > 0, so q26 keeps it) and only its QUANTIZED
    // cosine is not — q31's IVF assignment must drop exactly it.
    val pairs = SparkEntry.queries("q26_cosine_topk")(spark, dir)
      .filter(col("va") === ZeroId || col("vb") === ZeroId).count()
    assert(pairs == 0L, s"the zero vector leaked into cosine top-k: $pairs")
    val ivf = SparkEntry.queries("q31_ann_ivf")(spark, dir)
      .filter(col("qid").isin(ZeroId, TinyId) ||
        col("mid").isin(ZeroId, TinyId)).count()
    assert(ivf == 0L, s"zero-in-quantized-space vectors leaked into IVF: $ivf")
    // the label-centroid mean IS defined for them (no norm division):
    // label 3's count must include both degenerate vectors
    val n3 = SparkEntry.queries("q86_label_centroids")(spark, dir)
      .filter(col("label") === 3L && col("dim") === 0L)
      .select("n_vecs").head().getLong(0)
    val base3 = SparkEntry.queries("q86_label_centroids")(spark, sfDir)
      .filter(col("label") === 3L && col("dim") === 0L)
      .select("n_vecs").head().getLong(0)
    assert(n3 == base3 + 2, s"q86 must average ALL label-3 vectors: $n3 vs $base3+2")
    // the exact-duplicate vector is legitimate input: it must appear
    // in classification with a perfect self-cosine available; the
    // NaN-element vector is excluded from EVERY vector space (cosine
    // undefined, mean poisoned, quantization would ANSI-throw)
    val cls = SparkEntry.queries("q93_centroid_classify")(spark, dir)
      .filter(col("vec_id").isin(9000004L, NanId))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(cls == Seq(9000004L),
      s"duplicate must classify, NaN must not: $cls")
  }
}
