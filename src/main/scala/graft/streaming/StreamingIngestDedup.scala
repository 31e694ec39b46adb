package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming ingestion dedup gate (s19) — the online form of batch
  * q92: document shards arrive as a stream (a landing directory, the
  * nightly-drop pattern) and every incoming document gets a keep/drop
  * verdict against a STATIC pre-built index the moment its micro-batch
  * is processed. This is how incremental corpus ingestion actually
  * runs at 100 TB: the index is built once (or refreshed on a slow
  * cadence) and each arriving shard pays only its own shingle build +
  * one equality join against the index — never a full-corpus recompute.
  *
  * Semantics — deliberately INDEX-ONLY, the batching-invariant form of
  * q92: the hot-shingle cap and per-document sizes come from the index
  * alone, so a document's verdict depends on (document, index) and
  * nothing else — streaming the shard in 1 batch or N batches gives
  * identical verdicts (asserted in StreamingIngestSpec). Batch q92
  * instead caps over the post-ingestion corpus (shard included); the
  * two agree except for shingles whose df crosses the cap only when
  * shard and index counts are pooled.
  *
  * Scale design: the index's capped shingle frame is partitioned by
  * shingle once at build time; per batch, the incoming side is
  * shard-sized, shingles are row-local HOFs (the shared
  * [[graft.queries.Dedup.shinglesOf]] scheme), the hot-set anti-join
  * and the verdict assembly broadcast shard-sized frames, and the only
  * index-scale operation is the shingle-equality join. Uses
  * foreachBatch — each micro-batch runs the full batch gate and
  * appends verdicts — because the gate's per-batch argmax over
  * candidate matches is a batch aggregation, not evolving stream
  * state (state held across batches: zero bytes; the index is
  * immutable).
  */
object StreamingIngestDedup {

  /** The static side, built once from the existing corpus
    * (doc_id, text): capped shingle frame, per-doc capped sizes, and
    * the dropped-hot-shingle set — whose broadcast in [[gate]] is
    * bounded BY CONSTRUCTION, not assumption: a hot shingle has
    * df > max(1000, 0.001·n), so |hot| ≤ Σdf / (0.001·n) = 1000·k̄
    * (k̄ = mean shingles per doc), a constant independent of corpus
    * size — unlike the vocab-sized frames the T.hintVocab fence
    * gates. All three are cache-backed;
    * [[Index.release]] must be called when an index is replaced
    * (the refresh cadence) — otherwise each rebuild pins another
    * corpus-scale trio in the block manager for the session's life. */
  final case class Index(capped: DataFrame, sizes: DataFrame, hot: DataFrame) {
    def release(): Unit = {
      capped.unpersist()
      sizes.unpersist()
      hot.unpersist()
      ()
    }
  }

  /** Build the index with the batch family's cap discipline — the
    * SAME [[graft.queries.Dedup.capFromCount]] rule, not a copy. The
    * three frames are persist()ed: the index is computed once (first
    * batch materializes it) and every later micro-batch reuses the
    * cached, shingle-partitioned result — without the cache each
    * foreachBatch action would re-run the corpus-wide shingle build,
    * turning "one equality join per shard" into a full index rebuild
    * per batch. */
  def buildIndex(existing: DataFrame): Index = {
    val sh = graft.queries.Dedup.shinglesOf(existing, "doc_id")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
    val nDocs = existing.filter(size(split(col("text"), " ")) >= 3)
      .agg(graft.queries.Dedup.capFromCount(count(lit(1))).as("cap"))
    val withCap = graft.T.withScalar(sh, nDocs)
    val capped = withCap.filter(col("df") <= col("cap"))
      .select(col("doc_id").as("de"), col("shingle"))
      .repartition(col("shingle"))
      .persist()
    val hot = withCap.filter(col("df") > col("cap"))
      .select(col("shingle")).distinct()
      .persist()
    val sizes = capped.groupBy(col("de")).agg(count(lit(1)).as("ne"))
      .persist()
    Index(capped, sizes, hot)
  }

  /** The per-batch gate: one verdict row per incoming doc —
    * (doc_id, best_match, jaccard, action), q92's output shape with
    * index-only semantics. Pure function of (batch, index): the spec
    * asserts batching invariance by re-running it on the union. */
  def gate(batch: DataFrame, idx: Index): DataFrame = {
    val shIn = graft.queries.Dedup.shinglesOf(batch, "doc_id")
      .join(broadcast(idx.hot), Seq("shingle"), "left_anti")
      .select(col("doc_id").as("di"), col("shingle"))
    val ni = shIn.groupBy(col("di")).agg(count(lit(1)).as("ni"))
    val jac = shIn.join(idx.capped, Seq("shingle"))
      .groupBy(col("di"), col("de")).agg(count(lit(1)).as("i"))
      .join(ni, Seq("di"))
      .join(idx.sizes, Seq("de"))
      .select(col("di"), col("de"),
        (col("i").cast("double") /
          (col("ni") + col("ne") - col("i")).cast("double")).as("jaccard"))
    // best match per incoming doc as a partial-aggregatable struct-max
    // (q92's shape: (jaccard DESC, de ASC) ≡ max(struct(jaccard, -de)))
    val best = jac.groupBy(col("di"))
      .agg(max(struct(col("jaccard"), (-col("de")).as("negde"))).as("_b"))
      .select(col("di"), (-col("_b.negde")).as("bm"),
        col("_b.jaccard").as("bj"))
    batch.select(col("doc_id"))
      .join(best, col("doc_id") === col("di"), "left")
      .select(col("doc_id"),
        coalesce(col("bm"), lit(-1L)).as("best_match"),
        coalesce(col("bj"), lit(0.0)).as("jaccard"),
        when(coalesce(col("bj"), lit(0.0)) >= 0.2, "drop")
          .otherwise("keep").as("action"))
  }

  /** Wire a doc stream through the gate with foreachBatch, writing
    * parquet verdicts to `outDir` partitioned by batch id.
    * AvailableNow makes this the incremental-batch shape: process
    * whatever landed, checkpoint, stop. foreachBatch is at-least-once
    * — a crash between the write and the checkpoint commit replays
    * the batch — so the write is made IDEMPOTENT (dynamic overwrite
    * of this batch's partition replaces, never duplicates): verdicts
    * land exactly once across restarts. */
  def start(docs: DataFrame, idx: Index, outDir: String,
      checkpoint: String): StreamingQuery =
    writer(docs, idx, outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  private def writer(docs: DataFrame, idx: Index,
      outDir: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      IdempotentSink.putBatch(gate(batch, idx), id, outDir)
    }
}
