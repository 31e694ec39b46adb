package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality gate (s21) — q33's quality score applied at
  * ingest: every arriving document is scored and gated the moment it
  * is processed. This became possible (and free) when the q33 core
  * went row-local: [[graft.queries.TextAnalysis.qualityScored]] is
  * array HOFs over one split — no aggregation, no state, no
  * watermark — so the stream runs the IDENTICAL body the batch
  * operator runs, and the two agree bit-for-bit on the score
  * (asserted in StreamingQualitySpec). Zero streaming state.
  */
object StreamingQualityGate {

  /** docs stream (doc_id, text) → append-mode survivors
    * (doc_id, quality) at quality ≥ threshold. */
  def apply(docs: DataFrame, threshold: Double): DataFrame =
    graft.queries.TextAnalysis.qualityScored(docs)
      .filter(col("quality") >= threshold)
      .select(col("doc_id"), col("quality"))
}
