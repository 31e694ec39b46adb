package graft.sinks

import org.apache.spark.sql.DataFrame

/** Staged BigQuery sink — the implementable half of the reference's
  * declared-but-TODO BigQuery sink (factory.py:40-42, config.json
  * `provider: bigquery`): every micro-batch is staged as LOAD-READY
  * newline-delimited JSON under its batch_id partition, and
  * [[loadCommand]] is the per-batch load contract a deployment runs.
  * Cloud warehouses ingest via load jobs over staged files, so the
  * data path here — serialization, batch isolation, replay
  * idempotence — is the real engineering; only the API call itself is
  * blocked by this zero-egress environment (the WsSpooler discipline:
  * build and test the seam, document the blocked endpoint).
  *
  * Staging writes through [[graft.streaming.IdempotentSink]] (json
  * form), so an at-least-once replay re-stages its own batch
  * partition instead of double-loading rows into the warehouse.
  */
object BigQueryStage {

  /** Stage one micro-batch as NDJSON under `dir/batch_id=<id>/`. */
  def stageBatch(df: DataFrame, batchId: Long, dir: String): Unit =
    graft.streaming.IdempotentSink.putBatch(df, batchId, dir, "json")

  /** The load command for one staged batch — documentation-grade
    * contract (env-blocked here): atomic per-batch loads keep the
    * warehouse exactly-once given the idempotent staging. */
  def loadCommand(table: String, dir: String, batchId: Long): String =
    "bq load --source_format=NEWLINE_DELIMITED_JSON " +
      s"$table '$dir/batch_id=$batchId/*.json'"
}
