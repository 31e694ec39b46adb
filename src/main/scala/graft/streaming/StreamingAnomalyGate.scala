package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming z-score anomaly gate (s18) — the online form of batch
  * q82: events arrive as a stream and are flagged the moment they are
  * processed against STATIC per-type moments (mean, std) computed
  * from the historical corpus. The production monitoring shape: the
  * reference's ETL (spot_trades_etl.py) appends trades continuously;
  * an operator watching for fat-finger prints gates each arrival
  * against yesterday's distribution, not a nightly batch.
  *
  * Scale design: completely STATELESS — the O(event-types) stats
  * frame joins as a stream-static broadcast hash join (re-planned per
  * micro-batch, zero state store bytes), and the flag itself is a
  * row-local IEEE expression. The gate body is [[graft.queries.Extras.zGate]]
  * — the SAME code batch q82 runs — so batch and stream provably
  * agree row-for-row (asserted in StreamingAnomalySpec).
  */
object StreamingAnomalyGate {

  /** events stream (event_id, event_type, value) × static stats frame
    * (event_type, mean, std) → append-mode flagged stream
    * (event_id, event_type, value, z) at |z| ≥ 2.5. */
  def apply(events: DataFrame, stats: DataFrame): DataFrame =
    graft.queries.Extras.zGate(events, stats)
}
