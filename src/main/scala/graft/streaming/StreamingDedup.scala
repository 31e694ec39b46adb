package graft.streaming

import graft.functions.MinHashLsh
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the online form of the batch
  * MinHash+LSH dedup (q28): documents arrive as a stream, and each is
  * checked against every previously seen document via LSH band
  * signatures kept in keyed state.
  *
  * Scale design: signatures are computed entirely PER ROW with nested
  * higher-order functions (shingle → hash → 16 minhashes → 4 band
  * signatures) — no shuffle, no stateful aggregation — and the only
  * stateful operator is keyed by (band, signature), so state
  * partitions across executors and each key holds a single long (the
  * first doc seen with that signature). The signature scheme is
  * EXACTLY q28's (same shingles, same hash family, same 4×4 banding),
  * so batch and stream agree on which pairs are candidates.
  */
object StreamingDedup {

  final case class BandSig(doc_id: Long, band: Int, sig: String)
  final case class DupVerdict(doc_id: Long, dup_of: Long, band: Int, sig: String)

  /** (doc_id, text) → (doc_id, band, sig) rows, one per band, all
    * computed row-locally — delegates to the single shared scheme
    * definition ([[graft.functions.MinHashLsh.bandSignatures]], also
    * used by batch q28) so batch and stream cannot diverge. */
  def bandSignatures(docs: DataFrame): DataFrame =
    MinHashLsh.bandSignatures(docs)

  /** Keyed first-seen state: within a (band, sig) group the earliest
    * doc_id is the keeper; every later arrival is emitted as a
    * duplicate of it. A document flagged through several bands yields
    * several verdicts — downstream takes min(dup_of) per doc. */
  def verdicts(sigs: DataFrame): DataFrame = {
    val spark = sigs.sparkSession
    import spark.implicits._
    sigs.as[BandSig]
      .groupByKey(s => s"${s.band}:${s.sig}")
      .flatMapGroupsWithState[Long, DupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, events: Iterator[BandSig], state: GroupState[Long]) =>
          val sorted = events.toVector.sortBy(_.doc_id)
          // strict FIRST-SEEN semantics: the keeper never changes once
          // set (min-updating it would later flag the keeper itself as
          // a duplicate of a doc that was already deduplicated away)
          val keeper = state.getOption.getOrElse {
            val k = sorted.head.doc_id
            state.update(k)
            k
          }
          sorted.filter(_.doc_id != keeper).map(s =>
            DupVerdict(s.doc_id, keeper, s.band, s.sig)).iterator
      }
      .toDF()
  }

  /** Full pipeline: raw doc frame (doc_id, text) → duplicate verdicts. */
  def apply(docs: DataFrame): DataFrame = verdicts(bandSignatures(docs))
}
