package graft.streaming

import org.apache.spark.sql.types._

/** Typed model of the reference's two event streams and output tables
  * (SURVEY.md §1.2; wire shapes in FIXTURES.md §2).
  *
  * Numeric fidelity (SURVEY §1.4): Binance sends prices/quantities as
  * decimal STRINGS and the reference persists them verbatim
  * (spot_trades_etl.py:52-53, spot_depth_etl.py:98-99). We do the
  * same: `price`/`quantity` stay `StringType` end-to-end on the
  * streaming path; computation casts to DecimalType(38,18) on demand.
  */

/** Parsed `trade` message (spot_trades_etl.py:44-55 field mapping). */
final case class TradeEvent(
    e: String, // event type, "trade"
    E: Long, // exchange event time, ms
    s: String, // symbol
    t: Long, // trade id
    p: String, // price (decimal string)
    q: String, // quantity (decimal string)
    m: Boolean, // is buyer the market maker
    local_timestamp: Long)

/** Parsed diff-depth message (spot_depth_etl.py:62-73 field mapping). */
final case class DepthEvent(
    e: String, // "depthUpdate"
    E: Long,
    s: String,
    U: Long, // first update id
    u: Long, // last update id
    b: Seq[Seq[String]], // bids [[price, qty], ...]
    a: Seq[Seq[String]], // asks
    local_timestamp: Long)

/** Output row of the trades table (README.md:68-77 of the reference;
  * column order storage contract FIXTURES.md §2.5). */
final case class TradeRow(
    timestamp: Long,
    local_timestamp: Long,
    id: Long,
    price: String,
    quantity: String,
    side: String) // 'buy' | 'sell' — the liquidity taker

/** Pre-explosion depth record (spot_depth_etl.py:66-73). The
  * reference drops U/u after sequencing; we keep them — they make the
  * consistency check expressible as a query (SURVEY §1.2). */
final case class DepthRecord(
    timestamp: Long,
    local_timestamp: Long,
    first_update_id: Long,
    last_update_id: Long,
    bids: Seq[Seq[String]],
    asks: Seq[Seq[String]],
    is_snapshot: Boolean)

/** Output row of the depth_updates table (README.md:50-61). */
final case class DepthRow(
    timestamp: Long,
    local_timestamp: Long,
    side: String, // 'bid' | 'ask'
    price: String,
    quantity: String, // "0" means remove-level; kept, not filtered
    is_snapshot: Boolean)

/** REST order-book snapshot (book_utils.py:29; FIXTURES §2.3).
  * Fetched driver-side before stream start — never a blocking call in
  * an executor (SURVEY §3.3) — either from a snapshot file or LIVE via
  * [[graft.streaming.source.RestSnapshotClient]] (the reference's
  * `GET /api/v3/depth`, exercised end-to-end in RestSnapshotSpec). */
final case class BookSnapshot(
    lastUpdateId: Long,
    bids: Seq[Seq[String]],
    asks: Seq[Seq[String]])

// NOTE: there is deliberately NO from_json StructType for the wire
// messages — Binance's field pairs (e/E, U/u, t/T, m/M) collide under
// Spark's default case-insensitive analysis, so Pipelines parses with
// json_tuple (positional, key-matched case-sensitively at the JSON
// level). The wire shapes are documented on the case classes above
// and in FIXTURES.md §2.
