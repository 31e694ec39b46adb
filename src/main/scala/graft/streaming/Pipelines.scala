package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** The reference's per-message dataflow (SURVEY.md §3.2-§3.3) as
  * declarative lineage shared verbatim between batch DataFrames and
  * Structured Streaming frames — all narrow, whole-stage-codegen'd
  * operators, zero shuffles on the hot path (parity with §3.2's
  * "keep it that way").
  *
  * Binance field names collide under Spark's default case-insensitive
  * analysis (`e`/`E`, `U`/`u`, `t`/`T`, `m`/`M`), so messages are
  * parsed with `json_tuple` — one JSON parse per row, positional
  * outputs, key matching done case-sensitively at the JSON level —
  * instead of a `from_json` struct whose field references would be
  * ambiguous.
  *
  * Input contract for both pipelines: a frame with
  * `value: string` (raw JSON message) and `local_timestamp: long`
  * (arrival ms, stamped by the source — §2.1 #4).
  */
object Pipelines {

  private val levelsSchema = ArrayType(ArrayType(StringType))

  /** trade path: JSON parse (drop corrupt) → event-type gate → project/
    * rename → conditional side map (spot_trades_etl.py:38-58).
    * Output columns = TradeRow. */
  def trades(raw: DataFrame): DataFrame =
    raw
      .select(
        json_tuple(col("value"), "e", "E", "t", "p", "q", "m")
          .as(Seq("et", "ets", "tid", "p", "q", "m")),
        col("local_timestamp"))
      // corrupt JSON ⇒ all-null tuple; ack/greeting ⇒ et != 'trade';
      // a type-matching message MISSING required fields is dropped too
      // (the reference's KeyError → warn-and-drop, spot_trades_etl.py:56-58)
      .filter(col("et") === "trade" &&
        col("ets").isNotNull && col("tid").isNotNull &&
        col("p").isNotNull && col("q").isNotNull && col("m").isNotNull)
      .select(
        col("ets").cast("long").as("timestamp"),
        col("local_timestamp"),
        col("tid").cast("long").as("id"),
        col("p").as("price"), // decimal strings kept verbatim (§1.4)
        col("q").as("quantity"),
        when(col("m") === "true", "sell").otherwise("buy").as("side"))

  /** depth path, parse stage: JSON parse → gate → project/rename
    * (spot_depth_etl.py:56-76). Output columns = DepthRecord (live
    * updates carry is_snapshot=false; snapshot replay rows are
    * emitted by the book synchronizer). */
  def depthRecords(raw: DataFrame): DataFrame =
    raw
      .select(
        json_tuple(col("value"), "e", "E", "U", "u", "b", "a")
          .as(Seq("et", "ets", "fu", "lu", "bjson", "ajson")),
        col("local_timestamp"))
      // missing U/u/E/b/a ⇒ drop whole message (reference KeyError path,
      // spot_depth_etl.py:74-76) — a null id would otherwise kill the
      // typed book-sync operator
      .filter(col("et") === "depthUpdate" &&
        col("ets").isNotNull && col("fu").isNotNull && col("lu").isNotNull &&
        col("bjson").isNotNull && col("ajson").isNotNull)
      .select(
        col("ets").cast("long").as("timestamp"),
        col("local_timestamp"),
        col("fu").cast("long").as("first_update_id"),
        col("lu").cast("long").as("last_update_id"),
        from_json(col("bjson"), levelsSchema).as("bids"),
        from_json(col("ajson"), levelsSchema).as("asks"),
        lit(false).as("is_snapshot"))

  private def sideStructs(arr: Column, label: String): Column =
    transform(arr, x => struct(
      lit(label).as("side"),
      x.getItem(0).as("price"),
      x.getItem(1).as("quantity")))

  /** depth path, explode stage: bids/asks arrays → one row per level
    * with literal side, in the reference's emission order — its
    * per-message stable sort_values(['timestamp','side'])
    * (spot_depth_etl.py:92-111) puts asks ('ask' < 'bid') before bids
    * within a message, each side in array order, messages in arrival
    * order. Reproduced by construction: one explode of
    * concat(ask-structs, bid-structs) per record — order-preserving,
    * shuffle-free, streaming-legal (a global sort would be neither),
    * and a single Generate instead of union + sort.
    * `quantity == "0..."` rows are KEPT (level removal is data).
    * Output columns = DepthRow. */
  def depthRows(records: DataFrame): DataFrame =
    records.select(
      col("timestamp"), col("local_timestamp"),
      explode(concat(
        sideStructs(col("asks"), "ask"),
        sideStructs(col("bids"), "bid"))).as("lvl"),
      col("is_snapshot"))
      .select(col("timestamp"), col("local_timestamp"),
        col("lvl.side").as("side"),
        col("lvl.price").as("price"),
        col("lvl.quantity").as("quantity"),
        col("is_snapshot"))

  /** Computation-grade decimal view of a string price/qty column
    * (SURVEY §1.4): exchange-exact strings in storage, decimal math
    * on demand. */
  def asDecimal(c: Column): Column = c.cast("decimal(38,18)")

  /** Event-time windowed OHLCV/VWAP over the trade stream (SURVEY
    * §2.2's streaming window row: the analytical aggregation the
    * recorded trades imply, run continuously instead of in batch).
    * Tumbling `windowLen` windows on exchange event time with a
    * `watermarkDelay` lateness horizon; decimal sums keep volume and
    * the VWAP numerator exact. Emits one row per (window, side) in
    * append mode once the watermark passes the window end. */
  def streamingOhlcv(
      tradeRows: DataFrame,
      windowLen: String = "1 minute",
      watermarkDelay: String = "5 minutes"): DataFrame =
    tradeRows
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withColumn("price_d", asDecimal(col("price")))
      .withColumn("qty_d", asDecimal(col("quantity")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLen), col("side"))
      .agg(
        min(col("price_d")).as("low"),
        max(col("price_d")).as("high"),
        sum(col("qty_d")).as("volume"),
        sum(col("price_d") * col("qty_d")).as("notional"),
        count(lit(1)).as("n_trades"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("side"), col("low"), col("high"), col("volume"),
        (col("notional").cast("double") / col("volume").cast("double"))
          .as("vwap"),
        col("n_trades"))

  /** s08 (SURVEY §2.4): late/duplicate-data hardening the reference
    * lacks — it trusts exchange ordering and crashes on anomalies.
    * Event-time watermark + per-trade-id dedup with state that expires
    * at the watermark horizon (`dropDuplicatesWithinWatermark`, so
    * dedup state is bounded — a plain dropDuplicates would grow
    * forever on an unbounded stream). */
  def dedupedTrades(tradeRows: DataFrame, watermark: String = "10 minutes"): DataFrame =
    tradeRows
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("id")
      .drop("event_time")
}
