package graft.book

import graft.streaming.Pipelines.asDecimal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-book analytics over the engine's depth_updates output
  * (README.md:47-61 of the reference documents the table precisely so
  * consumers can "reconstruct the book at any point in time" — these
  * are those consumer queries, expressed Spark-first).
  *
  * Input frames have the DepthRow shape: (timestamp, local_timestamp,
  * side, price, quantity, is_snapshot) with price/quantity as
  * exchange-exact decimal strings (SURVEY §1.4) — ordering and
  * arithmetic always go through DecimalType casts, never string order.
  *
  * Scale posture: reconstruction is one window over (side, price) —
  * shuffle-partitioned by the book key, no driver materialization;
  * at 100 TB you'd partition the updates table by symbol/date so the
  * window's shuffle prunes to the probed symbol and time range
  * (predicate `timestamp <= t` pushes to the scan).
  */
object OrderBook {

  /** Book state at time `t`: the last quantity per (side, price) among
    * updates with timestamp ≤ t; zero quantities (level removals)
    * drop out of the state. Snapshot rows sort before same-ms deltas
    * via the is_snapshot tiebreak (they carry arrival−1 timestamps by
    * construction).
    *
    * Time domains, inherited from the reference
    * (spot_depth_etl.py:114-123): snapshot rows are stamped with
    * LOCAL arrival−1 precisely so they order before the deltas'
    * local timestamps — so RECENCY is decided by (local_timestamp,
    * timestamp), while the probe time `t` filters deltas by exchange
    * time and the snapshot baseline is always included. Ordering by
    * exchange time alone would let the snapshot (arrival−1, a late
    * wall-clock value) shadow earlier-arriving deltas it predates. */
  def stateAt(depthRows: DataFrame, t: Long): DataFrame = {
    val w = Window.partitionBy(col("side"), col("price"))
      .orderBy(col("local_timestamp").desc, col("is_snapshot").asc,
        col("timestamp").desc)
    depthRows
      .filter(col("is_snapshot") || col("timestamp") <= t)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .filter(asDecimal(col("quantity")) =!= lit(0))
      .select(col("side"), col("price"), col("quantity"),
        asDecimal(col("price")).as("price_d"),
        asDecimal(col("quantity")).as("quantity_d"))
  }

  /** Best bid / best ask / spread from a [[stateAt]] frame. */
  def topOfBook(state: DataFrame): DataFrame = {
    val agg = state.groupBy()
      .agg(
        max(when(col("side") === "bid", col("price_d"))).as("best_bid"),
        min(when(col("side") === "ask", col("price_d"))).as("best_ask"))
    agg.select(col("best_bid"), col("best_ask"),
      (col("best_ask") - col("best_bid")).as("spread"))
  }

  /** Cumulative depth curve: running quantity per side walking away
    * from the touch (bids descending, asks ascending). */
  def cumulativeDepth(state: DataFrame): DataFrame = {
    val wBid = Window.partitionBy("side").orderBy(col("price_d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsk = Window.partitionBy("side").orderBy(col("price_d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    state.withColumn("cum_qty",
      when(col("side") === "bid", sum(col("quantity_d")).over(wBid))
        .otherwise(sum(col("quantity_d")).over(wAsk)))
      .select(col("side"), col("price"), col("quantity"), col("cum_qty"))
  }
}
