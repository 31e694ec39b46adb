package graft.book

import graft.SparkSpec
import graft.streaming.DepthRow

class OrderBookSpec extends SparkSpec {

  import spark.implicits._

  // snapshot at t=99 establishes 2 bids + 1 ask; deltas update, remove
  // and add levels
  private lazy val rows = Seq(
    DepthRow(99L, 99L, "bid", "570.90", "3.10", is_snapshot = true),
    DepthRow(99L, 99L, "bid", "570.80", "5.00", is_snapshot = true),
    DepthRow(99L, 99L, "ask", "571.00", "1.20", is_snapshot = true),
    DepthRow(100L, 100L, "bid", "570.90", "1.50", is_snapshot = false), // update qty
    DepthRow(101L, 101L, "ask", "571.00", "0.00", is_snapshot = false), // remove level
    DepthRow(101L, 101L, "ask", "571.10", "2.00", is_snapshot = false), // new level
    DepthRow(200L, 200L, "bid", "570.80", "0.00", is_snapshot = false)  // after probe t
  ).toDF()

  test("stateAt reconstructs last-quantity-per-level, dropping zeros") {
    val st = OrderBook.stateAt(rows, t = 150L)
      .select("side", "price", "quantity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(st == Set(
      ("bid", "570.90", "1.50"), // updated by delta at t=100
      ("bid", "570.80", "5.00"), // untouched before t=200
      ("ask", "571.10", "2.00"))) // 571.00 removed by qty 0
  }

  test("topOfBook computes best bid/ask and spread in decimal") {
    val top = OrderBook.topOfBook(OrderBook.stateAt(rows, 150L)).collect().head
    assert(top.getDecimal(0).compareTo(new java.math.BigDecimal("570.90")) == 0)
    assert(top.getDecimal(1).compareTo(new java.math.BigDecimal("571.10")) == 0)
    assert(top.getDecimal(2).compareTo(new java.math.BigDecimal("0.20")) == 0)
  }

  test("cumulativeDepth walks away from the touch per side") {
    val cum = OrderBook.cumulativeDepth(OrderBook.stateAt(rows, 150L))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDecimal(3).doubleValue())).toSet
    assert(cum == Set(
      ("bid", "570.90", 1.5), ("bid", "570.80", 6.5), // best bid first
      ("ask", "571.10", 2.0)))
  }
}
