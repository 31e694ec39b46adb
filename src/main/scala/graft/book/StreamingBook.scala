package graft.book

import graft.streaming.DepthRecord
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Top-of-book row emitted after applying one depth record. Prices
  * stay exchange-exact decimal strings (SURVEY §1.4); `spread` is
  * computed in BigDecimal and rendered back to a plain string. */
final case class TopOfBook(
    timestamp: Long,
    local_timestamp: Long,
    best_bid: String,
    best_bid_qty: String,
    best_ask: String,
    best_ask_qty: String,
    spread: String,
    bid_levels: Int,
    ask_levels: Int)

/** Continuous order-book maintenance: the real-time analytic the
  * recorded data exists for. Consumes the post-sync depth-record
  * stream (snapshot replay first, then contiguous deltas — exactly
  * [[graft.streaming.BookSynchronizer]]'s output contract), folds
  * each record's levels into keyed book state (qty 0 removes a
  * level), and emits one top-of-book row per applied record.
  *
  * State is two price→qty maps per (symbol, market) — bounded by the
  * venue's book depth, partitioned with the stream key, so a
  * 1000-symbol deployment holds 1000 small maps spread across
  * executors. */
object StreamingBook {

  final case class BookState(
      bids: Map[String, String],
      asks: Map[String, String])

  private val zero = BigDecimal(0)

  private def applyLevels(
      levels: Map[String, String],
      updates: Seq[Seq[String]]): Map[String, String] =
    updates.foldLeft(levels) { (m, lvl) =>
      val (price, qty) = (lvl.head, lvl(1))
      if (BigDecimal(qty) == zero) m - price else m.updated(price, qty)
    }

  /** Pure per-record step: fold the update into the book, emit ToB. */
  def step(st: BookState, ev: DepthRecord): (BookState, TopOfBook) = {
    val st2 = BookState(
      applyLevels(st.bids, ev.bids),
      applyLevels(st.asks, ev.asks))
    def best(m: Map[String, String], isBid: Boolean): Option[(String, String)] =
      if (m.isEmpty) None
      else Some {
        val key = if (isBid) m.keysIterator.maxBy(BigDecimal(_))
        else m.keysIterator.minBy(BigDecimal(_))
        (key, m(key))
      }
    val bb = best(st2.bids, isBid = true)
    val ba = best(st2.asks, isBid = false)
    val spread = (bb, ba) match {
      case (Some((b, _)), Some((a, _))) =>
        (BigDecimal(a) - BigDecimal(b)).bigDecimal.toPlainString
      case _ => ""
    }
    (st2, TopOfBook(ev.timestamp, ev.local_timestamp,
      bb.map(_._1).getOrElse(""), bb.map(_._2).getOrElse(""),
      ba.map(_._1).getOrElse(""), ba.map(_._2).getOrElse(""),
      spread, st2.bids.size, st2.asks.size))
  }

  /** Streaming operator over a [[graft.streaming.BookSynchronizer]]
    * output frame; also works on batch frames for replayed analysis. */
  def topOfBookStream(records: DataFrame, market: String, symbol: String): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.as[DepthRecord]
      .groupByKey(_ => s"$symbol.$market")
      .flatMapGroupsWithState[BookState, TopOfBook](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, events: Iterator[DepthRecord], state: GroupState[BookState]) =>
          var st = state.getOption.getOrElse(BookState(Map.empty, Map.empty))
          // snapshot rows first (they carry arrival-1 local timestamps),
          // then deltas in id order — the synchronizer's emission order
          val sorted = events.toVector.sortBy(e =>
            (e.local_timestamp, e.first_update_id, !e.is_snapshot))
          val out = sorted.map { ev =>
            val (st2, tob) = step(st, ev)
            st = st2
            tob
          }
          state.update(st)
          out.iterator
      }
      .toDF()
  }
}
