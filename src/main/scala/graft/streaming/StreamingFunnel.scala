package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** s16: streaming conversion funnel — the CEP analog of batch q78
  * (`queries.Extras.q78`): per user, detect the ordered pattern
  * view → click (strictly after the first view) → purchase (strictly
  * after that click), and emit ONE row the moment the pattern
  * completes. This is the streaming half of the funnel the reference's
  * batch consumers would run offline (and the shape of a real-time
  * conversion alert).
  *
  * Parity argument (asserted by StreamingFunnelSpec against the batch
  * q78 chain): each stage arms exactly once, from the first qualifying
  * event in event-time order. Under the same per-user in-order
  * contract as [[StreamingSessionize.SessionProcessor]] (same-user
  * events arrive in event-time order ACROSS batches; disorder within
  * a batch is sorted here), a later event can never lower an armed
  * stage (later ⇒ larger ts), so the streaming fold reaches exactly
  * the batch assignment:
  *  - t_view = min ts over views — the first view in order;
  *  - t_click = min qualifying click (ts strictly > t_view) — when any
  *    click arrives, every earlier view is already folded, so the
  *    qualification test is final;
  *  - t_purchase likewise over t_click.
  * Ties are handled identically in both engines: a click at ts equal
  * to t_view fails the strict >, whichever of the two events folds
  * first.
  *
  * Scale posture: state per user is exactly three longs (the armed
  * stage timestamps), keyed state partitions by user hash, and a
  * matched user's state freezes (later events no-op) — footprint is
  * (observed users) × O(1), independent of stream length. No timers:
  * the funnel emits on arrival of the completing event, never on
  * watermark progress.
  */
object StreamingFunnel {

  /** Input surface (ts_t carries the watermark; ts_ms is its exact
    * integer twin used for all arithmetic). */
  case class FunnelEvent(user_id: Long, event_id: Long, ts_ms: Long,
      event_type: String, ts_t: java.sql.Timestamp)

  /** The completed funnel — q78's converted row. */
  case class FunnelOut(user_id: Long, t_view_ms: Long, t_click_ms: Long,
      t_purchase_ms: Long)

  /** Armed stage timestamps; Long.MinValue = unset (a sentinel keeps
    * state three flat longs instead of nested Options, and — unlike a
    * -1 sentinel — cannot collide with legitimate pre-epoch negative
    * timestamps; ts_ms == Long.MinValue itself is unrepresentable as
    * an instant). */
  case class Stages(tView: Long, tClick: Long, tPurchase: Long)

  private val NoTs = Long.MinValue
  private val Unset = Stages(NoTs, NoTs, NoTs)

  /** One fold step — THE funnel semantics (q78's strict ordering),
    * the only place stage qualification can change. */
  private[streaming] def foldEvent(s: Stages, e: FunnelEvent): Stages =
    e.event_type match {
      case "view" if s.tView == NoTs => s.copy(tView = e.ts_ms)
      case "click" if s.tClick == NoTs && s.tView != NoTs && e.ts_ms > s.tView =>
        s.copy(tClick = e.ts_ms)
      case "purchase" if s.tPurchase == NoTs && s.tClick != NoTs && e.ts_ms > s.tClick =>
        s.copy(tPurchase = e.ts_ms)
      case _ => s
    }

  class FunnelProcessor extends StatefulProcessor[Long, FunnelEvent, FunnelOut] {

    @transient private var st: ValueState[Stages] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Stages]("stages",
        Encoders.product[Stages], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelOut] = {
      val before = if (st.exists()) st.get() else Unset
      if (before.tPurchase != NoTs) return Iterator.empty // matched: frozen
      var s = before
      rows.toVector.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
        if (s.tPurchase == NoTs) s = foldEvent(s, e)
      }
      st.update(s)
      if (s.tPurchase != NoTs)
        Iterator.single(FunnelOut(key, s.tView, s.tClick, s.tPurchase))
      else Iterator.empty
    }
  }

  def apply(events: DataFrame, watermarkDelay: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts_t", timestamp_millis(col("ts_ms")))
      .withWatermark("ts_t", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
