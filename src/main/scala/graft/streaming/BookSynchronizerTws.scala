package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The book-sync operator on Spark 4's arbitrary-state API
  * (`transformWithState` + [[StatefulProcessor]]), semantically
  * identical to [[BookSynchronizer]] (same pure [[SyncLogic]] core,
  * same property suite applies).
  *
  * Why both exist: `flatMapGroupsWithState` is the widely-deployed
  * API; `transformWithState` is its successor with composable named
  * state variables, TTL, and timers — on a long-lived multi-symbol
  * deployment the TTL hook (idle symbols expiring sync state) and
  * per-variable state layout are what you want. State here is one
  * named ValueState["sync"] per (symbol, market) group; a production
  * variant would split the pre-sync buffer into a ListState for O(1)
  * appends.
  *
  * Requires the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`):
  * the default HDFS-backed store doesn't support the named-state
  * column families transformWithState uses.
  */
class BookSyncProcessor(snapshot: BookSnapshot)
    extends StatefulProcessor[String, DepthRecord, DepthRecord] {

  @transient private var syncState: ValueState[SyncLogic.SyncState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    syncState = getHandle.getValueState[SyncLogic.SyncState](
      "sync", Encoders.product[SyncLogic.SyncState], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      inputRows: Iterator[DepthRecord],
      timerValues: TimerValues): Iterator[DepthRecord] = {
    val st = if (syncState.exists()) syncState.get() else SyncLogic.empty
    val sorted = inputRows.toVector.sortBy(_.first_update_id)
    val (st2, out) = SyncLogic.run(st, sorted, snapshot)
    syncState.update(st2)
    out.iterator
  }
}

object BookSynchronizerTws {
  /** Drop-in alternative to [[BookSynchronizer.apply]]. */
  def apply(
      records: DataFrame,
      market: String,
      symbol: String,
      snapshot: BookSnapshot): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.as[DepthRecord]
      .groupByKey(_ => s"$symbol.$market")
      .transformWithState(
        new BookSyncProcessor(snapshot),
        TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
