package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream identity: the reference's dotted quad
  * `exchange.market.symbol.event_type` (factory.py:14). */
final case class EventId(
    exchange: String, market: String, symbol: String, eventType: String) {
  def symbolId: String = s"$symbol.$market" // storage.py:57
  def queryName: String = s"$exchange.$market.$symbol.$eventType"
}

object EventId {
  /** factory.py:14: `exchange, market, symbol, event_type = event.split('.')` */
  def parse(id: String): EventId = id.split('.') match {
    case Array(ex, mk, sym, et) => EventId(ex, mk, sym, et)
    case _ => throw new IllegalArgumentException(
      s"event id must be exchange.market.symbol.event_type, got: $id")
  }
}

/** Runtime config (config.json of the reference, SURVEY §1.5).
  * `sinkFormat` picks the storage layout: `csv` is the reference's
  * single-file header-once append (byte parity; driver-side I/O);
  * `parquet` is the scale path — Spark's native partitioned writer on
  * the same lineage, one directory per stream partitioned by
  * ingest date, no driver materialization. */
final case class StreamConfig(
    events: Seq[String],
    basePath: String = "./data",
    batchSize: Int = 1000,
    sinkFormat: String = "csv")

/** Message source abstraction — the reference's websocket client slot
  * (base.py:26). The zero-egress build ships a file-replay
  * implementation; a websocket DSv2 source drops into the same trait.
  * Contract: a streaming frame with `value: string` (raw JSON) and
  * `local_timestamp: long` (arrival ms — §2.1 #4 arrival enrichment).
  */
trait EventSource {
  def stream(spark: SparkSession, id: EventId): DataFrame
}

/** Replays JSONL fixture files as a stream: one file/directory per
  * event id at `{fixtureRoot}/{symbol}.{market}.{eventType}/`. A fixed
  * arrival timestamp makes tests deterministic; None stamps wall
  * clock like the reference (base.py:52). */
final class FileReplaySource(
    fixtureRoot: String,
    fixedArrivalMs: Option[Long] = None) extends EventSource {
  override def stream(spark: SparkSession, id: EventId): DataFrame = {
    val dir = s"$fixtureRoot/${id.symbol}.${id.market}.${id.eventType}"
    val raw = spark.readStream.text(dir)
    val ts = fixedArrivalMs
      .map(lit(_))
      .getOrElse(unix_millis(current_timestamp()))
    raw.withColumn("local_timestamp", ts)
  }
}

/** Multi-stream fan-out + lifecycle (main.py:12-33, factory.py:9-30;
  * SURVEY §2.1 #18): one StreamingQuery per configured event id, all
  * in one SparkSession, graceful stop on JVM shutdown.
  */
object Runner {

  /** Builds (but does not await) one streaming query per event id.
    * Returns the queries with their sinks for observability
    * (§2.1 #19 counters come from StreamingQueryProgress + sink
    * batchesSaved; the parquet sink has no CsvAppendSink, so None). */
  def start(
      spark: SparkSession,
      config: StreamConfig,
      source: EventSource,
      snapshots: Map[String, BookSnapshot] = Map.empty,
      checkpointRoot: String = "/tmp/graft-checkpoints"): Seq[(StreamingQuery, CsvAppendSink)] = {
    require(config.sinkFormat == "csv",
      "Runner.start returns CsvAppendSinks and is csv-only; use " +
        "startWithSinks for other sink formats")
    startWithSinks(spark, config, source, snapshots, checkpointRoot)
      .map { case (q, s) => (q, s.get) }
  }

  def startWithSinks(
      spark: SparkSession,
      config: StreamConfig,
      source: EventSource,
      snapshots: Map[String, BookSnapshot] = Map.empty,
      checkpointRoot: String = "/tmp/graft-checkpoints"): Seq[(StreamingQuery, Option[CsvAppendSink])] =
    {
    StreamMetrics.ensureListener(spark)
    config.events.map { idStr =>
      val id = EventId.parse(idStr)
      // §2.1 #19 observability: the reference's total_messages counter
      // plus parsed-message count (their difference = dropped corrupt/
      // non-data messages, the reference's warn-and-drop path) as
      // observed metrics, accumulated by StreamMetrics' listener.
      // derived streams consume their underlying tape — the source
      // directory is keyed by the underlying event type
      val sourceId = id.eventType match {
        case "ohlcv" => id.copy(eventType = "trade")
        case "tob" => id.copy(eventType = "depth")
        case _ => id
      }
      val raw = source.stream(spark, sourceId)
        .observe("graft_raw", count(lit(1)).as("messages"))
      val rows = (id.eventType match {
        case "trade" => Pipelines.trades(raw)
        case "depth" =>
          val snapshot = snapshots.getOrElse(id.symbolId,
            throw new IllegalStateException(
              s"no order-book snapshot provided for ${id.symbolId}"))
          Pipelines.depthRows(BookSynchronizer.apply(
            Pipelines.depthRecords(raw), id.market, id.symbol, snapshot))
        // beyond-reference derived streams, routed through the same
        // sink machinery as the raw streams: `...ohlcv` gives
        // per-minute OHLCV/VWAP candles over the trade tape (SURVEY
        // §2.4 s09); `...tob` gives the continuous top-of-book quote
        // stream over the SYNCED depth tape (s10) — same snapshot
        // requirement as a raw depth stream
        case "ohlcv" => Pipelines.streamingOhlcv(Pipelines.trades(raw))
        case "tob" =>
          val snapshot = snapshots.getOrElse(id.symbolId,
            throw new IllegalStateException(
              s"no order-book snapshot provided for ${id.symbolId}"))
          graft.book.StreamingBook.topOfBookStream(
            BookSynchronizer.apply(
              Pipelines.depthRecords(raw), id.market, id.symbol, snapshot),
            id.market, id.symbol)
        case other =>
          throw new IllegalArgumentException(
            s"unsupported event type '$other' (reference supports trade|depth; " +
              "futures markets are enumerated but unimplemented, factory.py:26-29; " +
              "this engine adds derived 'ohlcv')")
      }).observe("graft_rows", count(lit(1)).as("rows"))
      val kind = id.eventType match {
        case "trade" => "trades"
        case "ohlcv" => "ohlcv"
        case "tob" => "tob"
        case _ => "depth"
      }
      val writer = config.sinkFormat match {
        case "csv" =>
          // fresh start: truncate like the reference; checkpointed
          // restart: keep the file, the checkpoint skips written batches
          val freshStart = !java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$checkpointRoot/${id.queryName}.csv"))
          val sink = id.eventType match {
            case "trade" => CsvAppendSink.forTrades(config.basePath,
              id.symbol, id.market, truncateOnStart = freshStart)
            case "ohlcv" => CsvAppendSink.forOhlcv(config.basePath,
              id.symbol, id.market, truncateOnStart = freshStart)
            case "tob" => CsvAppendSink.forTob(config.basePath,
              id.symbol, id.market, truncateOnStart = freshStart)
            case _ => CsvAppendSink.forDepth(config.basePath,
              id.symbol, id.market, truncateOnStart = freshStart)
          }
          // checkpoint path includes the sink format: offsets committed
          // for one sink must never satisfy a different one
          val q = rows.writeStream
            .queryName(id.queryName)
            .option("checkpointLocation", s"$checkpointRoot/${id.queryName}.csv")
            .trigger(Trigger.ProcessingTime("1 second"))
            .foreachBatch { (df: DataFrame, bid: Long) => sink.writeBatch(df, bid) }
            .start()
          (q, Some(sink))
        case "parquet" =>
          // scale path: native partitioned writer, executor-side I/O.
          // Partition date comes from arrival time when the frame has
          // one; derived/aggregate frames (ohlcv and any future type)
          // have no local_timestamp, so their event-time window start
          // partitions them — selected by what the frame CONTAINS so a
          // new derived type cannot reintroduce the unresolved-column
          // crash this guards against.
          val dateSource =
            if (rows.columns.contains("local_timestamp")) col("local_timestamp")
            else col("window_start_ms")
          val q = rows
            .withColumn("ingest_date",
              to_date(timestamp_millis(dateSource)))
            .writeStream
            .queryName(id.queryName)
            .format("parquet")
            .partitionBy("ingest_date")
            .option("path", s"${config.basePath}/${id.symbolId}.$kind")
            .option("checkpointLocation", s"$checkpointRoot/${id.queryName}.parquet")
            .trigger(Trigger.ProcessingTime("1 second"))
            .start()
          (q, None)
        case "bigquery" =>
          // The reference declares this sink but leaves it TODO
          // (factory.py:40-42). Implemented as its load-job staging
          // half: per-batch idempotent NDJSON under
          // basePath/bq_staging/<query>/batch_id=N plus the
          // BigQueryStage.loadCommand contract — only the API call is
          // blocked by the zero-egress environment.
          val staging = s"${config.basePath}/bq_staging/${id.queryName}"
          val q = rows.writeStream
            .queryName(id.queryName)
            .option("checkpointLocation",
              s"$checkpointRoot/${id.queryName}.bigquery")
            .trigger(Trigger.ProcessingTime("1 second"))
            .foreachBatch { (df: DataFrame, bid: Long) =>
              graft.sinks.BigQueryStage.stageBatch(df, bid, staging)
            }
            .start()
          (q, None)
        case other => throw new IllegalArgumentException(
          s"unsupported sink format '$other' (csv|parquet|bigquery)")
      }
      writer
    }
    }

  /** §2.1 #19: the reference's `total_messages` counter, accumulated
    * by [[StreamMetrics]]' listener across the whole run (NOT a
    * `recentProgress` sum, which is capped at 100 entries). The
    * listener delivers events asynchronously — call after
    * `processAllAvailable`/stop, or expect eventual consistency. */
  def totalMessages(q: StreamingQuery): Long =
    StreamMetrics.messages(q.runId)

  /** Output rows counter (for trades = parsed messages, so
    * totalMessages - totalRows = dropped corrupt/ack messages — the
    * reference's warn-and-drop path made observable; for depth =
    * exploded levels). */
  def totalRows(q: StreamingQuery): Long =
    StreamMetrics.rows(q.runId)

  /** main.py:16-22 graceful shutdown: stop every query, then log
    * final counters via the query progress. */
  def stopAll(queries: Seq[StreamingQuery]): Unit =
    queries.foreach { q => if (q.isActive) q.stop() }

  /** Blocks like spark.streams.awaitAnyTermination with a shutdown
    * hook mirroring the reference's SIGINT/SIGTERM handling. */
  def await(spark: SparkSession, queries: Seq[StreamingQuery]): Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => stopAll(queries)))
    spark.streams.awaitAnyTermination()
  }
}
