package graft.streaming

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's CSV storage contract (storage.py:47-82; SURVEY.md
  * §2.1 #16): one file per (symbol, market, kind) named
  * `{symbol}.{market}.{kind}.csv`, created/truncated at startup,
  * header written exactly once (with the first non-empty batch),
  * appended thereafter; a running saved-batch counter (storage.py:17-18).
  *
  * This single-file append layout is inherently driver-side I/O — it
  * exists for byte-layout parity with the reference. Rows stream to
  * the driver via `toLocalIterator` (one partition in memory at a
  * time, never a full collect). The scale path is the same pipeline
  * with Spark's native partitioned csv/parquet sink instead — nothing
  * upstream changes.
  *
  * Restart note: like the reference (storage.py:77-82) the file is
  * truncated at startup, so restarting against an existing checkpoint
  * re-records only data the checkpoint hasn't seen — on a live stream
  * that's everything new; on a finite replay that's nothing. Use a
  * fresh checkpoint dir to re-record a replay.
  */
final class CsvAppendSink(
    basePath: String,
    symbol: String,
    market: String,
    kind: String, // "trades" | "depth"
    columns: Seq[String],
    truncateOnStart: Boolean = true) extends Serializable {

  val path: Path = Paths.get(basePath, s"$symbol.$market.$kind.csv")
  /** Sidecar recording the last batchId appended — makes the append
    * idempotent when Spark replays the last uncommitted micro-batch
    * after a restart (foreachBatch is at-least-once; the batchId
    * guard narrows this to effectively-once, except for a crash in
    * the small window between the data append and the sidecar write —
    * true exactly-once needs a transactional sink, which is what the
    * parquet sink format provides). */
  private val batchIdPath: Path =
    Paths.get(basePath, s"$symbol.$market.$kind.csv.lastbatch")
  @volatile var batchesSaved: Long = 0L

  // storage.py:77-82: pre-create/truncate at construction — on a
  // FRESH start. A checkpoint-resumed query must keep the file (the
  // checkpoint skips already-written batches; truncating would lose
  // them), so Runner passes truncateOnStart = !checkpointExists.
  Files.createDirectories(path.getParent)
  if (truncateOnStart || !Files.exists(path)) {
    Files.write(path, Array.emptyByteArray)
    Files.deleteIfExists(batchIdPath)
  }

  private def lastWrittenBatch: Long =
    if (Files.exists(batchIdPath))
      new String(Files.readAllBytes(batchIdPath)).trim.toLong
    else -1L

  private def render(v: Any): String = v match {
    case null => ""
    // Python bool capitalization: the reference persists rows via
    // pandas DataFrame.to_csv (storage.py:60-66), which renders bools
    // as 'True'/'False' — so depth's is_snapshot column must too.
    case b: Boolean => if (b) "True" else "False"
    case other => other.toString
  }

  /** foreachBatch body. Header iff nothing written yet (storage.py:
    * 67-68, 74-75); replayed batches (batchId already recorded) are
    * skipped.
    *
    * Flush-cadence deviation from the reference (deliberate):
    * storage.py:24-36 buffers OUTPUT rows and flushes only when
    * ≥ batch_size rows accumulated, silently dropping a trailing
    * partial buffer at shutdown; this sink writes every non-empty
    * micro-batch (the replay source admits batch_size MESSAGES, and a
    * depth message explodes to several rows). Net effect: file
    * CONTENT gains the tail rows the reference loses at shutdown, and
    * `batchesSaved` counts micro-batches, not 1000-row chunks. Row
    * bytes are otherwise identical. */
  def writeBatch(df: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastWrittenBatch) {
      // Replayed batch (crash landed between the data append and the
      // checkpoint commit): skip the WRITE but still EXECUTE the frame.
      // Spark 4.1 validates that every micro-batch of a stateful query
      // commits every state-store partition — a zero-work skip crashes
      // the restart with STATE_STORE_COMMIT_VALIDATION_FAILED (found
      // by KillResumeSpec's between-batch kill: the sidecar records
      // the batch, the checkpoint doesn't, the replay skips, the query
      // dies). foreach(noop) runs all partitions executor-side with
      // zero driver transfer.
      df.foreach(_ => ())
      return
    }
    val projected = df.select(columns.map(col): _*)
    val it = projected.toLocalIterator()
    if (!it.hasNext) return
    // explicit UTF-8: platform-default charset could diverge from the
    // reference's UTF-8 CSVs on a non-UTF-8 locale JVM
    val w = new BufferedWriter(new FileWriter(path.toFile,
      java.nio.charset.StandardCharsets.UTF_8, true))
    try {
      if (Files.size(path) == 0L) {
        w.write(columns.mkString(","))
        w.newLine()
      }
      while (it.hasNext) {
        val row = it.next()
        val sb = new StringBuilder
        var i = 0
        while (i < row.length) {
          if (i > 0) sb.append(',')
          sb.append(render(row.get(i)))
          i += 1
        }
        w.write(sb.toString)
        w.newLine()
      }
    } finally w.close()
    // atomic sidecar update (no torn reads on crash mid-write)
    val tmp = batchIdPath.resolveSibling(batchIdPath.getFileName.toString + ".tmp")
    Files.write(tmp, batchId.toString.getBytes)
    Files.move(tmp, batchIdPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    batchesSaved += 1
  }
}

object CsvAppendSink {
  /** Column orders are the reference's dict insertion orders
    * (FIXTURES.md §2.5). */
  val tradeColumns: Seq[String] =
    Seq("timestamp", "local_timestamp", "id", "price", "quantity", "side")
  val depthColumns: Seq[String] =
    Seq("timestamp", "local_timestamp", "side", "price", "quantity", "is_snapshot")

  def forTrades(basePath: String, symbol: String, market: String,
      truncateOnStart: Boolean = true): CsvAppendSink =
    new CsvAppendSink(basePath, symbol, market, "trades", tradeColumns,
      truncateOnStart)
  def forDepth(basePath: String, symbol: String, market: String,
      truncateOnStart: Boolean = true): CsvAppendSink =
    new CsvAppendSink(basePath, symbol, market, "depth", depthColumns,
      truncateOnStart)

  /** Derived OHLCV candle stream (beyond-reference; column order =
    * Pipelines.streamingOhlcv's output order). */
  val ohlcvColumns: Seq[String] =
    Seq("window_start_ms", "side", "low", "high", "volume", "vwap", "n_trades")
  def forOhlcv(basePath: String, symbol: String, market: String,
      truncateOnStart: Boolean = true): CsvAppendSink =
    new CsvAppendSink(basePath, symbol, market, "ohlcv", ohlcvColumns,
      truncateOnStart)

  /** Derived top-of-book quote stream (beyond-reference; column order
    * = book.TopOfBook's field order). */
  val tobColumns: Seq[String] =
    Seq("timestamp", "local_timestamp", "best_bid", "best_bid_qty",
      "best_ask", "best_ask_qty", "spread", "bid_levels", "ask_levels")
  def forTob(basePath: String, symbol: String, market: String,
      truncateOnStart: Boolean = true): CsvAppendSink =
    new CsvAppendSink(basePath, symbol, market, "tob", tobColumns,
      truncateOnStart)
}
