package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput baseline (round-11 judge task 4): the
  * reference is a streaming ETL, yet BASELINE.md recorded only batch
  * numbers — SURVEY §3.2's "keep the hot path shuffle-free" claim had
  * no measured rows/s, so a hot-path regression was invisible.
  *
  * Measures the s01→s06 replay pipeline end to end with
  * `Trigger.AvailableNow` over a DETERMINISTIC generated JSONL corpus
  * (index-arithmetic fields, no RNG — identical bytes every run):
  *
  *   - trade path:  FileReplaySource → Pipelines.trades → sink
  *   - depth path:  FileReplaySource → Pipelines.depthRecords →
  *                  BookSynchronizer (contiguous-id tape, one symbol
  *                  group — the reference's serial state machine) →
  *                  Pipelines.depthRows → sink
  *
  * each against BOTH sinks: the reference's single-file header-once
  * CSV append (driver-side toLocalIterator — the byte-parity
  * contract) and the scale-path partitioned parquet writer
  * (executor-side I/O). CSV vs parquet on the same tape is therefore
  * a direct measurement of what the single-file contract costs.
  *
  * Usage: `tools/run.sh graft.streaming.StreamBench [corpusDir]`
  * (env: SPARK_GRAFT_STREAM_TRADES / _DEPTH message counts,
  * SPARK_GRAFT_STREAM_OUT json path). Prints ONE JSON line; rows/s =
  * sink OUTPUT rows (trades = parsed messages; depth = exploded
  * levels) over wall seconds from query start to AvailableNow
  * completion, after a small warmup run per (path, sink) pair so JVM
  * and codegen warmup is not billed to the measured tape. */
object StreamBench {

  private val ArrivalMs = 1727784001000L

  private def writeLines(dir: Path, files: Int, lines: Seq[String]): Unit = {
    Files.createDirectories(dir)
    val perFile = math.max(1, math.ceil(lines.size / files.toDouble).toInt)
    lines.grouped(perFile).zipWithIndex.foreach { case (chunk, i) =>
      val w = Files.newBufferedWriter(dir.resolve(f"part-$i%03d.jsonl"))
      try chunk.foreach { l => w.write(l); w.write('\n') }
      finally w.close()
    }
  }

  private def tradeLine(i: Long): String = {
    val p = 100000 + (i * 7) % 9000 // 100.000 .. 108.999, 3dp
    val q = 1 + (i * 13) % 500
    s"""{"e":"trade","E":${1700000000000L + i},"t":${i + 1},""" +
      s""""p":"${p / 1000}.${f"${p % 1000}%03d"}","q":"0.${f"$q%03d"}",""" +
      s""""m":${i % 2 == 0}}"""
  }

  /** Contiguous-id depth tape: U starts at lastUpdateId+1 and each
    * message consumes 4 ids, so the sync state machine admits every
    * message (the steady-state hot path — no crash-stop exercised). */
  private def depthLine(i: Long, lastUpdateId: Long, levels: Int): String = {
    def side(base: Int, dir: Int): String =
      (0 until levels).map { l =>
        val p = base + dir * (10 * l + (i % 7).toInt)
        val q = (i + l) % 900
        s"""["${p / 100}.${f"${p % 100}%02d"}","${q / 10}.${q % 10}"]"""
      }.mkString("[", ",", "]")
    val u0 = lastUpdateId + 1 + i * 4
    s"""{"e":"depthUpdate","E":${1700000000000L + i * 10},"U":$u0,""" +
      s""""u":${u0 + 3},"b":${side(99900, -1)},"a":${side(100100, 1)}}"""
  }

  /** Extra symbols for the parallelism measurement — same depth tape
    * per symbol (identical work), so aggregate msgs/s reads directly
    * as the symbol-scaling factor. Round 13: a LADDER (4/8/16/32) so
    * the production sizing claim ("throughput = symbols × per-symbol
    * rate, bounded by cores") has a saturation curve, not the single
    * 4-symbol point it was extrapolated from. */
  private val SymLadder = Seq(4, 8, 16, 32)

  /** Deterministic 64-dim vector tape for the s23 SemDeDup gate:
    * 3-decimal values in [−0.498, 0.498], nonzero and in-domain, so
    * every vector is admissible and the measured rate is gate
    * throughput, not admission filtering. */
  private def vecLine(i: Long): String = {
    val emb = (0 until 64).map { j =>
      val h = (i * 131 + j * 31 + 7) % 997
      s"${(h - 498) / 1000.0}"
    }.mkString("[", ",", "]")
    s"""{"vec_id":$i,"embedding":$emb}"""
  }

  /** s23 ingest-rate: vectors/s through the streaming SemDeDup gate
    * (index trained once from the sf0.1 corpus — the memoized Lloyd
    * chain — then one AvailableNow pass over the tape writing parquet
    * verdicts). Per-vector work = row-local quantize + topk kernel +
    * one cluster-equality join probe. */
  private def runSemDedup(spark: org.apache.spark.sql.SparkSession,
      root: Path, n: Long): (Double, Long) = {
    import org.apache.spark.sql.types._
    // Tape dir keyed by COUNT (the genCorpus marker discipline): a
    // rerun with a different SPARK_GRAFT_STREAM_VECS must regenerate,
    // not silently reuse a stale tape while reporting the new n as
    // the throughput denominator (the round-11 stale-corpus class).
    val dir = root.resolve(s"vectors_$n")
    if (!Files.exists(dir)) writeLines(dir, 32, (0L until n).map(vecLine))
    val idx = StreamingSemDedup.buildIndex(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    try {
      val schema = new StructType().add("vec_id", LongType)
        .add("embedding", ArrayType(FloatType))
      val stream = spark.readStream.schema(schema).json(dir.toString)
      val out = Files.createTempDirectory("sb-semdedup").toString + "/v"
      val ckpt = Files.createTempDirectory("sb-semdedup-ckpt").toString
      val t0 = System.nanoTime()
      val q = StreamingSemDedup.start(stream, idx, out, ckpt)
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, spark.read.parquet(out).count())
    } finally idx.release()
  }
  private def multiSyms(n: Int): Seq[String] =
    (0 until n).map(i => f"S$i%02dUSDT")

  private def genCorpus(root: Path, nTrades: Long, nDepth: Long,
      levels: Int): Unit = {
    // v3: symbol-ladder depth dirs (S00..S31) — the marker version
    // keys the LAYOUT so an old corpus regenerates rather than
    // silently missing the ladder dirs
    val marker = root.resolve(s"corpus_v3_${nTrades}_${nDepth}_$levels.ok")
    if (Files.exists(marker)) return
    // regenerating under the same root with a SMALLER message count
    // must not leave the previous shape's extra part files (or its
    // marker) behind — writeLines only overwrites the indices it
    // produces, and a stale part silently inflates the replayed count
    // and every throughput denominator (round-11 ADVICE). Clear the
    // corpus subdirs and old markers before writing.
    if (Files.isDirectory(root)) {
      Files.list(root).forEach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".ok") ||
            (Files.isDirectory(p) && n.matches(".*\\.spot\\.(trade|depth)"))) {
          if (Files.isDirectory(p))
            Files.walk(p).sorted(java.util.Comparator.reverseOrder())
              .forEach(f => Files.delete(f))
          else Files.delete(p)
        }
      }
    }
    writeLines(root.resolve("BTCUSDT.spot.trade"), 8,
      (0L until nTrades).map(tradeLine))
    val depth = (0L until nDepth).map(depthLine(_, 100L, levels))
    writeLines(root.resolve("BTCUSDT.spot.depth"), 8, depth)
    multiSyms(SymLadder.max).foreach { s =>
      writeLines(root.resolve(s"$s.spot.depth"), 8, depth)
    }
    Files.createFile(marker)
    ()
  }

  private def snapshot(levels: Int): BookSnapshot = BookSnapshot(100L,
    bids = (0 until levels).map(l => Seq(s"998.${f"${l * 3}%02d"}", "1.0")),
    asks = (0 until levels).map(l => Seq(s"1002.${f"${l * 3}%02d"}", "1.0")))

  /** One measured run: build the lineage, drive it AvailableNow into
    * the chosen sink, return (seconds, output rows). */
  private def runOne(spark: org.apache.spark.sql.SparkSession,
      corpus: Path, path: String, sink: String, levels: Int,
      decouple: Boolean = false): (Double, Long) = {
    val work = Files.createTempDirectory(s"sb-$path-$sink")
    val src = new FileReplaySource(corpus.toString, Some(ArrivalMs))
    val id = EventId.parse(s"binance.spot.BTCUSDT.$path")
    val raw = src.stream(spark, id)
    val rows = path match {
      case "trade" => Pipelines.trades(raw)
      case _ =>
        val synced = BookSynchronizer.apply(
          Pipelines.depthRecords(raw), id.market, id.symbol, snapshot(levels))
        // A/B lever (round-11 judge task 4): the per-symbol serial
        // state fold and the downstream explode/union/sink currently
        // ride ONE task; `decouple` inserts a shuffle after the state
        // machine so the fold task ships slim DepthRecord rows and the
        // 6x-wider exploded level rows are built and written by
        // parallel post-shuffle tasks. Whether that buys intra-symbol
        // throughput (vs the shuffle's serialization tax) is exactly
        // what the depth_parquet_decoupled row measures.
        Pipelines.depthRows(
          if (decouple) synced.repartition(8) else synced)
    }
    val ckpt = work.resolve("ckpt").toString
    val t0 = System.nanoTime()
    val (q, outCount) = sink match {
      case "csv" =>
        val s = if (path == "trade")
          CsvAppendSink.forTrades(work.toString, id.symbol, id.market,
            truncateOnStart = true)
        else
          CsvAppendSink.forDepth(work.toString, id.symbol, id.market,
            truncateOnStart = true)
        val q = rows.writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (df: DataFrame, bid: Long) => s.writeBatch(df, bid) }
          .start()
        (q, () => Files.lines(s.path).count() - 1)
      case _ =>
        val outDir = work.resolve("out").toString
        val q = rows
          .withColumn("ingest_date",
            to_date(timestamp_millis(col("local_timestamp"))))
          .writeStream
          .format("parquet")
          .partitionBy("ingest_date")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        (q, () => spark.read.parquet(outDir).count())
    }
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, outCount())
  }

  /** The depth path's scale lever, measured: its ceiling is the
    * PER-SYMBOL serial sync state machine (one fMGWS group), so
    * throughput scales with independent symbol pipelines, not with
    * executors per symbol. Drives `nSyms` identical depth
    * pipelines concurrently in one session (each its own query,
    * checkpoint, and parquet sink — the Runner fan-out shape) and
    * returns (seconds, total output rows) for the aggregate. */
  private def runDepthMulti(spark: org.apache.spark.sql.SparkSession,
      corpus: Path, levels: Int, nSyms: Int): (Double, Long) = {
    val work = Files.createTempDirectory("sb-depth-multi")
    val t0 = System.nanoTime()
    val outDirs = multiSyms(nSyms).map { sym =>
      val src = new FileReplaySource(corpus.toString, Some(ArrivalMs))
      val id = EventId.parse(s"binance.spot.$sym.depth")
      val rows = Pipelines.depthRows(BookSynchronizer.apply(
        Pipelines.depthRecords(src.stream(spark, id)),
        id.market, id.symbol, snapshot(levels)))
      val outDir = work.resolve(s"out-$sym").toString
      val q = rows
        .withColumn("ingest_date",
          to_date(timestamp_millis(col("local_timestamp"))))
        .writeStream
        .format("parquet")
        .partitionBy("ingest_date")
        .option("path", outDir)
        .option("checkpointLocation", work.resolve(s"ckpt-$sym").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      (q, outDir)
    }
    outDirs.foreach(_._1.awaitTermination())
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, outDirs.map(o => spark.read.parquet(o._2).count()).sum)
  }

  def main(args: Array[String]): Unit = {
    val corpusRoot = Paths.get(
      args.headOption.getOrElse("/tmp/graft_streambench"))
    val nTrades = sys.env.getOrElse("SPARK_GRAFT_STREAM_TRADES", "200000").toLong
    val nDepth = sys.env.getOrElse("SPARK_GRAFT_STREAM_DEPTH", "50000").toLong
    val levels = 3
    genCorpus(corpusRoot, nTrades, nDepth, levels)
    val warmRoot = corpusRoot.resolve("warmup")
    genCorpus(warmRoot, 2000, 500, levels)

    val spark = graft.Bench.session()
    spark.sparkContext.setLogLevel("WARN")
    val paths = Seq("trade" -> "csv", "trade" -> "parquet",
      "depth" -> "csv", "depth" -> "parquet")
    val results = paths.map { case (p, s) =>
      runOne(spark, warmRoot, p, s, levels) // warmup, unbilled
      val (sec, rows) = runOne(spark, corpusRoot, p, s, levels)
      val msgs = if (p == "trade") nTrades else nDepth
      s"$p" + "_" + s -> (sec, rows, msgs)
    } ++ SymLadder.map { nSyms =>
      runDepthMulti(spark, warmRoot, levels, nSyms) // warmup, unbilled
      val (sec, rows) = runDepthMulti(spark, corpusRoot, levels, nSyms)
      s"depth_parquet_x$nSyms" -> (sec, rows, nDepth * nSyms)
    }
    // depth decoupling A/B (round-11 judge task 4): same tape, shuffle
    // inserted between the state fold and the explode+sink
    val decoupled = {
      runOne(spark, warmRoot, "depth", "parquet", levels, decouple = true)
      val (sec, rows) =
        runOne(spark, corpusRoot, "depth", "parquet", levels, decouple = true)
      "depth_parquet_decoupled" -> (sec, rows, nDepth)
    }
    // RocksDB state-store rows (round-11 judge task 2): the production
    // state backend for the stateful heart. Same tapes and sink; the
    // trade row is the stateless control (no state store touched — any
    // delta there is noise floor), the depth row is the measurement.
    // Fresh checkpoints per run, so provider switching is safe.
    val rocksRows = {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val rr = Seq("trade", "depth").map { p =>
        runOne(spark, warmRoot, p, "parquet", levels) // warmup, unbilled
        val (sec, rows) = runOne(spark, corpusRoot, p, "parquet", levels)
        s"${p}_parquet_rocksdb" ->
          (sec, rows, if (p == "trade") nTrades else nDepth)
      }
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      rr
    }
    // s23 SemDeDup gate rate (round 14): vectors/s against the static
    // sf0.1-trained index, admissible-by-construction tape
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_STREAM_VECS", "200000").toLong
    // Wrapped: the gate needs an index corpus (SPARK_GRAFT_SF_DIR or
    // the default testdata path); on a box with neither, report the
    // leg as absent rather than aborting the trade/depth metrics.
    val semdedup = scala.util.Try {
      runSemDedup(spark, warmRoot, 2000) // warmup, unbilled
      val (sec, rows) = runSemDedup(spark, corpusRoot, nVecs)
      "semdedup_parquet" -> (sec, rows, nVecs)
    }.toEither.left.map { e =>
      System.err.println(s"semdedup leg skipped: ${e.getMessage}")
      e
    }.toOption
    val allResults = (results :+ decoupled) ++ semdedup ++ rocksRows
    val json = "{\"metric\":\"stream_throughput\",\"unit\":\"rows_per_sec\"," +
      s""""corpus":{"trade_msgs":$nTrades,"depth_msgs":$nDepth,""" +
      s""""vec_msgs":$nVecs,""" +
      s""""depth_levels_per_msg":${2 * levels}},"paths":{""" +
      allResults.map { case (k, (sec, rows, msgs)) =>
        s""""$k":{"sec":${f"$sec%.2f"},"rows":$rows,""" +
          s""""rows_per_sec":${(rows / sec).toLong},""" +
          s""""msgs_per_sec":${(msgs / sec).toLong}}"""
      }.mkString(",") + "}}"
    sys.env.get("SPARK_GRAFT_STREAM_OUT").foreach { p =>
      Files.write(Paths.get(p), json.getBytes); ()
    }
    println(json)
    spark.stop()
  }
}
