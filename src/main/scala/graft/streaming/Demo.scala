package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Minimal consumer of the streaming engine: replays wire-format
  * fixtures (FIXTURES.md §2) for one trade stream and one depth
  * stream — the reference's config.json shape — and prints the
  * resulting CSVs. `run-main graft.streaming.Demo [workDir]`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString))
    val fixtures = work.resolve("fixtures")
    val out = work.resolve("out")

    def fixture(stream: String, lines: Seq[String]): Unit = {
      val dir = fixtures.resolve(stream)
      Files.createDirectories(dir)
      Files.write(dir.resolve("messages.jsonl"), lines.asJava)
    }
    fixture("bnbusdt.spot.trade", Seq(
      """{"result":null,"id":1}""",
      """{"e":"trade","E":1727784000123,"s":"BNBUSDT","t":88123001,"p":"571.10000000","q":"0.25600000","T":1727784000120,"m":false,"M":true}""",
      """{"e":"trade","E":1727784000456,"s":"BNBUSDT","t":88123002,"p":"571.20000000","q":"1.00000000","T":1727784000450,"m":true,"M":true}"""))
    fixture("bnbusdt.spot.depth", Seq(
      """{"e":"depthUpdate","E":1727784000100,"s":"BNBUSDT","U":150,"u":155,"b":[["570.00000000","9.00000000"]],"a":[]}""",
      """{"e":"depthUpdate","E":1727784000200,"s":"BNBUSDT","U":156,"u":159,"b":[["571.00000000","1.50000000"],["570.90000000","0.00000000"]],"a":[["571.10000000","2.00000000"]]}""",
      """{"e":"depthUpdate","E":1727784000300,"s":"BNBUSDT","U":160,"u":163,"b":[],"a":[["571.20000000","3.00000000"]]}"""))

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val snapshot = BookSnapshot(158,
      bids = Seq(Seq("570.90000000", "3.10000000"), Seq("570.80000000", "5.00000000")),
      asks = Seq(Seq("571.00000000", "1.20000000")))
    // DSv2 micro-batch source with count-based admission (batchSize=2
    // forces multiple micro-batches, exercising the checkpointed
    // line-offset path); swap in FileReplaySource for the file-source
    // variant.
    val src = new graft.streaming.source.Dsv2ReplaySource(fixtures.toString,
      batchSize = 2, fixedArrivalMs = Some(1727784001000L))
    val queries = Runner.start(spark,
      StreamConfig(
        Seq("binance.spot.bnbusdt.trade", "binance.spot.bnbusdt.depth"),
        out.toString),
      src,
      snapshots = Map("bnbusdt.spot" -> snapshot),
      checkpointRoot = work.resolve("ckpt").toString)
    queries.foreach(_._1.processAllAvailable())
    Runner.stopAll(queries.map(_._1))

    Seq("bnbusdt.spot.trades.csv", "bnbusdt.spot.depth.csv").foreach { f =>
      println(s"=== $f ===")
      Files.readAllLines(out.resolve(f)).forEach(println)
    }
    queries.foreach { case (q, sink) =>
      println(s"${q.name}: batches_saved=${sink.batchesSaved}")
    }

    // consumer query: reconstruct the book from the recorded CSV
    val depthCsv = spark.read.option("header", "true")
      .csv(out.resolve("bnbusdt.spot.depth.csv").toString)
      .selectExpr("cast(timestamp as long) timestamp",
        "cast(local_timestamp as long) local_timestamp",
        "side", "price", "quantity", "cast(is_snapshot as boolean) is_snapshot")
    println("=== book state at t=1727784002000 ===")
    graft.book.OrderBook.stateAt(depthCsv, 1727784002000L)
      .orderBy(org.apache.spark.sql.functions.col("side"),
        org.apache.spark.sql.functions.col("price_d").desc)
      .show(20, truncate = false)
    println("=== top of book ===")
    graft.book.OrderBook.topOfBook(
      graft.book.OrderBook.stateAt(depthCsv, 1727784002000L)).show()
    spark.stop()
  }
}
