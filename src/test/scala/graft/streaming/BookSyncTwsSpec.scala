package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec

import scala.jdk.CollectionConverters._

/** transformWithState book sync behaves identically to the
  * flatMapGroupsWithState operator on the same replay (s05 parity on
  * the successor state API). */
class BookSyncTwsSpec extends SparkSpec {

  private def tmp(p: String): Path = Files.createTempDirectory(p)

  test("tws sync emits snapshot-then-deltas like the fmgws operator") {
    val fixtures = tmp("twsfix")
    val dir = fixtures.resolve("bnbusdt.spot.depth")
    Files.createDirectories(dir)
    Files.write(dir.resolve("m.jsonl"), Seq(
      """{"e":"depthUpdate","E":1727784000100,"s":"BNBUSDT","U":150,"u":155,"b":[["570.00000000","9.00000000"]],"a":[]}""",
      """{"e":"depthUpdate","E":1727784000200,"s":"BNBUSDT","U":156,"u":159,"b":[["571.00000000","1.50000000"]],"a":[["571.10000000","2.00000000"]]}""",
      """{"e":"depthUpdate","E":1727784000300,"s":"BNBUSDT","U":160,"u":163,"b":[],"a":[["571.20000000","3.00000000"]]}"""
    ).asJava)
    val snapshot = BookSnapshot(158,
      bids = Seq(Seq("570.90000000", "3.10000000")),
      asks = Seq(Seq("571.00000000", "1.20000000")))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val source = new FileReplaySource(fixtures.toString,
      fixedArrivalMs = Some(1727784001000L))
    val raw = source.stream(spark, EventId.parse("binance.spot.bnbusdt.depth"))
    val q = BookSynchronizerTws(
      Pipelines.depthRecords(raw), "spot", "bnbusdt", snapshot)
      .writeStream.format("memory").queryName("tws_out")
      .option("checkpointLocation", tmp("ckpt").toString)
      .start()
    try { q.processAllAvailable() } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rows = spark.table("tws_out")
      .select("first_update_id", "last_update_id", "is_snapshot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // snapshot first, bridge twice (reference double-save), post-sync once;
    // stale [150,155] dropped
    assert(rows.toSeq == Seq(
      (158L, 158L, true), (156L, 159L, false), (156L, 159L, false),
      (160L, 163L, false)))
  }
}
