package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

/** Logging-config parity (reference `library/logger.py:22-52` +
  * `config.json:17-27`): per-destination enable flags and levels must
  * gate exactly like the reference's console/file handlers, and the
  * wiring must hold from a real JSON config fixture through the SAME
  * reader main() uses. */
class LogSpec extends SparkSpec {

  private def logger(cfg: Log.Config) = {
    val con = ArrayBuffer[String]()
    val file = ArrayBuffer[String]()
    (Log.testLogger("graft.test", cfg, con += _, file += _), con, file)
  }

  test("handlers filter at their own levels (logger itself wide open)") {
    // console WARNING, file DEBUG — logger.py:13's logger.setLevel(DEBUG)
    // means a message below console's level still reaches the file.
    val (log, con, file) = logger(Log.Config(
      consoleEnabled = true, consoleLevel = "WARNING",
      fileEnabled = true, fileLevel = "DEBUG"))
    log.debug("d"); log.info("i"); log.warning("w"); log.error("e")
    assert(con.size == 2, s"console must see WARNING+: $con")
    assert(file.size == 4, s"file must see DEBUG+: $file")
  }

  test("disabled destinations receive nothing") {
    val (log, con, file) = logger(Log.Config(
      consoleEnabled = false, fileEnabled = false))
    log.critical("boom")
    assert(con.isEmpty && file.isEmpty)
  }

  test("format parity: colored console line, plain file line") {
    val (log, con, file) = logger(Log.Config(
      consoleEnabled = true, consoleLevel = "INFO",
      fileEnabled = true, fileLevel = "INFO"))
    log.info("synced")
    // colorlog: green INFO, reset suffix; asctime - name - level - msg
    assert(con.head == "\u001b[32m1970-01-01 00:00:00 - graft.test - INFO - synced\u001b[0m",
      s"got: ${con.head}")
    assert(file.head == "1970-01-01 00:00:00 - graft.test - INFO - synced")
  }

  test("level wiring from a config.json fixture via main()'s reader") {
    // the reference's shipped logging block, with file enabled and a
    // non-default level to prove values flow (config.json:17-27)
    val fixture = Files.createTempFile("graft-log", ".json")
    Files.writeString(fixture,
      """{"events": [],
        | "logging": {
        |   "console": {"enabled": false, "level": "ERROR"},
        |   "file": {"enabled": true, "level": "WARNING",
        |            "file_path": "/tmp/etl-test.log"}}}""".stripMargin)
    val row = spark.read.option("multiLine", "true")
      .json(fixture.toString).head()
    val cfg = Log.configFrom(Main.configReader(row)(_, _))
    assert(cfg == Log.Config(
      consoleEnabled = false, consoleLevel = "ERROR",
      fileEnabled = true, fileLevel = "WARNING",
      filePath = "/tmp/etl-test.log"))
    // and a config with NO logging block falls back to the reference's
    // defaults (console INFO on, file off)
    val bare = Files.createTempFile("graft-log-bare", ".json")
    Files.writeString(bare, """{"events": []}""")
    val bareRow = spark.read.option("multiLine", "true")
      .json(bare.toString).head()
    assert(Log.configFrom(Main.configReader(bareRow)(_, _)) == Log.Config())
  }

  test("unknown level names fail fast") {
    intercept[IllegalArgumentException] {
      Log.Config(consoleLevel = "LOUD")
    }
  }
}
