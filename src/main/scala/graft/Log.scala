package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** The reference's logging-config surface (`config.json:17-27` +
  * `binance_etl/library/logger.py:22-52`): two independently-enabled
  * destinations — a COLORED console handler and a plain file handler —
  * each filtering at its own configured level while the logger itself
  * stays wide open (logger.py:13 sets the logger to DEBUG; levels
  * gate at the HANDLERS). Format parity: console
  * `<color>%(asctime)s - %(name)s - %(levelname)s - %(message)s<reset>`
  * with `%Y-%m-%d %H:%M:%S` timestamps and the reference's five
  * colorlog colors (logger.py:27-37); file = the same line uncolored
  * (logger.py:47-49).
  *
  * This logger serves the repo's own pipeline messages (stream
  * lifecycle, sync progress — the reference's use) and deliberately
  * does NOT touch Spark's log4j configuration: engine logging and
  * pipeline logging are separate concerns, and rewiring log4j from
  * config.json would couple the two.
  */
object Log {

  /** Python `logging` level numbers (logger.py resolves names via
    * logging.getLevelNamesMapping()). */
  val Levels: Map[String, Int] = Map(
    "DEBUG" -> 10, "INFO" -> 20, "WARNING" -> 30,
    "ERROR" -> 40, "CRITICAL" -> 50)

  /** The reference's colorlog palette (logger.py:30-36). */
  private val Colors = Map(
    "DEBUG" -> "\u001b[37m", // white
    "INFO" -> "\u001b[32m", // green
    "WARNING" -> "\u001b[33m", // yellow
    "ERROR" -> "\u001b[31m", // red
    "CRITICAL" -> "\u001b[1;31m") // bold red
  private val Reset = "\u001b[0m"

  /** Parsed `logging` block — defaults mirror the reference's shipped
    * config.json (console INFO on, file INFO off, binance_etl.log). */
  final case class Config(
      consoleEnabled: Boolean = true,
      consoleLevel: String = "INFO",
      fileEnabled: Boolean = false,
      fileLevel: String = "INFO",
      filePath: String = "binance_etl.log") {
    require(Levels.contains(consoleLevel), s"unknown level $consoleLevel")
    require(Levels.contains(fileLevel), s"unknown level $fileLevel")
  }

  private val TsFmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** One named logger. Sinks are injectable for tests; production
    * defaults write to stdout and append to `cfg.filePath`. */
  final class Logger private[Log] (
      name: String,
      cfg: Config,
      consoleSink: String => Unit,
      fileSink: String => Unit,
      clock: () => Long) {

    private def fmt(level: String, msg: String): String =
      s"${TsFmt.format(java.time.Instant.ofEpochMilli(clock()))} - $name - $level - $msg"

    private def log(level: String, msg: String): Unit = {
      val n = Levels(level)
      if (cfg.consoleEnabled && n >= Levels(cfg.consoleLevel))
        consoleSink(Colors(level) + fmt(level, msg) + Reset)
      if (cfg.fileEnabled && n >= Levels(cfg.fileLevel))
        fileSink(fmt(level, msg))
    }

    def debug(msg: String): Unit = log("DEBUG", msg)
    def info(msg: String): Unit = log("INFO", msg)
    def warning(msg: String): Unit = log("WARNING", msg)
    def error(msg: String): Unit = log("ERROR", msg)
    def critical(msg: String): Unit = log("CRITICAL", msg)
  }

  /** Production factory: console → stdout, file → append (created on
    * first write, like FileHandler). */
  def getLogger(name: String, cfg: Config): Logger =
    new Logger(name, cfg,
      consoleSink = Console.out.println(_),
      fileSink = line => {
        val p = Paths.get(cfg.filePath)
        Files.write(p, (line + System.lineSeparator).getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      },
      clock = () => System.currentTimeMillis())

  /** Builds a Config from a dotted-path config lookup (Main's reader
    * or a test fixture's) — ONE home for the key names and defaults,
    * mirroring the reference's config.json logging block exactly. */
  def configFrom(str: (String, String) => String): Config = Config(
    consoleEnabled = str("logging.console.enabled", "true").toBoolean,
    consoleLevel = str("logging.console.level", "INFO").toUpperCase,
    fileEnabled = str("logging.file.enabled", "false").toBoolean,
    fileLevel = str("logging.file.level", "INFO").toUpperCase,
    filePath = str("logging.file.file_path", "binance_etl.log"))

  /** Test factory with injected sinks/clock. */
  private[graft] def testLogger(
      name: String, cfg: Config,
      consoleSink: String => Unit, fileSink: String => Unit,
      nowMs: () => Long = () => 0L): Logger =
    new Logger(name, cfg, consoleSink, fileSink, nowMs)
}
