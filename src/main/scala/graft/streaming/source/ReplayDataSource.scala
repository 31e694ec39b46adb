package graft.streaming.source

import java.nio.file.{Files, Path, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSourceV2 micro-batch replay source — the reference's websocket
  * client slot (base.py:26) implemented as a first-class Spark source
  * instead of a file-source wrapper.
  *
  * Replays JSONL message files under `path` (lexical file order, line
  * order within a file) and — unlike the plain file source — enforces
  * the reference's COUNT-BASED batching (§2.1 #15, `batch_size=1000`,
  * config.json:10): each micro-batch admits at most `batchSize`
  * messages, so sink flush cadence matches the reference's buffer
  * semantics. Offsets are global line numbers; a restart resumes from
  * the checkpointed line.
  *
  * Emits the engine-wide raw contract: `value: string` (raw JSON),
  * `local_timestamp: long` (arrival ms — `arrivalMs` option pins it
  * for deterministic replay, otherwise wall clock per batch planning).
  *
  * A live websocket version of this source implements the same
  * MicroBatchStream surface with a driver-side receive buffer in
  * place of the file cursor; nothing downstream changes.
  */
class ReplayDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayDataSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object ReplayDataSource {
  val schema: StructType = new StructType()
    .add("value", StringType)
    .add("local_timestamp", LongType)

  /** Sorted message files under a path (file or directory). */
  def listFiles(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val st = Files.list(p) // close, or the dir fd leaks per enumeration
      try st.iterator().asScala.toSeq
        .filter(Files.isRegularFile(_)).map(_.toString).sorted
      finally st.close()
    } else Seq(path)
  }
}

private[source] class ReplayTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"replay(${props.getOrElse("path", "?")})"
  override def schema(): StructType = ReplayDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ReplayScan(
      options.get("path"),
      Option(options.get("batchSize")).map(_.toInt).getOrElse(1000),
      Option(options.get("arrivalMs")).map(_.toLong))
}

private[source] class ReplayScan(
    path: String, batchSize: Int, arrivalMs: Option[Long]) extends Scan {
  override def readSchema(): StructType = ReplayDataSource.schema
  override def description(): String = s"ReplayScan($path, batchSize=$batchSize)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ReplayMicroBatchStream(path, batchSize, arrivalMs)
}

/** Offset = number of lines already admitted (global across the
  * sorted file list). */
case class LineOffset(line: Long) extends Offset {
  override def json(): String = line.toString
}

/** Stateless micro-batch stream: count-based admission is expressed
  * through [[SupportsAdmissionControl]] — Spark hands the start offset
  * to `latestOffset(start, limit)`, so the source carries NO cursor
  * state and restart recovery is trivially correct. (A stateful
  * `latestOffset()` cursor is subtly wrong: on restart Spark calls it
  * on the fresh instance before replaying checkpointed offsets, and
  * it would admit from zero — observed as duplicated output before
  * this design.) */
private[source] class ReplayMicroBatchStream(
    path: String, batchSize: Int, arrivalMs: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {

  private lazy val files: Seq[String] = ReplayDataSource.listFiles(path)
  private lazy val counts: Seq[Long] = files.map { f =>
    val st = Files.lines(Paths.get(f))
    try st.count() finally st.close()
  }
  private lazy val total: Long = counts.sum

  override def initialOffset(): Offset = LineOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LineOffset].line
    // honor the engine's limit: Trigger.Once/AvailableNow pass
    // ReadAllAvailable — ignoring it would silently record only one
    // batchSize chunk and terminate
    val cap = limit match {
      case _: ReadAllAvailable => total
      case m: ReadMaxRows => s + m.maxRows()
      case _ => s + batchSize
    }
    LineOffset(math.min(cap, total)) // §2.1 #15 count admission
  }

  override def reportLatestOffset(): Offset = LineOffset(total)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")

  override def deserializeOffset(json: String): Offset =
    LineOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].line
    val e = end.asInstanceOf[LineOffset].line
    if (s >= e) Array.empty
    else Array(ReplayPartition(files, counts, s, e,
      arrivalMs.getOrElse(System.currentTimeMillis())))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One ordered partition per micro-batch: replay is an ordered tape,
  * and order is what the book-sync contiguity contract consumes.
  * (A live multi-symbol source would partition by stream instead.)
  * Carries per-file line counts so the reader seeks with Long offsets
  * (no Int truncation) and opens only the files its range touches. */
case class ReplayPartition(
    files: Seq[String], counts: Seq[Long], start: Long, end: Long,
    localTs: Long) extends InputPartition

private[source] class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayPartition]
    new PartitionReader[InternalRow] {
      // map the global [start, end) range onto (file, localStart,
      // localEnd) slices, skipping files entirely outside the range —
      // streams lines instead of materializing every preceding file
      private val slices: Iterator[(String, Long, Long)] = {
        val cum = p.counts.scanLeft(0L)(_ + _) // file f spans [cum(f), cum(f+1))
        p.files.indices.iterator.flatMap { f =>
          val (lo, hi) = (cum(f), cum(f + 1))
          val s = math.max(p.start, lo)
          val e = math.min(p.end, hi)
          if (s < e) Some((p.files(f), s - lo, e - lo)) else None
        }
      }
      private var fileIt: Iterator[String] = Iterator.empty
      private var current: String = _
      private var open: java.util.stream.Stream[String] = _

      private def advanceFile(): Boolean = {
        if (open != null) { open.close(); open = null }
        if (!slices.hasNext) return false
        val (file, s, e) = slices.next()
        open = Files.lines(Paths.get(file))
        fileIt = open.iterator().asScala.slice(
          // per-file offsets are bounded by the file's line count, so
          // the Int narrowing here cannot truncate real values unless
          // a single file exceeds 2^31 lines (split tapes before that)
          math.toIntExact(s), math.toIntExact(e))
        true
      }

      override def next(): Boolean = {
        while (!fileIt.hasNext) if (!advanceFile()) return false
        current = fileIt.next()
        true
      }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current), p.localTs)
      override def close(): Unit = if (open != null) open.close()
    }
  }
}

/** EventSource adapter for [[ReplayDataSource]] (drop-in for
  * FileReplaySource, but with real count-based micro-batching). */
final class Dsv2ReplaySource(
    fixtureRoot: String,
    batchSize: Int = 1000,
    fixedArrivalMs: Option[Long] = None) extends graft.streaming.EventSource {
  override def stream(
      spark: org.apache.spark.sql.SparkSession,
      id: graft.streaming.EventId): org.apache.spark.sql.DataFrame = {
    val reader = spark.readStream
      .format(classOf[ReplayDataSource].getName)
      .option("path", s"$fixtureRoot/${id.symbol}.${id.market}.${id.eventType}")
      .option("batchSize", batchSize.toString)
    fixedArrivalMs.foreach(ts => reader.option("arrivalMs", ts.toString))
    reader.load()
  }
}
