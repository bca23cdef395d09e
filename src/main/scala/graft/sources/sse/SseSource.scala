package graft.sources.sse

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("sse")` — a DataSource v2 source with the semantics of the
  * reference connector (cjmatta/kafka-connect-sse), re-expressed as a
  * Structured Streaming micro-batch source.
  *
  * Transport: an append-only SSE frame-log file (the HTTP endpoint of the
  * reference, with the network replaced by a file seam for this zero-egress
  * environment). Offsets are byte positions in the log, always aligned to
  * frame boundaries (the blank line that dispatches an event), so:
  *  - a batch [start, end) parses to exactly the events dispatched in it;
  *  - restart-from-checkpoint resumes mid-stream with no loss or dup —
  *    the Spark-native upgrade of the reference's last-event-id resume;
  *  - `maxEventsPerTrigger` bounds admission per micro-batch (the
  *    reference's rate limiting, applied at the batch boundary).
  *
  * At scale the frame log is a partitioned topic (one log per partition);
  * this source models one partition — the unit the reference's single
  * connector task handles.
  */
class SseDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sse"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SseTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SseTable(SseConfig.fromOptions(properties))
}

object SseTable {
  /** The reference record schema (reference ServerSentEvent.java:29-34):
    * event required, id optional, data required. */
  val Schema: StructType = StructType(Seq(
    StructField("event", StringType, nullable = false),
    StructField("id", StringType, nullable = true),
    StructField("data", StringType, nullable = false)))
}

class SseTable(config: SseConfig) extends Table with SupportsRead {
  override def name(): String = s"sse(${config.path})"
  override def schema(): StructType = SseTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SseScan(config)
    }
}

class SseScan(config: SseConfig) extends Scan {
  override def readSchema(): StructType = SseTable.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SseMicroBatchStream(config)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SseFrameLog.listLogs(config.path)
        .map(f => SseInputPartition(f, 0L, new java.io.File(f).length()))
        .toArray
    override def createReaderFactory(): PartitionReaderFactory = SseReaderFactory
  }
}

/** Frame-aligned byte offset per log file. `path` may be one file or a
  * directory of logs (one per upstream partition); each file advances
  * independently, so a batch is planned as one input partition per log and
  * scales with the number of logs. */
case class SseOffset(positions: Map[String, Long]) extends Offset {
  override def json(): String = SseOffset.toJson(positions)
}

object SseOffset {
  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  def toJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
  /** Minimal parser for the flat {"path":pos,...} shape written above. */
  def fromJson(s: String): SseOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) return SseOffset(Map.empty)
    val entries = scala.collection.mutable.Map.empty[String, Long]
    var i = 0
    while (i < body.length) {
      assert(body.charAt(i) == '"', s"bad offset json: $s")
      val key = new StringBuilder
      i += 1
      while (body.charAt(i) != '"') {
        if (body.charAt(i) == '\\') i += 1
        key.append(body.charAt(i)); i += 1
      }
      i += 2 // closing quote + colon
      val num = new StringBuilder
      while (i < body.length && body.charAt(i) != ',') { num.append(body.charAt(i)); i += 1 }
      i += 1 // comma
      entries(key.toString) = num.toString.toLong
    }
    SseOffset(entries.toMap)
  }
}

class SseMicroBatchStream(config: SseConfig)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  /** End-of-data snapshot for Trigger.AvailableNow (frame-aligned). */
  @volatile private var availableNowEnd: Option[Map[String, Long]] = None

  override def initialOffset(): Offset = SseOffset(Map.empty)
  override def deserializeOffset(json: String): Offset = SseOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    config.maxEventsPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  private def scanAll(from: Map[String, Long], capPerLog: Long): Map[String, Long] =
    SseFrameLog.listLogs(config.path)
      .map(f => f -> SseFrameLog.boundaryAfter(f, from.getOrElse(f, 0L), capPerLog))
      .toMap

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(scanAll(Map.empty, Long.MaxValue))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  /** Admission control: each log advances to the frame boundary after at
    * most `maxRows` dispatched events past its own offset (and never past
    * the AvailableNow snapshot). New logs appearing mid-stream are picked
    * up at position 0. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SseOffset].positions
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => Long.MaxValue
    }
    val scanned = scanAll(from, cap)
    SseOffset(availableNowEnd.fold(scanned) { snap =>
      scanned.map { case (f, p) => f -> math.min(p, snap.getOrElse(f, 0L)) }
    })
  }

  override def reportLatestOffset(): Offset = SseOffset(scanAll(Map.empty, Long.MaxValue))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SseOffset].positions
    val to = end.asInstanceOf[SseOffset].positions
    to.toSeq.sortBy(_._1).flatMap { case (f, endPos) =>
      val startPos = from.getOrElse(f, 0L)
      if (endPos > startPos) Some(SseInputPartition(f, startPos, endPos)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = SseReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SseInputPartition(path: String, start: Long, end: Long) extends InputPartition

object SseReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SseInputPartition]
    new PartitionReader[InternalRow] {
      private val events = SseParser.parseAll(SseFrameLog.read(p.path, p.start, p.end)).iterator
      private var current: SseEvent = _
      override def next(): Boolean = { val has = events.hasNext; if (has) current = events.next(); has }
      override def get(): InternalRow = {
        // reference null-handling (ServerSentEventsSourceTask.java:114-117)
        val (ev, id, data) = SseParser.normalize(current)
        InternalRow(UTF8String.fromString(ev),
          id.map(UTF8String.fromString).orNull, UTF8String.fromString(data))
      }
      override def close(): Unit = ()
    }
  }
}

/** Byte-level access to the append-only frame log. */
object SseFrameLog {

  /** The log files behind a source path: the file itself, or every regular
    * file in a directory (sorted for deterministic planning). */
  def listLogs(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory) {
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).map(_.getPath).sorted.toSeq
    } else if (f.exists()) Seq(path)
    else Seq.empty
  }

  /** Read [start, end) as UTF-8 text. Boundaries are always at newline
    * bytes (frame-aligned), so slices are valid UTF-8. */
  def read(path: String, start: Long, end: Long): String = {
    if (end <= start) return ""
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = math.min(end, raf.length()) - start
      if (len <= 0) return ""
      val buf = new Array[Byte](len.toInt)
      raf.seek(start)
      raf.readFully(buf)
      new String(buf, StandardCharsets.UTF_8)
    } finally raf.close()
  }

  /** Scan forward from `start`, returning the byte position just after the
    * blank line terminating the `maxEvents`-th dispatched frame (a frame
    * counts if its block contains a `data` line), or after the last complete
    * frame in the file if fewer are available. Never splits a frame. */
  def boundaryAfter(path: String, start: Long, maxEvents: Long): Long = {
    val f = new java.io.File(path)
    if (!f.exists()) return start
    val text = read(path, start, f.length())
    var events = 0L
    var lineStart = 0
    var blockHasData = false
    var boundary = 0 // chars consumed up to last complete frame end
    var i = 0
    // walk lines; CRLF/CR/LF all end lines
    while (i <= text.length && events < maxEvents) {
      val atEnd = i == text.length
      val c = if (atEnd) '\n' else text.charAt(i)
      if (!atEnd && c != '\n' && c != '\r') { i += 1 }
      else {
        val line = text.substring(lineStart, i)
        // consume the terminator (CRLF counts as one)
        var nextI = i + 1
        if (!atEnd && c == '\r' && nextI < text.length && text.charAt(nextI) == '\n') nextI += 1
        if (line.isEmpty && !atEnd) { // blank line → frame boundary
          if (blockHasData) events += 1
          blockHasData = false
          boundary = nextI
        } else if (line.startsWith("data:") || line == "data") {
          blockHasData = true
        }
        if (atEnd) i = text.length + 1 else { i = nextI; lineStart = nextI }
      }
    }
    start + text.substring(0, boundary).getBytes(StandardCharsets.UTF_8).length
  }
}
