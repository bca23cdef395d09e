package graft.sources.sse

import scala.collection.mutable

/** One parsed Server-Sent Event.
  *
  * Mirrors the reference record (reference ServerSentEvent.java:25-34):
  * `event` (required there, optional at the wire level), `id` (optional),
  * `data` (required). `retry` is the server-requested reconnection delay.
  */
case class SseEvent(event: Option[String], id: Option[String], data: String,
    retry: Option[Long] = None)

/** Incremental WHATWG EventSource stream parser.
  *
  * Implements the field grammar the reference consumes through jax-rs
  * `SseEventSource` (reference ServerSentEventClient.java): `event:` /
  * `data:` / `id:` / `retry:` fields, comment lines (leading ':'),
  * multi-line data joined with '\n', one leading space stripped after the
  * colon, CR / LF / CRLF line endings, blank-line dispatch, and last-event-id
  * persistence across events.
  *
  * Pure JVM logic — no Spark types — so the same parser drives both the
  * batch `sse_parse` semantics and the streaming source, and is testable
  * byte-for-byte.
  */
final class SseParser {
  private val dataBuf = new StringBuilder
  private var eventType: Option[String] = None
  private var lastId: Option[String] = None
  private var retryMs: Option[Long] = None
  private val lineBuf = new StringBuilder
  private var sawCr = false
  private var atStreamStart = true

  /** Feed a chunk of stream text; returns events completed by this chunk. */
  def feed(chunk: String): Seq[SseEvent] = {
    val out = mutable.ArrayBuffer.empty[SseEvent]
    var i = 0
    // WHATWG: one leading U+FEFF BOM is stripped from the stream
    if (atStreamStart && chunk.nonEmpty) {
      if (chunk.charAt(0) == '\uFEFF') i = 1
      atStreamStart = false
    }
    while (i < chunk.length) {
      val c = chunk.charAt(i)
      if (sawCr && c == '\n') { sawCr = false } // CRLF: LF already handled
      else {
        sawCr = c == '\r'
        if (c == '\n' || c == '\r') {
          processLine(lineBuf.toString, out)
          lineBuf.clear()
        } else lineBuf.append(c)
      }
      i += 1
    }
    out.toSeq
  }

  /** Signal end-of-stream. Per spec an unterminated final event block is NOT
    * dispatched; this just reports whether data was discarded. */
  def atEof: Boolean = lineBuf.isEmpty && dataBuf.isEmpty

  /** The WHATWG last-event-id buffer — persists across events (and, seeded
    * via [[seed]], across micro-batches and reconnects). */
  def lastEventId: Option[String] = lastId

  /** The server-requested reconnection delay (`retry:` field), if any —
    * honored by [[SseClient]] the way the reference's jax-rs source honors
    * it (reference ServerSentEventClient.java:290-294). */
  def serverRetryMs: Option[Long] = retryMs

  /** Seed parser state carried over from a previous batch of the same
    * stream, so an id-less frame at the start of a batch inherits the last
    * id-bearing frame's id (WHATWG last-event-id semantics across the
    * micro-batch boundary). */
  def seed(id: Option[String], retry: Option[Long]): this.type = {
    lastId = id; retryMs = retry; this
  }

  private def processLine(line: String, out: mutable.ArrayBuffer[SseEvent]): Unit = {
    if (line.isEmpty) { // dispatch
      if (dataBuf.nonEmpty) {
        // trailing newline from the last "data:" line is dropped per spec
        val data = if (dataBuf.last == '\n') dataBuf.substring(0, dataBuf.length - 1)
        else dataBuf.toString
        out += SseEvent(eventType, lastId, data, retryMs)
      }
      dataBuf.clear()
      eventType = None
    } else if (line.charAt(0) == ':') {
      // comment line — ignored
    } else {
      val colon = line.indexOf(':')
      val (field, value) =
        if (colon < 0) (line, "")
        else {
          val v = line.substring(colon + 1)
          (line.substring(0, colon), if (v.startsWith(" ")) v.substring(1) else v)
        }
      field match {
        case "event" => eventType = Some(value)
        case "data" => dataBuf.append(value).append('\n')
        case "id" => if (!value.contains('\u0000')) lastId = Some(value)
        case "retry" => if (value.nonEmpty && value.forall(_.isDigit)) retryMs = Some(value.toLong)
        case _ => // unknown field — ignored per spec
      }
    }
  }
}

object SseParser {
  /** Parse a complete SSE document (convenience for batch/test use). */
  def parseAll(text: String): Seq[SseEvent] = new SseParser().feed(text)

  /** Reference null-handling semantics applied on top of the wire event
    * (reference ServerSentEventsSourceTask.java:114-117): missing event
    * name → "unknown", missing data → "". */
  def normalize(e: SseEvent): (String, Option[String], String) =
    (e.event.getOrElse("unknown"), e.id, e.data)
}
