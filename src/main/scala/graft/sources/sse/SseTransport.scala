package graft.sources.sse

import java.util.concurrent.{ConcurrentLinkedQueue, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

/** Connection lifecycle states, mirroring the reference client
  * (reference ServerSentEventClient.java:50-56). */
sealed abstract class ConnectionState(val name: String)
object ConnectionState {
  case object Initialized extends ConnectionState("INITIALIZED")
  case object Connecting extends ConnectionState("CONNECTING")
  case object Connected extends ConnectionState("CONNECTED")
  case object Disconnected extends ConnectionState("DISCONNECTED")
  case object Failed extends ConnectionState("FAILED")
}

/** One read from a live SSE connection. */
sealed trait SseChunk
object SseChunk {
  /** Raw stream text (may be a partial frame — the parser is incremental). */
  final case class Data(text: String) extends SseChunk
  /** Nothing arrived within the poll window; connection still open. */
  case object Idle extends SseChunk
  /** Upstream closed the stream (connection drop). */
  case object Eof extends SseChunk
}

/** An open SSE stream. */
trait SseConnection {
  def read(timeoutMs: Long): SseChunk
  def close(): Unit
}

/** The transport seam behind [[SseClient]]: anything that can open an SSE
  * stream given resume state and request headers. The reference's analogue
  * is the jax-rs `SseEventSource` + HTTP stack (reference
  * ServerSentEventClient.java:198-213, 247-316); here the in-process
  * [[LoopbackEndpoint]] stands in for the network in this zero-egress
  * environment, and an HTTP implementation drops in behind the same trait.
  */
trait SseEndpoint {
  /** Open the stream. `lastEventId` carries the WHATWG Last-Event-ID resume
    * position; `headers` carries auth / compression / custom headers.
    * Throws on connection failure. */
  def connect(lastEventId: Option[String], headers: Map[String, String]): SseConnection
}

/** Process-wide endpoint registry so DSv2 options (plain strings) can
  * reference in-process endpoints: option `endpoint.ref=key` resolves via
  * [[SseEndpoints.lookup]]. Local/loopback scope — a networked deployment
  * registers its HTTP endpoint implementation here at session setup. */
object SseEndpoints {
  private val refs = TrieMap.empty[String, SseEndpoint]
  def register(key: String, ep: SseEndpoint): Unit = refs.put(key, ep)
  def lookup(key: String): SseEndpoint = refs.getOrElse(key,
    throw new IllegalArgumentException(s"no SseEndpoint registered under '$key'"))
}

/** In-process loopback endpoint with scriptable failure injection: each
  * connection attempt consumes the next scripted behavior (reject with an
  * error, or accept with a pushable session); unscripted attempts accept an
  * empty session. Records every attempt's Last-Event-ID and headers so specs
  * can assert resume and auth behavior. This is the transport that makes the
  * client's retry / backoff / lifecycle / health machinery executable
  * without a network. */
final class LoopbackEndpoint extends SseEndpoint {
  private sealed trait Behavior
  private final case class Reject(error: () => Throwable) extends Behavior
  private final case class Accept(session: LoopbackSession) extends Behavior

  private val script = new ConcurrentLinkedQueue[Behavior]
  val connectAttempts = new AtomicInteger(0)
  @volatile var seenLastEventIds: List[Option[String]] = Nil
  @volatile var seenHeaders: List[Map[String, String]] = Nil

  /** Next connection attempt fails with `e`. */
  def scriptReject(e: => Throwable): Unit = script.add(Reject(() => e))

  /** Next connection attempt succeeds with the returned pushable session. */
  def scriptAccept(): LoopbackSession = {
    val s = new LoopbackSession
    script.add(Accept(s))
    s
  }

  override def connect(lastEventId: Option[String],
      headers: Map[String, String]): SseConnection = synchronized {
    connectAttempts.incrementAndGet()
    seenLastEventIds = seenLastEventIds :+ lastEventId
    seenHeaders = seenHeaders :+ headers
    Option(script.poll()).getOrElse(Accept(new LoopbackSession)) match {
      case Reject(e) => throw e()
      case Accept(s) => s
    }
  }
}

/** A scripted live stream: the producing side pushes text chunks and an
  * optional EOF; the client reads them with a bounded wait. */
final class LoopbackSession extends SseConnection {
  private sealed trait Item
  private final case class Text(s: String) extends Item
  private case object End extends Item

  private val q = new LinkedBlockingQueue[Item]()
  @volatile private var closed = false

  def push(text: String): Unit = q.add(Text(text))
  def pushEof(): Unit = q.add(End)
  def isClosed: Boolean = closed

  override def read(timeoutMs: Long): SseChunk =
    q.poll(timeoutMs, TimeUnit.MILLISECONDS) match {
      case null => SseChunk.Idle
      case Text(s) => SseChunk.Data(s)
      case End => SseChunk.Eof
    }
  override def close(): Unit = closed = true
}
