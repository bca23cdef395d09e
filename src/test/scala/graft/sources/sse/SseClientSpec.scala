package graft.sources.sse

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic (virtual-time) specs for the live SSE client: lifecycle
  * state transitions, retry-with-backoff schedule, rate limiting, health
  * checks, header construction, and the connection metrics surface — the
  * behaviors the reference exercises over a real network
  * (reference ServerSentEventClient.java), here driven through the
  * loopback transport with injected failures. */
class SseClientSpec extends AnyFunSuite {

  /** Virtual clock + sleep recorder: no real time passes in these tests. */
  private final class VirtualTime(start: Long = 1000000L) {
    var now: Long = start
    val sleeps = ArrayBuffer.empty[Long]
    def clock: () => Long = () => now
    def sleeper: Long => Unit = d => { sleeps += d; now += d }
  }

  private def config(
      initialMs: Long = 2000L, maxMs: Long = 30000L, maxAttempts: Int = -1,
      rps: Option[Double] = None, auth: Boolean = false,
      headers: Map[String, String] = Map.empty, compression: Boolean = true,
      idleTimeoutMs: Long = 60000L, checkIntervalMs: Long = 30000L,
      metricsIntervalMs: Long = 60000L): SseConfig =
    SseConfig(
      path = "mem", sseUri = None, topic = None,
      httpBasicAuth = auth,
      username = if (auth) Some("alice") else None,
      password = if (auth) Some("s3cret") else None,
      headers = headers, compressionEnabled = compression,
      rateLimitRequestsPerSecond = rps, rateLimitMaxConcurrent = None,
      retryBackoffInitialMs = initialMs, retryBackoffMaxMs = maxMs,
      retryMaxAttempts = maxAttempts, maxEventsPerTrigger = None,
      idleTimeoutMs = idleTimeoutMs, connectionCheckIntervalMs = checkIntervalMs,
      metricsLogIntervalMs = metricsIntervalMs)

  private def frame(event: String, id: Long, data: String): String =
    s"event: $event\nid: $id\ndata: $data\n\n"

  test("lifecycle: INITIALIZED → CONNECTING → CONNECTED on start, → DISCONNECTED on stop") {
    val ep = new LoopbackEndpoint
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    assert(c.connectionState == ConnectionState.Initialized)
    c.start()
    assert(c.connectionState == ConnectionState.Connected)
    c.stop()
    assert(c.connectionState == ConnectionState.Disconnected)
    assert(c.stateTransitions == Seq(
      ("INITIALIZED", "CONNECTING"), ("CONNECTING", "CONNECTED"),
      ("CONNECTED", "DISCONNECTED")))
    assert(c.getMetrics("connection.attempts") == 1L)
    assert(c.getMetrics("connection.successful") == 1L)
  }

  test("start failure: → FAILED, throws, and counts a failed connection") {
    val ep = new LoopbackEndpoint
    ep.scriptReject(new RuntimeException("connection refused"))
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    intercept[java.io.IOException](c.start())
    assert(c.connectionState == ConnectionState.Failed)
    assert(c.getMetrics("connection.failed") == 1L)
    assert(c.getMetrics("connection.hasError") == true)
  }

  test("request headers: basic auth, compression, default User-Agent, custom headers") {
    val ep = new LoopbackEndpoint
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep,
      config(auth = true, headers = Map("X-Api-Key" -> "k1")), vt.clock, vt.sleeper)
    c.start()
    val h = ep.seenHeaders.head
    // reference builds the exact same header set (:252-283)
    val expectedAuth = "Basic " + java.util.Base64.getEncoder
      .encodeToString("alice:s3cret".getBytes("UTF-8"))
    assert(h("Authorization") == expectedAuth)
    assert(h("Accept-Encoding") == "gzip, deflate")
    assert(h("User-Agent") == SseClient.DefaultUserAgent)
    assert(h("X-Api-Key") == "k1")
  }

  test("a custom User-Agent overrides the default (reference :270-283)") {
    val ep = new LoopbackEndpoint
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep,
      config(headers = Map("User-Agent" -> "custom/1.0")), vt.clock, vt.sleeper)
    c.start()
    assert(ep.seenHeaders.head("User-Agent") == "custom/1.0")
  }

  test("drop → reconnect: backoff sleep, resume from last-event-id, metrics") {
    val ep = new LoopbackEndpoint
    val s1 = ep.scriptAccept()
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    c.start()
    s1.push(frame("edit", 7, "x"))
    s1.pushEof()
    c.pumpOnce(0) // data
    c.pumpOnce(0) // EOF → FAILED
    assert(c.connectionState == ConnectionState.Failed)
    assert(c.getMetrics("connection.errors") == 1L)
    c.attemptReconnection()
    assert(c.connectionState == ConnectionState.Connected)
    assert(vt.sleeps == Seq(2000L)) // initial backoff
    assert(ep.seenLastEventIds == Seq(None, Some("7"))) // WHATWG resume id
    assert(c.getMetrics("connection.reconnections") == 1L)
  }

  test("backoff schedule doubles from initial to the cap (reference :646-654)") {
    val ep = new LoopbackEndpoint
    // the initial start() consumes one reject; the 7 retries see 6 more
    (1 to 7).foreach(_ => ep.scriptReject(new RuntimeException("down")))
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(initialMs = 2000, maxMs = 30000), vt.clock, vt.sleeper)
    intercept[java.io.IOException](c.start())
    (1 to 7).foreach(_ => c.attemptReconnection())
    assert(vt.sleeps == Seq(2000L, 4000L, 8000L, 16000L, 30000L, 30000L, 30000L))
    assert(c.connectionState == ConnectionState.Connected)
    // attempt counter resets on success: a future drop starts the schedule over
    assert(c.getMetrics("connection.reconnections") == 1L)
  }

  test("retry.max.attempts bounds reconnection attempts (reference :589-593)") {
    val ep = new LoopbackEndpoint
    (1 to 10).foreach(_ => ep.scriptReject(new RuntimeException("down")))
    val vt = new VirtualTime
    val c = new SseClient(ep, config(maxAttempts = 3), vt.clock, vt.sleeper)
    intercept[java.io.IOException](c.start())
    (1 to 5).foreach(_ => c.attemptReconnection())
    assert(vt.sleeps.size == 3, s"only 3 attempts may sleep+retry, got ${vt.sleeps}")
    assert(c.connectionState == ConnectionState.Failed)
    assert(ep.connectAttempts.get == 4) // initial + 3 retries, then gave up
  }

  test("circuit breaker trips OPEN at the failure threshold; open attempts are fail-fast no-ops") {
    val ep = new LoopbackEndpoint
    (1 to 3).foreach(_ => ep.scriptReject(new RuntimeException("down hard")))
    val vt = new VirtualTime
    val alerts = ArrayBuffer.empty[(String, String)]
    val c = new SseClient(ep,
      config().copy(circuitBreakerThreshold = Some(3), circuitBreakerOpenMs = 60000L),
      vt.clock, vt.sleeper, metricsSink = (k, v) => alerts += ((k, v)))
    assert(c.breakerState == "closed")
    intercept[java.io.IOException](c.start())
    (1 to 2).foreach(_ => c.attemptReconnection())
    assert(c.breakerState == "open")
    assert(alerts.exists { case (k, v) => k == "circuit.breaker" && v.startsWith("OPEN") },
      s"the trip must alert through the metrics sink, got $alerts")
    val (dials, sleeps) = (ep.connectAttempts.get, vt.sleeps.size)
    (1 to 5).foreach(_ => c.attemptReconnection())
    assert(ep.connectAttempts.get == dials, "an open breaker must not dial the endpoint")
    assert(vt.sleeps.size == sleeps, "an open breaker must not sleep — fail fast")
    assert(c.getMetrics("breaker.opens") == 1L)
    assert(c.getMetrics("breaker.state") == "open")
  }

  test("circuit breaker half-open probe: failure re-opens, success closes and resets") {
    val ep = new LoopbackEndpoint
    (1 to 4).foreach(_ => ep.scriptReject(new RuntimeException("down hard")))
    ep.scriptAccept()
    val vt = new VirtualTime
    val alerts = ArrayBuffer.empty[(String, String)]
    val c = new SseClient(ep,
      config().copy(circuitBreakerThreshold = Some(3), circuitBreakerOpenMs = 60000L),
      vt.clock, vt.sleeper, metricsSink = (k, v) => alerts += ((k, v)))
    intercept[java.io.IOException](c.start())
    (1 to 2).foreach(_ => c.attemptReconnection())
    assert(c.breakerState == "open")
    vt.now += 60000L // cool-down elapses → exactly one probe is allowed
    assert(c.breakerState == "half-open")
    c.attemptReconnection() // probe consumes the 4th reject → re-open
    assert(c.breakerState == "open")
    assert(c.getMetrics("breaker.opens") == 2L)
    vt.now += 60000L
    c.attemptReconnection() // probe succeeds → closed, counters reset
    assert(c.connectionState == ConnectionState.Connected)
    assert(c.breakerState == "closed")
    assert(c.getMetrics("breaker.consecutiveFailures") == 0)
    assert(alerts.exists { case (k, v) => k == "circuit.breaker" && v.startsWith("CLOSED") })
    // disabled by default: no threshold → the breaker never interferes
    assert(new SseClient(new LoopbackEndpoint, config(), vt.clock, vt.sleeper)
      .breakerState == "disabled")
  }

  test("open breaker: the background pump sleeps through the cool-down instead of spinning") {
    val ep = new LoopbackEndpoint
    ep.scriptReject(new RuntimeException("down hard"))
    ep.scriptAccept()
    val vt = new VirtualTime
    val sleeps = ArrayBuffer.empty[Long]
    val c = new SseClient(ep,
      config().copy(circuitBreakerThreshold = Some(1), circuitBreakerOpenMs = 60000L),
      vt.clock, d => sleeps.synchronized { sleeps += d; vt.now += d })
    // the pump hits the open breaker in its Failed branch: each loop must
    // SLEEP (virtually) min(pollMs, remaining cool-down), not fail fast —
    // fail-fast is for the synchronous API; in the loop it is a 100%-CPU
    // spin for the whole cool-down
    c.startBackground(pollMs = 25L)
    try {
      val deadline = System.currentTimeMillis + 15000
      while (c.connectionState != ConnectionState.Connected &&
        System.currentTimeMillis < deadline) Thread.sleep(5)
      assert(c.connectionState == ConnectionState.Connected,
        "half-open probe must reconnect once the cool-down elapses")
    } finally c.stopBackground()
    val pollSleeps = sleeps.synchronized(sleeps.filter(_ <= 25L))
    assert(pollSleeps.sum >= 59000L,
      s"the cool-down must pass in poll-sized sleeps, slept ${pollSleeps.sum} ms")
    assert(ep.connectAttempts.get == 2,
      "exactly the initial dial + the half-open probe — no hammering")
  }

  test("rate limiting spaces connection attempts (reference applyRateLimit :218-239)") {
    val ep = new LoopbackEndpoint
    ep.scriptAccept(); ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(rps = Some(2.0)), vt.clock, vt.sleeper)
    c.start() // first attempt: long-idle, no sleep
    assert(vt.sleeps.isEmpty)
    c.stop()
    c.start() // immediate second attempt: must wait out the 500ms interval
    assert(vt.sleeps == Seq(500L))
  }

  test("server-requested retry: overrides the first reconnect delay (WHATWG; reference :290-294)") {
    val ep = new LoopbackEndpoint
    val s1 = ep.scriptAccept()
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    c.start()
    s1.push("retry: 1234\nid: 5\ndata: x\n\n")
    s1.pushEof()
    c.pumpOnce(0); c.pumpOnce(0)
    c.attemptReconnection()
    assert(vt.sleeps == Seq(1234L))
    assert(c.connectionState == ConnectionState.Connected)
  }

  test("rate-limit (429) errors extend the backoff schedule (reference :632-636)") {
    val ep = new LoopbackEndpoint
    ep.scriptReject(new RuntimeException("server down"))
    ep.scriptReject(new RuntimeException("HTTP 429 Too Many Requests"))
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    intercept[java.io.IOException](c.start()) // plain failure → FAILED
    c.attemptReconnection() // attempt 1: sleeps 2000, hits the 429 → counter jumps to 3
    c.attemptReconnection() // next attempt is #4 → delay 2000·2^3 = 16000
    assert(vt.sleeps == Seq(2000L, 16000L))
    assert(c.connectionState == ConnectionState.Connected)
  }

  test("idle-timeout health check reconnects a stalled connection (reference :552-581)") {
    val ep = new LoopbackEndpoint
    ep.scriptAccept(); ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep,
      config(idleTimeoutMs = 60000, checkIntervalMs = 30000), vt.clock, vt.sleeper)
    c.start()
    assert(c.isConnectionHealthy)
    vt.now += 61000 // idle past the timeout
    assert(!c.isConnectionHealthy)
    c.poll() // periodic check fires → stall detected → reconnect with backoff
    assert(ep.connectAttempts.get == 2)
    assert(c.getMetrics("connection.reconnections") == 1L)
    assert(c.connectionState == ConnectionState.Connected)
  }

  test("event metrics: totals, bytes, per-type counters, queue high-water mark") {
    val ep = new LoopbackEndpoint
    val s = ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    c.start()
    s.push(frame("edit", 1, "aaaa") + frame("edit", 2, "bb") + frame("del", 3, "c"))
    c.pumpOnce(0)
    assert(c.getMetrics("events.total") == 3L)
    assert(c.getMetrics("events.bytes") == 7L) // 4 + 2 + 1 data chars
    assert(c.getMetrics("events.byType") == Map("edit" -> 2L, "del" -> 1L))
    assert(c.getMetrics("queue.maxSize") == 3L)
    val polled = c.poll()
    assert(polled.map(_.data) == Seq("aaaa", "bb", "c"))
    assert(c.getMetrics("queue.size") == 0)
    assert(c.getStatusSummary.contains("Events=3"))
  }

  test("rate.limit.max.concurrent caps simultaneous connections per endpoint") {
    val ep = new LoopbackEndpoint
    val vt = new VirtualTime
    val cfg = config().copy(rateLimitMaxConcurrent = Some(1))
    val a = new SseClient(ep, cfg, vt.clock, vt.sleeper)
    val b = new SseClient(ep, cfg, vt.clock, vt.sleeper)
    a.start()
    val e = intercept[java.io.IOException](b.start())
    assert(e.getCause.getMessage.contains("max concurrent connections"))
    assert(ep.connectAttempts.get == 1, "the capped attempt must not reach the endpoint")
    a.stop() // frees the slot
    b.start()
    assert(b.connectionState == ConnectionState.Connected)
    b.stop()
  }

  test("last-event-id persists across reconnects: id-less events inherit it (WHATWG; reference :538)") {
    val ep = new LoopbackEndpoint
    val s1 = ep.scriptAccept()
    val s2 = ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    c.start()
    s1.push("id: 42\ndata: a\n\n")
    s1.pushEof()
    c.pumpOnce(0); c.pumpOnce(0)
    c.attemptReconnection()
    s2.push("data: b\n\n") // no id: inherits 42 across the reconnect
    c.pumpOnce(0)
    val events = c.poll()
    assert(events.map(e => (e.id, e.data)) == Seq((Some("42"), "a"), (Some("42"), "b")))
  }

  test("periodic metrics logging: interval-gated at INFO while healthy (reference Task.java:84-92)") {
    val ep = new LoopbackEndpoint
    val s1 = ep.scriptAccept()
    val vt = new VirtualTime
    val logs = ArrayBuffer.empty[(String, String)]
    // idle timeout far above the metrics interval: the stream stays healthy
    val c = new SseClient(ep, config(idleTimeoutMs = 600000L, checkIntervalMs = 600000L,
      metricsIntervalMs = 60000L), vt.clock, vt.sleeper,
      metricsSink = (lvl, msg) => logs += ((lvl, msg)))
    c.start()
    s1.push(frame("edit", 1, "x"))
    c.pumpOnce(0)
    c.poll()
    assert(logs.isEmpty, "no log before the interval elapses")
    vt.now += 60001
    c.poll()
    assert(logs.map(_._1) == Seq("INFO"), "one INFO emission at the interval")
    assert(logs.head._2.contains("SSE Client Metrics") &&
      logs.head._2.contains("events.total"))
    c.poll() // interval not yet elapsed again: silent
    assert(logs.size == 1)
    vt.now += 60001
    c.poll()
    assert(logs.size == 2, "cadence continues on the next interval")
  }

  test("periodic metrics logging: WARN when the connection is degraded") {
    val ep = new LoopbackEndpoint
    val s1 = ep.scriptAccept()
    val vt = new VirtualTime
    val logs = ArrayBuffer.empty[(String, String)]
    // small idle timeout, huge check interval (no reconnect interference):
    // by the time the metrics interval fires the stream is idle-stalled
    val c = new SseClient(ep, config(idleTimeoutMs = 5000L, checkIntervalMs = 10000000L,
      metricsIntervalMs = 60000L), vt.clock, vt.sleeper,
      metricsSink = (lvl, msg) => logs += ((lvl, msg)))
    c.start()
    s1.push(frame("edit", 1, "x"))
    c.pumpOnce(0)
    vt.now += 60001 // idle 60s > 5s timeout → unhealthy
    c.poll()
    assert(logs.map(_._1) == Seq("WARN"), "degraded connection logs at WARN")
    assert(!c.isConnectionHealthy)
  }

  test("periodic metrics logging: racing threads emit exactly one line per interval") {
    val ep = new LoopbackEndpoint
    val s1 = ep.scriptAccept()
    val vt = new VirtualTime
    // the interval gate is a CAS on the last-log timestamp: the poll()
    // caller and the background pump can race it, and only one may win —
    // a plain check-then-set emitted duplicates for the same interval
    val emissions = new java.util.concurrent.atomic.AtomicInteger(0)
    val c = new SseClient(ep, config(idleTimeoutMs = 600000L, checkIntervalMs = 600000L,
      metricsIntervalMs = 60000L), vt.clock, vt.sleeper,
      metricsSink = (_, _) => emissions.incrementAndGet())
    c.start()
    s1.push(frame("edit", 1, "x"))
    c.pumpOnce(0)
    vt.now += 60001
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() => { barrier.await(); c.poll(); () })
      t.start(); t
    }
    threads.foreach(_.join())
    assert(emissions.get == 1, s"expected one emission, got ${emissions.get}")
    vt.now += 60001
    c.poll()
    assert(emissions.get == 2, "the NEXT interval still fires")
  }

  test("getMetric returns a single named metric (reference :805-813)") {
    val ep = new LoopbackEndpoint
    ep.scriptAccept()
    val vt = new VirtualTime
    val c = new SseClient(ep, config(), vt.clock, vt.sleeper)
    c.start()
    assert(c.getMetric("connection.state").contains("CONNECTED"))
    assert(c.getMetric("no.such.metric").isEmpty)
  }
}
