package graft.sources.sse

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** On-the-wire specs for the reference roadmap's Step-9 security surface
  * (OAuth support, proxy support — reference IMPROVEMENT_PLAN.md:58-61):
  * a real localhost token endpoint issues client-credentials tokens, a
  * real localhost proxy carries the stream, and every header is asserted
  * as the server saw it. */
class OAuth2ProxySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private def port: Int = server.getAddress.getPort
  private val tokenRequests = ArrayBuffer.empty[(Map[String, String], String)]
  private val streamAuth = ArrayBuffer.empty[Option[String]]
  private val proxiedUris = ArrayBuffer.empty[String]
  private val tokenSerial = new AtomicInteger(0)
  private val revokedBelow = new AtomicInteger(0)

  private def header(ex: HttpExchange, k: String): Option[String] =
    Option(ex.getRequestHeaders.getFirst(k))

  private def sse(ex: HttpExchange, body: String, code: Int = 200): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/event-stream")
    ex.sendResponseHeaders(code, 0)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes)
    os.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    // RFC 6749 §4.4 token endpoint: client-credentials POST → JSON token
    server.createContext("/token", (ex: HttpExchange) => {
      import scala.jdk.CollectionConverters._
      val hs = ex.getRequestHeaders.asScala.map {
        case (k, vs) => k -> vs.asScala.mkString(",")
      }.toMap
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      tokenRequests.synchronized { tokenRequests += ((hs, form)) }
      val body =
        s"""{"access_token":"tok-${tokenSerial.incrementAndGet()}","token_type":"Bearer","expires_in":3600}"""
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.getResponseBody.close()
    })

    // resource stream: 401 unless a Bearer token from /token is presented
    server.createContext("/oauth-events", (ex: HttpExchange) => {
      val auth = header(ex, "Authorization")
      streamAuth.synchronized { streamAuth += auth }
      if (auth.exists(_.startsWith("Bearer tok-")))
        sse(ex, "id: 1\ndata: secured\n\n")
      else sse(ex, "nope", code = 401)
    })

    // static-bearer stream
    server.createContext("/bearer-events", (ex: HttpExchange) => {
      streamAuth.synchronized { streamAuth += header(ex, "Authorization") }
      sse(ex, "id: 7\ndata: static\n\n")
    })

    // revocable resource stream: 401s any token whose serial is at or
    // below the revocation floor, even though its expires_in is far off
    server.createContext("/revoking-events", (ex: HttpExchange) => {
      val serial = header(ex, "Authorization")
        .filter(_.startsWith("Bearer tok-"))
        .flatMap(_.stripPrefix("Bearer tok-").toIntOption)
      if (serial.exists(_ > revokedBelow.get)) sse(ex, "id: 1\ndata: fresh\n\n")
      else sse(ex, "revoked", code = 401)
    })

    // HTTP proxy: a proxied GET arrives with an ABSOLUTE request-URI —
    // record it and serve the stream on the origin's behalf
    server.createContext("/", (ex: HttpExchange) => {
      proxiedUris.synchronized { proxiedUris += ex.getRequestURI.toString }
      sse(ex, "id: 5\ndata: via-proxy\n\n")
    })

    server.setExecutor(null)
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def baseConfig(uri: String): SseConfig = SseConfig(
    path = "mem", sseUri = Some(uri), topic = None,
    httpBasicAuth = false, username = None, password = None,
    headers = Map.empty, compressionEnabled = false,
    rateLimitRequestsPerSecond = None, rateLimitMaxConcurrent = None,
    retryBackoffInitialMs = 10L, retryBackoffMaxMs = 50L,
    retryMaxAttempts = -1, maxEventsPerTrigger = None)

  private def drain(c: SseClient, until: Int, timeoutMs: Long = 10000): Seq[SseEvent] = {
    val out = ArrayBuffer.empty[SseEvent]
    val deadline = System.currentTimeMillis() + timeoutMs
    while (out.size < until && System.currentTimeMillis() < deadline) {
      c.pumpOnce(50)
      if (c.connectionState == ConnectionState.Failed) c.attemptReconnection()
      out ++= c.poll()
    }
    out.toSeq
  }

  test("oauth2 client-credentials: token fetched per RFC 6749 §4.4 and spent as Bearer on the stream") {
    val uri = s"http://127.0.0.1:$port/oauth-events"
    val cfg = baseConfig(uri).copy(
      oauthTokenUrl = Some(s"http://127.0.0.1:$port/token"),
      oauthClientId = Some("cid"), oauthClientSecret = Some("csec"),
      oauthScope = Some("read stream"))
    val c = new SseClient(new HttpSseEndpoint(uri), cfg, sleeper = _ => ())
    c.start()
    val events = drain(c, until = 1)
    c.stop()
    assert(events.map(_.data) == Seq("secured"))
    // the token endpoint saw the §2.3.1 Basic client auth + the grant form
    val (hs, form) = tokenRequests.synchronized(tokenRequests.head)
    val basic = java.util.Base64.getEncoder
      .encodeToString("cid:csec".getBytes("UTF-8"))
    assert(hs.collectFirst {
      case (k, v) if k.equalsIgnoreCase("Authorization") => v
    }.contains(s"Basic $basic"))
    assert(form.contains("grant_type=client_credentials"))
    assert(form.contains("scope=read+stream"))
    // the stream request spent the issued token
    assert(streamAuth.synchronized(streamAuth.flatten
      .exists(_.startsWith("Bearer tok-"))))
  }

  test("oauth2 token is cached across reconnects — a drop must not re-hit the token endpoint") {
    val uri = s"http://127.0.0.1:$port/oauth-events"
    val cfg = baseConfig(uri).copy(
      oauthTokenUrl = Some(s"http://127.0.0.1:$port/token"),
      oauthClientId = Some("cid"), oauthClientSecret = Some("csec"))
    val c = new SseClient(new HttpSseEndpoint(uri), cfg, sleeper = _ => ())
    c.start()
    drain(c, until = 1)
    // server closed the stream (EOF) → reconnect reuses the cached token
    drain(c, until = 1)
    c.stop()
    assert(c.oauthProvider.get.fetchCount == 1L,
      "an unexpired token must be reused across reconnects")
  }

  test("a 401'd (revoked-before-expiry) oauth token is invalidated: reconnect fetches fresh") {
    val uri = s"http://127.0.0.1:$port/revoking-events"
    val cfg = baseConfig(uri).copy(
      oauthTokenUrl = Some(s"http://127.0.0.1:$port/token"),
      oauthClientId = Some("cid"), oauthClientSecret = Some("csec"))
    val c = new SseClient(new HttpSseEndpoint(uri), cfg, sleeper = _ => ())
    c.start()
    assert(drain(c, until = 1).map(_.data) == Seq("fresh"))
    assert(c.oauthProvider.get.fetchCount == 1L)
    // the auth server revokes every outstanding token mid-lifetime (long
    // before expires_in): the cached token now draws 401s — the client
    // must invalidate it on the 401, not resend it until the cache margin
    revokedBelow.set(tokenSerial.get)
    val again = drain(c, until = 1)
    c.stop()
    assert(again.map(_.data) == Seq("fresh"),
      "the reconnect must recover with a freshly-fetched token")
    assert(c.oauthProvider.get.fetchCount == 2L,
      "exactly one re-fetch: the 401 invalidates, the next attempt fetches")
  }

  test("http proxy: the stream GET traverses the proxy with an absolute request-URI") {
    // origin is a non-listening port — only the proxy route can serve it
    val origin = "http://127.0.0.1:9/proxied-events"
    val cfg = baseConfig(origin).copy(
      proxyHost = Some("127.0.0.1"), proxyPort = Some(port))
    val ep = new HttpSseEndpoint(origin, proxy = cfg.proxy)
    val c = new SseClient(ep, cfg, sleeper = _ => ())
    c.start()
    val events = drain(c, until = 1)
    c.stop()
    assert(events.map(_.data) == Seq("via-proxy"))
    assert(proxiedUris.synchronized(
      proxiedUris.exists(_.contains("127.0.0.1:9/proxied-events"))),
      s"proxy must see the absolute origin URI, saw $proxiedUris")
  }

  test("static bearer token rides the Authorization header") {
    val uri = s"http://127.0.0.1:$port/bearer-events"
    val cfg = baseConfig(uri).copy(bearerToken = Some("sekret"))
    val c = new SseClient(new HttpSseEndpoint(uri), cfg, sleeper = _ => ())
    c.start()
    val events = drain(c, until = 1)
    c.stop()
    assert(events.map(_.data) == Seq("static"))
    assert(streamAuth.synchronized(streamAuth.flatten.contains("Bearer sekret")))
  }

  test("config validation: auth schemes are mutually exclusive; proxy and oauth come whole") {
    intercept[IllegalArgumentException] {
      baseConfig("http://x/").copy(httpBasicAuth = true,
        username = Some("u"), password = Some("p"),
        bearerToken = Some("t"))
    }
    intercept[IllegalArgumentException] {
      baseConfig("http://x/").copy(oauthTokenUrl = Some("http://t/"))
    }
    intercept[IllegalArgumentException] {
      baseConfig("http://x/").copy(proxyHost = Some("h"))
    }
    intercept[IllegalArgumentException] {
      baseConfig("http://x/").copy(proxyHost = Some("h"), proxyPort = Some(0))
    }
    // options-map round trip carries the new keys
    val m = new java.util.HashMap[String, String]()
    m.put("path", "mem")
    m.put("sse.uri", "http://x/")
    m.put("http.auth.oauth2.token.url", "http://t/")
    m.put("http.auth.oauth2.client.id", "cid")
    m.put("http.auth.oauth2.client.secret", "cs")
    m.put("http.proxy.host", "h")
    m.put("http.proxy.port", "8080")
    val cfg = SseConfig.fromOptions(m)
    assert(cfg.oauthTokenUrl.contains("http://t/") && cfg.proxyPort.contains(8080))
    assert(cfg.proxy.isDefined)
  }
}
