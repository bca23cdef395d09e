package graft.sources.sse

import java.io.{File, FileInputStream, OutputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.security.KeyStore
import java.util.concurrent.TimeUnit

import com.sun.net.httpserver.{HttpExchange, HttpsConfigurator, HttpsServer}
import javax.net.ssl.{KeyManagerFactory, SSLContext}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** On-the-wire specs for the Step-9 "advanced TLS/SSL configuration"
  * surface (reference IMPROVEMENT_PLAN.md:58-61): a real localhost HTTPS
  * server with a keytool-generated self-signed certificate — the canonical
  * private-CA / pinned-upstream deployment — exercised through
  * `https.truststore.*` and `https.insecure.skip.verify`. */
class HttpsTlsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = Files.createTempDirectory("graft-tls")
  private val ksPath = dir.resolve("server.p12").toString
  private val tsPath = dir.resolve("trust.p12").toString
  private val certPath = dir.resolve("server.cer").toString
  private val pass = "changeit"
  private var server: HttpsServer = _
  private def port: Int = server.getAddress.getPort

  private def keytool(args: String*): Unit = {
    val bin = new File(new File(System.getProperty("java.home"), "bin"), "keytool")
      .getAbsolutePath
    val p = new ProcessBuilder((bin +: args): _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    assert(p.waitFor(60, TimeUnit.SECONDS) && p.exitValue() == 0,
      s"keytool ${args.headOption.getOrElse("")} failed: $out")
  }

  override def beforeAll(): Unit = {
    // self-signed server identity with an IP SAN so the DEFAULT hostname
    // verifier passes for 127.0.0.1 (only trust is custom, not identity)
    keytool("-genkeypair", "-alias", "sse", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "2", "-storetype", "PKCS12", "-keystore", ksPath,
      "-storepass", pass, "-keypass", pass, "-dname", "CN=localhost",
      "-ext", "SAN=ip:127.0.0.1,dns:localhost")
    // export the cert into a separate trust-only store — the shape a real
    // client deployment ships (no private key on the consumer side)
    keytool("-exportcert", "-alias", "sse", "-keystore", ksPath,
      "-storepass", pass, "-file", certPath)
    keytool("-importcert", "-alias", "sse", "-noprompt", "-storetype", "PKCS12",
      "-keystore", tsPath, "-storepass", pass, "-file", certPath)

    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(ksPath)
    try ks.load(in, pass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    server = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(ctx))
    server.createContext("/events", (ex: HttpExchange) => {
      val body = "id: 1\ndata: over-tls\n\n".getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0)
      val os: OutputStream = ex.getResponseBody
      os.write(body); os.close()
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
    retryMaxAttempts = 0, maxEventsPerTrigger = None)

  private def drain(c: SseClient, until: Int, timeoutMs: Long = 10000): Seq[SseEvent] = {
    val out = ArrayBuffer.empty[SseEvent]
    val deadline = System.currentTimeMillis() + timeoutMs
    while (out.size < until && System.currentTimeMillis() < deadline) {
      c.pumpOnce(50)
      out ++= c.poll()
    }
    out.toSeq
  }

  private def uri = s"https://127.0.0.1:$port/events"

  test("https.truststore.*: the pinned self-signed upstream is trusted and streams") {
    val cfg = baseConfig(uri).copy(
      httpsTruststorePath = Some(tsPath), httpsTruststorePassword = Some(pass))
    val ep = new HttpSseEndpoint(uri, sslContext = cfg.sslContext)
    val c = new SseClient(ep, cfg, sleeper = _ => ())
    c.start()
    val events = drain(c, until = 1)
    c.stop()
    assert(events.map(_.data) == Seq("over-tls"))
    assert(events.map(_.id) == Seq(Some("1")))
  }

  test("JDK default trust: the self-signed upstream is rejected with a handshake failure") {
    val cfg = baseConfig(uri)
    val ep = new HttpSseEndpoint(uri, sslContext = cfg.sslContext)
    val c = new SseClient(ep, cfg, sleeper = _ => ())
    val e = intercept[java.io.IOException](c.start())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[javax.net.ssl.SSLHandshakeException]),
      s"expected an SSL handshake failure, got $e")
  }

  test("https.insecure.skip.verify connects with no truststore at all") {
    val cfg = baseConfig(uri).copy(httpsInsecureSkipVerify = true)
    val ep = new HttpSseEndpoint(uri, sslContext = cfg.sslContext,
      skipHostnameVerify = true)
    val c = new SseClient(ep, cfg, sleeper = _ => ())
    c.start()
    val events = drain(c, until = 1)
    c.stop()
    assert(events.map(_.data) == Seq("over-tls"))
  }

  test("truststore and skip-verify are contradictory instructions") {
    intercept[IllegalArgumentException] {
      baseConfig(uri).copy(httpsTruststorePath = Some(tsPath),
        httpsInsecureSkipVerify = true)
    }
    // options-map round trip
    val m = new java.util.HashMap[String, String]()
    m.put("path", "mem")
    m.put("https.truststore.path", tsPath)
    m.put("https.truststore.password", pass)
    val cfg = SseConfig.fromOptions(m)
    assert(cfg.sslContext.isDefined)
  }
}
