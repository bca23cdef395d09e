package graft.sources.sse

import java.io.IOException
import java.net.{HttpURLConnection, Proxy, URI, URLEncoder}
import java.nio.charset.StandardCharsets

/** OAuth2 client-credentials token source for the SSE transport — the
  * reference roadmap's "Add OAuth support" (reference
  * IMPROVEMENT_PLAN.md Phase 3 Step 9), re-expressed on the JDK with no
  * extra dependencies.
  *
  * Implements the RFC 6749 §4.4 grant: a form-encoded POST
  * (`grant_type=client_credentials` plus optional `scope`) to the token
  * endpoint, client authenticated with HTTP Basic per §2.3.1, response a
  * JSON object carrying `access_token` and (optionally) `expires_in`.
  * Only that response subset is consumed, via two anchored regexes — a
  * deliberate dependency-free parse of the only two fields the flow
  * needs.
  *
  * The token is cached until `expires_in` minus a 30 s refresh margin
  * (tokens without `expires_in` default to one hour per common provider
  * behavior), so a reconnect storm does not hammer the token endpoint;
  * [[invalidate]] forces the next [[token]] call to re-fetch (the
  * client's 401 handling hook). Token fetches traverse the same
  * `http.proxy.*` as the event stream. Thread-safe. */
final class OAuth2TokenProvider(
    tokenUrl: String,
    clientId: String,
    clientSecret: String,
    scope: Option[String] = None,
    proxy: Option[Proxy] = None,
    sslContext: Option[javax.net.ssl.SSLContext] = None,
    skipHostnameVerify: Boolean = false,
    clock: () => Long = () => System.currentTimeMillis(),
    connectTimeoutMs: Int = 10000) {

  private val RefreshMarginMs = 30000L
  private val DefaultExpirySec = 3600L

  @volatile private var cachedToken: String = _
  @volatile private var expiresAtMs: Long = 0L
  @volatile private var fetches: Long = 0L

  /** A currently-valid access token, fetching or refreshing if needed. */
  def token(): String = synchronized {
    if (cachedToken == null || clock() >= expiresAtMs - RefreshMarginMs) fetch()
    cachedToken
  }

  /** Drop the cached token so the next [[token]] call re-fetches — call
    * on a 401 from the resource server. */
  def invalidate(): Unit = synchronized { cachedToken = null }

  /** Token-endpoint round trips so far (observability + spec hook). */
  def fetchCount: Long = fetches

  private def fetch(): Unit = {
    val conn = URI.create(tokenUrl).toURL
      .openConnection(proxy.getOrElse(Proxy.NO_PROXY))
      .asInstanceOf[HttpURLConnection]
    conn match {
      case h: javax.net.ssl.HttpsURLConnection =>
        sslContext.foreach(c => h.setSSLSocketFactory(c.getSocketFactory))
        // mirror HttpSseEndpoint: under the skip-verify kill-switch the
        // token endpoint must bypass hostname verification too, or a
        // self-signed cert without a matching SAN streams events but
        // fails the token fetch — inconsistent for the same switch
        if (skipHostnameVerify) h.setHostnameVerifier((_, _) => true)
      case _ => ()
    }
    conn.setRequestMethod("POST")
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(connectTimeoutMs)
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.setRequestProperty("Accept", "application/json")
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
    conn.setRequestProperty("Authorization", s"Basic $basic")
    val form = "grant_type=client_credentials" +
      scope.map(s => "&scope=" + URLEncoder.encode(s, "UTF-8")).getOrElse("")
    val os = conn.getOutputStream
    try os.write(form.getBytes(StandardCharsets.UTF_8)) finally os.close()
    val code = conn.getResponseCode
    val body =
      try {
        val s = if (code == 200) conn.getInputStream else conn.getErrorStream
        if (s == null) "" else try new String(s.readAllBytes(), StandardCharsets.UTF_8)
          finally s.close()
      } finally conn.disconnect()
    if (code != 200)
      throw new IOException(s"OAuth2 token endpoint HTTP $code: ${body.take(200)}")
    val tok = OAuth2TokenProvider.TokenRe.findFirstMatchIn(body)
      .map(_.group(1))
      .getOrElse(throw new IOException(
        s"OAuth2 token response carries no access_token: ${body.take(200)}"))
    val ttlSec = OAuth2TokenProvider.ExpiresRe.findFirstMatchIn(body)
      .map(_.group(1).toLong).getOrElse(DefaultExpirySec)
    cachedToken = tok
    expiresAtMs = clock() + ttlSec * 1000L
    fetches += 1
  }
}

object OAuth2TokenProvider {
  private val TokenRe = """"access_token"\s*:\s*"([^"]+)"""".r
  private val ExpiresRe = """"expires_in"\s*:\s*(\d+)""".r
}
