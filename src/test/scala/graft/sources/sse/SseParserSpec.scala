package graft.sources.sse

import org.scalatest.funsuite.AnyFunSuite

/** WHATWG EventSource golden cases for the SSE wire parser. */
class SseParserSpec extends AnyFunSuite {

  test("basic event with event/id/data fields") {
    val events = SseParser.parseAll("event: edit\nid: 42\ndata: {\"x\":1}\n\n")
    assert(events == Seq(SseEvent(Some("edit"), Some("42"), "{\"x\":1}")))
  }

  test("multi-line data joins with newline, trailing newline dropped") {
    val events = SseParser.parseAll("data: line1\ndata: line2\n\n")
    assert(events.map(_.data) == Seq("line1\nline2"))
  }

  test("comment lines and unknown fields are ignored") {
    val events = SseParser.parseAll(": heartbeat\nfoo: bar\ndata: x\n\n")
    assert(events == Seq(SseEvent(None, None, "x")))
  }

  test("blocks without data dispatch nothing") {
    assert(SseParser.parseAll("event: ping\n\n: keepalive\n\n").isEmpty)
  }

  test("space after colon is optional; only one space stripped") {
    val events = SseParser.parseAll("data:one\n\ndata:  two\n\n")
    assert(events.map(_.data) == Seq("one", " two"))
  }

  test("field with no colon is a field with empty value") {
    val events = SseParser.parseAll("data\n\n")
    assert(events.map(_.data) == Seq(""))
  }

  test("last-event-id persists across events until overwritten") {
    val events = SseParser.parseAll("id: 1\ndata: a\n\ndata: b\n\nid: 2\ndata: c\n\n")
    assert(events.map(_.id) == Seq(Some("1"), Some("1"), Some("2")))
  }

  test("retry field parses digits and persists") {
    val events = SseParser.parseAll("retry: 3000\ndata: a\n\nretry: x5\ndata: b\n\n")
    assert(events.map(_.retry) == Seq(Some(3000L), Some(3000L)))
  }

  test("CR, LF and CRLF line endings all work") {
    val lf = SseParser.parseAll("event: e\ndata: d\n\n")
    val crlf = SseParser.parseAll("event: e\r\ndata: d\r\n\r\n")
    val cr = SseParser.parseAll("event: e\rdata: d\r\r")
    assert(lf == crlf && crlf == cr)
  }

  test("incremental feed across arbitrary chunk boundaries") {
    val text = "event: edit\nid: 7\ndata: hello\n\nevent: del\ndata: bye\n\n"
    for (cut <- 1 until text.length) {
      val p = new SseParser
      val events = p.feed(text.substring(0, cut)) ++ p.feed(text.substring(cut))
      assert(events == SseParser.parseAll(text), s"chunk boundary at $cut")
    }
  }

  test("unterminated trailing block is not dispatched") {
    assert(SseParser.parseAll("data: incomplete").isEmpty)
  }

  test("normalize applies reference null-handling") {
    assert(SseParser.normalize(SseEvent(None, None, "d")) == (("unknown", None, "d")))
    assert(SseParser.normalize(SseEvent(Some("e"), Some("1"), "")) == (("e", Some("1"), "")))
  }

  test("a leading BOM is stripped; a mid-stream U+FEFF is data (WHATWG)") {
    assert(SseParser.parseAll("﻿data: x\n\n").map(_.data) == Seq("x"))
    // only the FIRST character of the stream; later BOMs are content
    assert(SseParser.parseAll("data: a﻿b\n\n").map(_.data) == Seq("a﻿b"))
    // BOM alone at chunk 1, fields in chunk 2 (incremental path)
    val p = new SseParser
    assert(p.feed("﻿").isEmpty)
    assert(p.feed("data: y\n\n").map(_.data) == Seq("y"))
  }
}

/** Reference retry/backoff policy (defaults 2000→30000 ms, unlimited). */
class BackoffSpec extends AnyFunSuite {
  test("delay doubles from initial and caps at max") {
    val b = Backoff(2000, 30000, -1)
    assert((0 to 6).map(b.delayMs) == Seq(2000, 4000, 8000, 16000, 30000, 30000, 30000))
  }
  test("no overflow at absurd attempt counts") {
    assert(Backoff(2000, 30000, -1).delayMs(200) == 30000)
  }
  test("maxAttempts=-1 retries forever; bounded count stops") {
    assert(Backoff(1, 2, -1).shouldRetry(1000000))
    val b = Backoff(1, 2, 3)
    assert(b.shouldRetry(2) && !b.shouldRetry(3))
  }
}

class SseConfigSpec extends AnyFunSuite {
  import scala.jdk.CollectionConverters._
  test("defaults match the reference connector") {
    val c = SseConfig.fromOptions(Map("path" -> "/tmp/x").asJava)
    assert(c.retryBackoffInitialMs == 2000 && c.retryBackoffMaxMs == 30000 &&
      c.retryMaxAttempts == -1 && c.compressionEnabled && !c.httpBasicAuth)
  }
  test("http.header.* options collect into the header map") {
    val c = SseConfig.fromOptions(Map("path" -> "/tmp/x",
      "http.header.User-Agent" -> "graft/1.0", "http.header.X-K" -> "v").asJava)
    assert(c.headers == Map("user-agent" -> "graft/1.0", "x-k" -> "v"))
  }
  test("basic auth requires credentials") {
    assertThrows[IllegalArgumentException] {
      SseConfig.fromOptions(Map("path" -> "/tmp/x", "http.basic.auth" -> "true").asJava)
    }
  }
  test("metrics.log.interval.ms parses and must be positive") {
    val c = SseConfig.fromOptions(
      Map("path" -> "/tmp/x", "metrics.log.interval.ms" -> "5000").asJava)
    assert(c.metricsLogIntervalMs == 5000L)
    assert(SseConfig.fromOptions(Map("path" -> "/tmp/x").asJava)
      .metricsLogIntervalMs == SseConfig.DefaultMetricsLogIntervalMs)
    assertThrows[IllegalArgumentException] {
      SseConfig.fromOptions(
        Map("path" -> "/tmp/x", "metrics.log.interval.ms" -> "0").asJava)
    }
  }
  test("missing path rejected") {
    assertThrows[IllegalArgumentException] {
      SseConfig.fromOptions(Map[String, String]().asJava)
    }
  }
  test("transport validation: unknown transport and live-without-endpoint rejected") {
    assertThrows[IllegalArgumentException] {
      SseConfig.fromOptions(Map("path" -> "/tmp/x", "transport" -> "carrier-pigeon").asJava)
    }
    assertThrows[IllegalArgumentException] {
      SseConfig.fromOptions(Map("path" -> "/tmp/x", "transport" -> "live").asJava)
    }
    // live with sse.uri alone is valid (HTTP endpoint)
    val c = SseConfig.fromOptions(Map("path" -> "/tmp/x", "transport" -> "live",
      "sse.uri" -> "http://h/stream").asJava)
    assert(c.transport == "live" && c.sseUri.contains("http://h/stream"))
  }
  test("health-check options parse with reference defaults") {
    val c = SseConfig.fromOptions(Map("path" -> "/tmp/x").asJava)
    assert(c.idleTimeoutMs == 60000L && c.connectionCheckIntervalMs == 30000L)
    assertThrows[IllegalArgumentException] {
      SseConfig.fromOptions(Map("path" -> "/tmp/x", "idle.timeout.ms" -> "0").asJava)
    }
  }
}
