package graft.sources.sse

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the pure SSE/stream kernels (ScalaCheck,
  * runs under `sbt test`). */
object SseParserProps extends Properties("SseParser") {

  private val nameGen: Gen[String] = Gen.alphaNumStr.suchThat(_.nonEmpty)
  private val idGen: Gen[Option[String]] =
    Gen.option(Gen.alphaNumStr.suchThat(s => s.nonEmpty))
  // data may be multi-line (LF only); CR is a line terminator on the wire
  private val dataGen: Gen[String] =
    Gen.listOf(Gen.alphaNumStr).map(_.mkString("\n"))

  private val eventGen: Gen[(String, Option[String], String)] =
    for { n <- nameGen; i <- idGen; d <- dataGen } yield (n, i, d)

  private def serialize(evs: List[(String, Option[String], String)]): String =
    evs.map { case (n, i, d) =>
      s"event: $n\n" +
        i.map(v => s"id: $v\n").getOrElse("") +
        d.split("\n", -1).map(l => s"data: $l\n").mkString +
        "\n"
    }.mkString

  /** Expected parse: ids persist across events (last-event-id semantics). */
  private def expected(evs: List[(String, Option[String], String)]): List[SseEvent] =
    evs.foldLeft((List.empty[SseEvent], Option.empty[String])) {
      case ((acc, lastId), (n, i, d)) =>
        val id = i.orElse(lastId)
        (acc :+ SseEvent(Some(n), id, d), id)
    }._1

  property("serialize → parse roundtrips with id persistence") =
    forAll(Gen.listOf(eventGen)) { evs =>
      SseParser.parseAll(serialize(evs)) == expected(evs)
    }

  property("parsing is chunk-boundary invariant") =
    forAll(Gen.nonEmptyListOf(eventGen), Gen.chooseNum(0, 1000)) { (evs, seed) =>
      val text = serialize(evs)
      val cut = seed % math.max(text.length, 1)
      val p = new SseParser
      val out = p.feed(text.substring(0, cut)) ++ p.feed(text.substring(cut))
      Prop(out == SseParser.parseAll(text)) :| s"cut=$cut"
    }
}

object SseScanProps extends Properties("SseFrameLog.scan") {
  import java.nio.charset.StandardCharsets
  import java.nio.file.Files

  private val nameGen: Gen[String] = Gen.alphaNumStr.suchThat(_.nonEmpty)
  private val fieldLine: Gen[String] = Gen.oneOf(
    nameGen.map(n => s"event: $n"),
    Gen.alphaNumStr.map(i => s"id: $i"),
    Gen.alphaNumStr.map(d => s"data: $d"),
    Gen.chooseNum(1, 99999).map(r => s"retry: $r"),
    Gen.alphaNumStr.map(c => s": $c"), // comment
    Gen.alphaNumStr.map(x => s"unknownfield: $x"))
  private val frameGen: Gen[String] =
    Gen.nonEmptyListOf(fieldLine).map(_.mkString("", "\n", "\n\n"))

  /** The offset scanner and the incremental parser implement the WHATWG
    * field grammar twice (byte walk vs incremental feed). This property
    * pins them together: for any frame stream and any admission cap, the
    * scan's carried id/retry must equal the parser state after feeding
    * exactly the scanned region. */
  property("cursor state equals parser state at every admission boundary") =
    forAll(Gen.nonEmptyListOf(frameGen), Gen.chooseNum(0L, 20L)) { (frames, cap) =>
      val text = frames.mkString
      val f = Files.createTempFile("scanprop", ".sselog")
      try {
        Files.write(f, text.getBytes(StandardCharsets.UTF_8))
        val r = SseFrameLog.scan(f.toString, 0L, math.max(cap, 1L))
        val region = new String(
          java.util.Arrays.copyOfRange(
            Files.readAllBytes(f), 0, r.boundary.toInt),
          StandardCharsets.UTF_8)
        val p = new SseParser
        val events = p.feed(region)
        val capOk = events.size <= math.max(cap, 1L)
        Prop(p.lastEventId == r.lastId && p.serverRetryMs == r.retryMs && capOk) :|
          s"scan=(${r.lastId},${r.retryMs}) parser=(${p.lastEventId},${p.serverRetryMs}) events=${events.size}"
      } finally Files.deleteIfExists(f)
    }
}

object RollingHashProps extends Properties("RollingHash") {
  import graft.functions.RollingHash

  private def model(s: String): Long = {
    val cps = s.codePoints().toArray
    cps.foldLeft(BigInt(0))((acc, cp) => (acc * RollingHash.B + cp) mod BigInt(RollingHash.P)).toLong
  }

  property("matches the BigInt fold model (incl. unicode)") =
    forAll { (s: String) => RollingHash.compute(s) == model(s) }

  property("stays in [0, P)") =
    forAll { (s: String) =>
      val h = RollingHash.compute(s)
      h >= 0 && h < RollingHash.P
    }
}

object BackoffProps extends Properties("Backoff") {
  private val cfg: Gen[Backoff] = for {
    init <- Gen.chooseNum(1L, 10000L)
    max <- Gen.chooseNum(init, 100000L)
    attempts <- Gen.chooseNum(-1, 50)
  } yield Backoff(init, max, attempts)

  property("delays are nondecreasing and within [initial, max]") =
    forAll(cfg, Gen.chooseNum(0, 100)) { (b, n) =>
      val delays = (0 to n).map(b.delayMs)
      delays.zip(delays.tail).forall { case (a, c) => a <= c } &&
        delays.forall(d => d >= math.min(b.initialMs, b.maxMs) && d <= b.maxMs)
    }

  property("negative maxAttempts retries forever; bounded stops exactly") =
    forAll(cfg, Gen.chooseNum(0, 1000)) { (b, attempt) =>
      if (b.maxAttempts < 0) b.shouldRetry(attempt)
      else b.shouldRetry(attempt) == (attempt < b.maxAttempts)
    }
}
