package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A timestamped event on the stream (the SSE record after JSON decode). */
case class StreamEvent(user_id: Long, event_type: String, value: Double, ts: Timestamp)

/** Closed session emitted by the stateful sessionizer. */
case class Session(user_id: Long, n_events: Long, sum_value: Double,
    session_start: Timestamp, session_end: Timestamp)

private case class SessionState(n: Long, sum: Double, start: Long, last: Long)

/** A doc after the stateless funnel stages, carrying its dedup keys. */
case class StagedDoc(doc_id: Long, source: String, stage0: String,
    digest: String, sig: Seq[Long])

/** A doc fanned out to an LSH band (band = −1 is the verdict row). */
case class BandRow(doc_id: Long, source: String, stage: String,
    band: Int, bkey: String, sig: Seq[Long])

/** The full funnel's output: per-doc verdict rows (band = −1) plus
  * `neardup` flag rows per flagged band. */
case class FunnelRow(doc_id: Long, source: String, stage: String, band: Int)

private case class BandClaim(doc_id: Long, sig: Seq[Long])

/** Structured Streaming transforms over the SSE event stream — the
  * streaming-native form of the batch operators in graft.operators.Events.
  * The reference connector only forwards events; these are the stateful
  * upgrades Spark provides on top: watermarked windows, session state,
  * exactly-once dedup.
  *
  * All state is keyed and watermark-bounded, so state-store size is
  * O(active keys), not O(stream length) — the property that keeps these
  * runnable forever on an unbounded 100 TB/day stream.
  */
object StreamOps {

  /** Full-µs event time: `getTime` carries milliseconds only, `getNanos`
    * the sub-second fraction — every keyed twin that orders or argmins on
    * event time MUST use this, because its batch counterpart orders on the
    * true microsecond timestamp (a `getTime`-only sort flips same-ms pairs
    * whose id order differs from µs order). */
  private[graft] def usOf(ts: Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  /** Inverse of [[usOf]]: rebuild a full-precision Timestamp from epoch
    * microseconds (floorDiv/floorMod so pre-1970 instants round the same
    * way `usOf` truncated them). */
  private[graft] def tsOfUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Windowed counts per event type with a watermark: late events beyond
    * `lateness` are dropped and window state is reclaimed. `slide` defaults
    * to the window size (tumbling); a smaller slide gives the OVERLAPPING
    * form — the same native epoch-aligned window generator the batch
    * `ev_sliding_counts` runs, so batch and stream agree window-for-window
    * (slide parity spec). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      lateness: String = "1 hour", slide: String = null): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_,
        if (slide == null) window_ else slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when `gapSec` passes with no event (event-time, watermark-driven).
    * Emits closed sessions (append mode).
    *
    * The gap compares FLOOR-SECOND timestamps — exactly the batch
    * `ev_sessionize` rule (`unix_timestamp(ts) − unix_timestamp(prev) >
    * gapSec`), not raw milliseconds: a raw-ms gap closes a session the
    * batch window would merge whenever the sub-second parts straddle the
    * boundary (e.g. X.1 → X+gap.9 is gap·1000+800 ms but a floor-sec diff
    * of exactly gap). State carries full-µs instants ([[usOf]]) so the
    * emitted boundaries keep their precision; the eviction timer arms at
    * the LAST instant any event could still merge under the floor-sec
    * rule, (⌊last⌋ + gap + 1) s. */
  def sessionize(events: Dataset[StreamEvent], gapSec: Long = 1800L,
      lateness: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.n, s.sum, tsOfUs(s.start), tsOfUs(s.last)))
          } else {
            val events = it.toSeq.sortBy(e => usOf(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            events.foreach { e =>
              val t = usOf(e.ts)
              cur match {
                case Some(s) if Math.floorDiv(t, 1000000L) -
                    Math.floorDiv(s.last, 1000000L) <= gapSec =>
                  cur = Some(SessionState(s.n + 1, s.sum + e.value, s.start, math.max(s.last, t)))
                case Some(s) => // gap exceeded: close previous, open new
                  closed ::= Session(userId, s.n, s.sum, tsOfUs(s.start), tsOfUs(s.last))
                  cur = Some(SessionState(1L, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1L, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                (Math.floorDiv(s.last, 1000000L) + gapSec + 1L) * 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Gap sessionization via Spark's NATIVE `session_window` aggregate —
    * the declarative twin of [[sessionize]], but with one boundary
    * divergence: native windows are half-open `[ts, ts+gap)`, so an event
    * arriving EXACTLY `gap` after the previous one starts a new session,
    * whereas [[sessionize]]'s fold merges it (`t - last <= gap`). Here the
    * engine owns the merging-session state (sessions that touch within the
    * gap merge inside the state store; a closed window emits once the
    * watermark passes its end). Prefer this form when per-session output
    * is aggregate-only — it keeps the whole pipeline in Catalyst; the
    * fMGWS form remains for custom per-event session logic. Window start =
    * first event, end = LAST EVENT + GAP (the standard session-window
    * convention — subtract the gap to recover the last event time). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming decontamination: probe each incoming document's shingles
    * against the Bloom filter a BATCH pass built
    * ([[graft.operators.Dedup.bloomFilterWords]]) — the ship-the-model
    * handoff: the filter words are embedded in the plan as a literal
    * array, so the stream side is a STATELESS projection (no join, no
    * state store, no watermark; append-mode trivially). This is how a
    * 100 TB ingest keeps eval contamination out in-flight: the filter is
    * m/62 longs however big the corpora are, and re-publishing a new
    * filter is a plan swap, not a stateful migration. Emits the same
    * (n_shingles, n_flagged) accounting as the batch
    * `docs_decontaminate_bloom`, so the two are parity-checkable. */
  def decontaminateStream(docs: DataFrame, filterWords: Seq[Long],
      mBits: Int = 65536): DataFrame = {
    import graft.functions.Kernels.{bloomContains, shingles3, tokens}
    docs
      .select(col("doc_id"), array_distinct(shingles3(tokens(col("text")))).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        size(filter(col("sh"), s => bloomContains(s, filterWords, mBits))).as("n_flagged"))
  }

  /** Streaming k-means/IVF cell assignment — the "ship the model to the
    * stream" step for the vector family: a BATCH pass trains/publishes the
    * coarse-quantizer codebook
    * ([[graft.operators.Similarity.centroidMatrixLocal]], \|cells\|×dims
    * doubles), and each incoming embedding is assigned to its nearest
    * centroid by the SAME codegen'd rounded-cosine argmax kernel the batch
    * `ivfAssignments` uses ([[graft.functions.Kernels.nearestCell]]) over
    * the codebook embedded as a plan LITERAL. STATELESS — no join, no
    * state store, no watermark; append-mode trivially. At 100 TB/day this
    * is how fresh vectors join the IVF index in-flight: assignment rides
    * the ingest map stage, and publishing a re-trained codebook is a plan
    * swap, not a stateful migration (the [[decontaminateStream]] pattern
    * applied to embeddings). Parity: spec pins cell-for-cell agreement
    * with the batch assignment on the same vectors. */
  def assignCellsStream(vecs: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    import graft.functions.Kernels.nearestCell
    vecs.select(col("vec_id"),
      nearestCell(col("e").cast("array<double>"), typedLit(cents)).as("cell"))
  }

  /** Streaming typed-schema projection of the SSE payload — the reference's
    * actual consumption pattern on its flagship stream: deserialize `data`
    * against the published schema (reference
    * config/wikimedia.recentchange.schema.json) into a typed record the
    * moment it leaves the wire. Takes the DSv2 SSE source's
    * (event, id, data) frame schema (graft.sources.sse.SseTable.Schema)
    * and projects `data` through `from_json` with the SAME explicit
    * StructType the batch `sse_project` row uses
    * ([[graft.operators.Events.payloadSchema]]), so batch and stream parse
    * against one contract. STATELESS (no state store, no watermark;
    * append-mode trivially): at 100 TB/day the parse rides the ingest
    * map stage and the typed columns flow straight into any downstream
    * watermarked aggregate. */
  def projectPayload(frames: DataFrame): DataFrame =
    frames
      .select(col("event"), col("id"),
        from_json(col("data"), graft.operators.Events.payloadSchema).as("rec"))
      .select(col("event"), col("id"),
        col("rec.meta.stream").as("stream"),
        col("rec.meta.dt").as("dt"),
        col("rec.type").as("type"),
        col("rec.title").as("title"),
        col("rec.namespace").as("namespace"),
        col("rec.bot").as("bot"),
        (col("rec.length.new") - col("rec.length.old")).as("delta"))

  /** Exactly-once dedup by event id within the watermark horizon — the
    * streaming form of log-compaction/upsert. */
  def dedupById(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicates("event_id", "ts")

  /** Streaming anomaly detection: per-type running mean/variance (Welford's
    * online update — numerically stable, O(1) per event) held in keyed
    * state; an event whose |z| vs the stats accumulated BEFORE it exceeds
    * `zThreshold` (after a `minN` warm-up) is emitted immediately. The
    * streaming form of the batch `ev_anomalies` profile: state is O(#event
    * types) — constant — so this runs forever on an unbounded stream. */
  def anomalies(events: Dataset[StreamEvent], minN: Long = 30,
      zThreshold: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeStats, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[TypeStats]) =>
          var s = state.getOption.getOrElse(TypeStats(0L, 0.0, 0.0))
          val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
          it.toSeq.sortBy(e => (usOf(e.ts), e.user_id, e.value)).foreach { e =>
            if (s.n >= minN) {
              val sd = math.sqrt(s.m2 / (s.n - 1).toDouble)
              if (sd > 0) {
                val z = (e.value - s.mean) / sd
                if (math.abs(z) >= zThreshold) out += Anomaly(typ, e.user_id, e.value, z, e.ts)
              }
            }
            val n1 = s.n + 1
            val d = e.value - s.mean
            val mean1 = s.mean + d / n1
            s = TypeStats(n1, mean1, s.m2 + d * (e.value - mean1))
          }
          state.update(s)
          out.iterator
      }
  }

  /** Watermarked stream-stream interval join: each purchase matched to the
    * same user's clicks from the preceding hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so the
    * engine can expire join state — the requirement that keeps a
    * stream-stream join runnable forever (state is O(events within the
    * interval), not O(stream)). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      lateness: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    p.join(c,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_ts"), col("click_value"))
  }

  /** Streaming KMV distinct-count sketch per event type: keyed state holds
    * the k smallest md5-derived user hashes (same hash as the batch
    * `ev_distinct_sketch`, so batch and stream estimates agree on the same
    * data); each batch emits the type's refreshed estimate. State is O(k)
    * per type — constant — and the sketch is a set union, so replayed
    * events are idempotent. */
  def distinctSketch(events: Dataset[StreamEvent], k: Int = 64): Dataset[DistinctEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[KmvSketch, DistinctEstimate](GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[KmvSketch]) =>
          val prev = state.getOption.map(_.hashes).getOrElse(Seq.empty)
          val merged = (prev.toSet ++ it.map(e => StreamOps.hash31(e.user_id.toString)))
            .toSeq.sorted.take(k)
          state.update(KmvSketch(merged))
          val est =
            if (merged.size < k) merged.size.toLong
            else math.floor((k - 1).toDouble * 2147483647L / merged.max).toLong
          DistinctEstimate(typ, est, merged.size)
      }
  }

  /** JVM mirror of Kernels.hash31 (first 8 md5 hex digits mod 2^31−1) —
    * the batch and streaming sketches must hash identically. */
  private[streaming] def hash31(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
      ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
    v % 2147483647L
  }

  /** JVM mirror of Kernels.hash60 (first 15 md5 hex digits = 60 bits). */
  private[streaming] def hash60(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex digits = first 7 bytes + the high nibble of byte 8
    val top14 = (0 until 7).foldLeft(0L)((acc, i) => (acc << 8) | (dig(i) & 0xFFL))
    (top14 << 4) | ((dig(7) & 0xF0L) >> 4)
  }

  /** Streaming HyperLogLog distinct-count sketch per event type: keyed
    * state holds the 64 registers of the batch
    * [[graft.operators.Events.hllDistinct]] (same md5-derived hash, same
    * bucket/rho arithmetic — parity spec-pinned), merged by register max
    * each batch. State is 64 small ints per type — constant — and
    * max-merge makes the sketch IDEMPOTENT under replay: re-delivered
    * events cannot move the estimate, the property a counter lacks. The
    * integer harmonic sum and the fixed-order float finish reproduce the
    * batch estimate exactly on the same data. */
  def hllSketch(events: Dataset[StreamEvent]): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[HllState, HllEstimate](GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[HllState]) =>
          val regs = state.getOption.map(_.regs.toArray).getOrElse(Array.fill(64)(0))
          it.foreach { e =>
            val h = StreamOps.hash60(e.user_id.toString)
            val b = (h % 64).toInt
            val w = h / 64
            val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rho > regs(b)) regs(b) = rho
          }
          state.update(HllState(regs.toSeq))
          // integer harmonic sum, exactly as the batch query: empty
          // registers (0) contribute 2^55; the only float step is the
          // final fixed-order alpha*m^2*2^55 / S
          val s = regs.map(r => 1L << (55 - r)).sum
          val est = java.math.BigDecimal
            .valueOf(0.709 * 4096.0 * (1L << 55).toDouble / s)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          HllEstimate(typ, est, regs.count(_ > 0))
      }
  }

  /** Streaming log-linear quantile sketch per event type: keyed state holds
    * the (bucket → count) map of graft.operators.Events.quantileSketchCounts
    * (same integer bucketing — [[bucket31]] mirrors it exactly, parity
    * spec-pinned), merged by count summation each batch — the associativity
    * the batch sketch's merge spec proves is what makes the state update
    * correct under any batch split. State is O(\|buckets\|) per type,
    * bounded by the VALUE RANGE, not the stream length; each batch emits
    * refreshed p50/p99 estimates identical to the batch query's on the same
    * events. */
  def quantileSketch(events: Dataset[StreamEvent]): Dataset[QuantileEstimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[Map[Long, Long], QuantileEstimate](GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { e =>
            val b = StreamOps.bucket31(e.value)
            m = m.updated(b, m.getOrElse(b, 0L) + 1L)
          }
          state.update(m)
          val n = m.valuesIterator.sum
          QuantileEstimate(typ, n, m.size,
            StreamOps.sketchQuantile(m, n, 0.50), StreamOps.sketchQuantile(m, n, 0.99))
      }
  }

  /** JVM mirror of the batch sketch's integer log-linear bucketing
    * (Events.quantileSketchCounts: octave = bit length of the cent value,
    * 16 linear sub-buckets) — batch and streaming sketches MUST bucket
    * identically; QuantileSketchSpec pins the parity on real data. Cent
    * values below 1 (zero/negative inputs) clamp into the lowest bucket —
    * the underflow bucket — in BOTH engines, so every operand stays
    * non-negative and no floor-vs-truncate division divergence can occur. */
  private[graft] def bucket31(v: Double): Long = {
    val m = graft.operators.Events.QuantileSketchSubBuckets
    val vc = math.max(math.floor(v * 100.0 + 0.5).toLong, 1L)
    val e = 64 - java.lang.Long.numberOfLeadingZeros(vc) // bit length (vc >= 1)
    val lo = 1L << (e - 1)
    (e.toLong - 1L) * m + (vc - lo) * m / lo
  }

  /** Quantile estimate off a bucket-count map: midpoint of the bucket where
    * the cumulative count crosses ceil(q·n) — same rank rule and midpoint
    * arithmetic as the batch query (round-4, HALF_UP). */
  private[graft] def sketchQuantile(m: Map[Long, Long], n: Long, q: Double): Double = {
    val sb = graft.operators.Events.QuantileSketchSubBuckets
    val r = math.ceil(q * n).toLong
    var cum = 0L
    var idx = m.keysIterator.min
    for ((b, c) <- m.toSeq.sortBy(_._1) if cum < r) { cum += c; idx = b }
    val lo = 1L << (idx / sb).toInt
    val est = (lo + ((idx % sb) + 0.5) * lo / sb.toDouble) / 100.0
    java.math.BigDecimal.valueOf(est).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Streaming funnel: per user, the ordered step sequence (default
    * signup → click → purchase, each step at or after the previous step's
    * time) tracked in keyed state; a conversion is emitted EXACTLY ONCE,
    * the moment the final step lands — the streaming twin of the batch
    * `ev_funnel`'s first-signup → first-click-after → first-purchase-after
    * chain. State is one timestamp per step plus a done flag — O(steps)
    * per user — and a completed funnel ignores further events, so replays
    * cannot double-count a conversion.
    *
    * The KEY SET is bounded too: event-time timeout evicts any user with
    * no funnel-step activity for `ttlHours` (default 90 days), so on an
    * unbounded stream state is O(recently-active users), not O(users ever
    * seen). Eviction semantics are documented at the timeout branch. */
  def funnel(events: Dataset[StreamEvent],
      steps: Seq[String] = Seq("signup", "click", "purchase"),
      lateness: String = "1 hour",
      ttlHours: Long = 2160L): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val stepSet = steps.toSet
    val ttlMs = ttlHours * 3600000L
    events
      .withWatermark("ts", lateness)
      .filter(e => stepSet.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[StreamEvent], state: GroupState[FunnelState]) =>
          // dormancy eviction: a user with no funnel-step activity for
          // ttlHours of EVENT time is dropped — the key set stays O(active
          // users), not O(all users ever seen). A re-admitted user starts
          // the funnel from scratch (their stale prefix is gone), and a
          // CONVERTED user's replay-dedup guarantee holds for ttlHours
          // after conversion (a replay arriving later than that would
          // re-run the funnel — by then it is watermark-late anyway).
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var s = state.getOption.getOrElse(FunnelState(Nil, done = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
          // ts ties break by step index: a step sorts AFTER its predecessor
          // at the same timestamp, matching the batch ev_funnel's
          // at-or-after (>=) chain deterministically — (ts, user_id) alone
          // leaves same-user equal-ts events in shuffle order, and a step
          // sorted before its predecessor would be dropped forever.
          var lastMs = Long.MinValue
          // full-µs ordering + at-or-after chain: the batch twin compares
          // true event time, so a same-ms/different-µs step pair must
          // resolve by µs here too (state times are epoch-µs)
          it.toSeq.sortBy(e => (usOf(e.ts), steps.indexOf(e.event_type))).foreach { e =>
            lastMs = math.max(lastMs, e.ts.getTime)
            if (!s.done) {
              val idx = s.times.length
              if (idx < steps.length && e.event_type == steps(idx) &&
                (s.times.isEmpty || usOf(e.ts) >= s.times.last)) {
                s = s.copy(times = s.times :+ usOf(e.ts))
                if (s.times.length == steps.length) {
                  s = s.copy(done = true)
                  out += Conversion(uid, tsOfUs(s.times.head),
                    tsOfUs(s.times.last), (s.times.last - s.times.head) / 1000L)
                }
              }
            }
          }
          state.update(s)
          state.setTimeoutTimestamp(
            math.max(lastMs, state.getCurrentWatermarkMs() + 1L) + ttlMs)
          out.iterator
          }
      }
  }

  /** [[funnel]] on `transformWithState` — the port that exercises the
    * THIRD typed state primitive: step times live in a TWS
    * `ListState[Long]` (append-only per landed step — RocksDB appends an
    * entry instead of re-serializing the whole sequence, the same
    * per-entry win [[BitmapDistinctProcessor]] gets from `MapState`),
    * the done flag in a `ValueState[Boolean]`, and the dormancy TTL on
    * an engine event-time timer re-armed at last-activity + TTL (the
    * one-timer-per-key pattern) whose expiry clears all three state
    * variables — same eviction semantics as the fMGWS twin's
    * `hasTimedOut` branch: a re-admitted user restarts from scratch.
    * Same ordering (true-µs + step-index tiebreak), at-or-after chain
    * and exactly-once conversion contract; parity + TTL specs on
    * RocksDB. */
  def funnelTws(events: Dataset[StreamEvent],
      steps: Seq[String] = Seq("signup", "click", "purchase"),
      lateness: String = "1 hour",
      ttlHours: Long = 2160L): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val stepSet = steps.toSet
    events
      .withWatermark("ts", lateness)
      .filter(e => stepSet.contains(e.event_type))
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps, ttlHours * 3600000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming event-time disorder monitor — the live twin of the batch
    * `ev_lateness` audit: keyed state per event type holds the running
    * event-time maximum (exactly what a watermark tracks) plus cumulative
    * late counts; each batch emits the refreshed disorder profile, so an
    * operator can see out-of-order pressure building BEFORE a watermark
    * delay starts dropping data. State is three numbers per type —
    * constant — and arrival order inside a batch is made deterministic by
    * the same (ts, user) sort the other stateful ops use. */
  def latenessMonitor(events: Dataset[StreamEvent]): Dataset[LatenessProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[LateState, LatenessProfile](GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[LateState]) =>
          var s = state.getOption.getOrElse(LateState(0L, 0L, 0L, Long.MinValue))
          it.toSeq.sortBy(e => (usOf(e.ts), e.user_id)).foreach { e =>
            val t = e.ts.getTime
            if (t < s.runmax)
              s = s.copy(n = s.n + 1, nLate = s.nLate + 1,
                maxLateMs = math.max(s.maxLateMs, s.runmax - t))
            else s = s.copy(n = s.n + 1, runmax = t)
          }
          state.update(s)
          // HALF_UP to 4 places — the SAME rounding as the batch ev_lateness
          // audit's round(...,4), so the two profiles agree on identical
          // data (floor here could sit one 1e-4 step below the batch row).
          LatenessProfile(typ, s.n, s.nLate,
            if (s.n == 0) 0.0
            else java.math.BigDecimal.valueOf(s.nLate.toDouble / s.n)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue(),
            s.maxLateMs)
      }
  }

  /** Streaming heavy hitters per event type (Misra–Gries): keyed state
    * holds at most k (user → lower-bound count) counters — a new user past
    * the budget decrements ALL counters instead of growing state, so
    * memory is O(k) per type forever, the property an exact per-user count
    * (O(users)) lacks on an unbounded stream.
    *
    * The classic guarantees survive batching/merging and are what the spec
    * pins (bit-level state depends on arrival order, the guarantees do
    * not): every user with true count > n/(k+1) IS tracked, and each
    * tracked counter is a lower bound within n/(k+1) of the true count.
    * Each batch emits the refreshed per-type summary, counters sorted by
    * (count desc, user asc). */
  def heavyHitters(events: Dataset[StreamEvent], k: Int = 8): Dataset[HeavyHittersProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[HhState, HeavyHittersProfile](GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[HhState]) =>
          var s = state.getOption.getOrElse(HhState(0L, Map.empty))
          var counters = s.counters
          var n = s.n
          it.toSeq.sortBy(e => (usOf(e.ts), e.user_id)).foreach { e =>
            n += 1
            counters = StreamOps.mgUpdate(counters, k, e.user_id)
          }
          s = HhState(n, counters)
          state.update(s)
          val sorted = counters.toSeq.sortBy { case (u, c) => (-c, u) }
          HeavyHittersProfile(typ, n, sorted.map(_._1), sorted.map(_._2))
      }
  }

  /** [[heavyHitters]] on Spark 4's `transformWithState` — the Misra–Gries
    * sketch with its counters in a TWS `MapState[user → count]` instead of
    * one opaque fMGWS value: RocksDB persists each tracked user as its own
    * store entry, so the common batch (all arrivals already tracked or
    * budget free) writes only the touched entries; only the rare
    * budget-full DECREMENT step touches all ≤ k entries — and k is the
    * sketch geometry, so even that is O(k), never O(stream keys). The
    * stream count n rides a separate `ValueState`. Same per-batch
    * (true-µs, user) arrival order and [[mgUpdate]] fold as the fMGWS
    * form; the parity spec pins both profiles equal across a mid-stream
    * split on RocksDB. */
  def heavyHittersTws(events: Dataset[StreamEvent], k: Int = 8): Dataset[HeavyHittersProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new HeavyHittersProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** One Misra–Gries counter update — the whole algorithm, exposed so a
    * property suite can fold it over arbitrary streams and check the
    * guarantees (every item with count > n/(k+1) tracked; counters are
    * lower bounds within n/(k+1)) hold for ALL inputs, not just the
    * events corpus. */
  private[graft] def mgUpdate(counters: Map[Long, Long], k: Int, u: Long): Map[Long, Long] =
    counters.get(u) match {
      case Some(c) => counters.updated(u, c + 1)
      case None if counters.size < k => counters.updated(u, 1L)
      case None => // budget full: decrement everything, drop zeros
        counters.map { case (uu, c) => uu -> (c - 1) }.filter(_._2 > 0)
    }

  /** Topic routing for the streaming sink — the reference's core job
    * (SSE record → topic, ServerSentEventsSourceTask.java:108-135),
    * Spark-native: a `topic` column to `partitionBy` at the sink, so each
    * topic lands in its own directory/partition stream. */
  def routeToTopics(events: DataFrame): DataFrame =
    events.withColumn("topic", concat(lit("sse_"), col("event_type")))

  /** Streaming Count-Min sketch — the in-flight twin of the batch
    * `ev_count_min`: keyed state per hash row j is that row's
    * bucket→count map (≤ width entries — bounded by the SKETCH geometry,
    * never the key cardinality, the property that lets a frequency
    * monitor run forever on an unbounded stream). Same row-salted
    * [[hash31]] arithmetic as the batch sketch, and counter merge is pure
    * addition, so after any batch split the streaming counters equal the
    * batch sketch bit-for-bit (parity spec). Emits each row's counters
    * every batch (update mode); probing min_j counters[hj(u)] is the
    * reader's side, identical to batch. */
  def countMinStream(events: Dataset[StreamEvent], depth: Int = 4,
      width: Int = 512): Dataset[CmRowState] = {
    import events.sparkSession.implicits._
    events
      .flatMap(e => (0 until depth).map(j =>
        (j, (StreamOps.hash31(s"$j:${e.user_id}") % width).toInt)))
      .groupByKey(_._1)
      .mapGroupsWithState[Map[Int, Long], CmRowState](GroupStateTimeout.NoTimeout()) {
        (j: Int, it: Iterator[(Int, Int)], state: GroupState[Map[Int, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Int, Long])
          it.foreach { case (_, b) => m = m.updated(b, m.getOrElse(b, 0L) + 1L) }
          state.update(m)
          CmRowState(j, m)
      }
  }

  /** Streaming last-touch attribution — the in-flight twin of the batch
    * `ev_attribution`: per-user state is the latest click/view timestamp
    * pair (two longs — O(1), the streaming form of the batch query's two
    * conditional running maxima), and each arriving purchase emits its
    * attributed channel immediately (append mode). Same 24 h lookback and
    * click-wins-ties rule as the batch row, pinned by the parity spec;
    * same per-key in-order assumption as [[scd2Stream]]/[[funnel]].
    *
    * The key set is bounded LOSSLESSLY: event-time timeout evicts a user
    * once the watermark passes their last touch + lookback — at which
    * point every surviving touch is outside the horizon, so any on-time
    * purchase would attribute "none" with or without the state (only a
    * purchase already later than the watermark could tell the
    * difference). State is O(users touched within the lookback window),
    * the minimum any exact attribution can hold. */
  def attributionStream(events: Dataset[ChangeEvent],
      lookbackHours: Int = 24,
      lateness: String = "1 hour"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    val horizonUs = lookbackHours * 3600L * 1000000L
    val horizonMs = lookbackHours * 3600000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[ChangeEvent], state: GroupState[TouchState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var s = state.getOption.getOrElse(TouchState(None, None))
          val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
          var lastMs = Long.MinValue
          it.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
            val us = usOf(e.ts)
            lastMs = math.max(lastMs, e.ts.getTime)
            e.event_type match {
              case "click" => s = s.copy(lastClickUs = Some(us))
              case "view" => s = s.copy(lastViewUs = Some(us))
              case "purchase" =>
                val channel = s match {
                  case TouchState(Some(c), v) if us - c <= horizonUs &&
                    v.forall(c >= _) => "click"
                  case TouchState(_, Some(v)) if us - v <= horizonUs => "view"
                  case _ => "none"
                }
                out += Attribution(uid, e.event_id, channel)
              case _ => ()
            }
          }
          state.update(s)
          state.setTimeoutTimestamp(
            math.max(lastMs, state.getCurrentWatermarkMs() + 1L) + horizonMs)
          out.iterator
          }
      }
  }

  /** [[attributionStream]] on Spark 4's `transformWithState` — last-touch
    * attribution's two-timestamp state in a typed `ValueState[TouchState]`
    * with the SAME lossless event-time eviction: an engine timer re-armed
    * at max(last event, watermark + 1) + lookback (the one-timer-per-key
    * delete/register pattern) clears a user once every surviving touch is
    * outside the horizon — the exact fMGWS `setTimeoutTimestamp` instant.
    * Same (true-µs, event_id) fold, 24 h lookback, and click-wins-ties
    * rule; parity spec pins the attributions bit-for-bit equal to the
    * fMGWS twin on a split feed on RocksDB. */
  def attributionStreamTws(events: Dataset[ChangeEvent],
      lookbackHours: Int = 24,
      lateness: String = "1 hour"): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor(lookbackHours),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming SCD-2 compaction — the in-flight twin of the batch
    * `ev_scd2`: per-key state is ONE open interval (version, status,
    * count, start — O(1) per user, not O(history)), and a status change
    * closes the previous interval exactly once (append mode). This is the
    * CDC→dimension maintenance a warehouse runs as periodic MERGEs,
    * running continuously instead; the closed intervals it emits are
    * byte-identical to the batch rows with a non-null valid_to, which the
    * parity spec pins. Same micro-batch ordering rule as the batch window
    * (sort by ts, then event_id); like [[funnel]], correctness relies on
    * per-key event-time order across batches — feed it from a
    * per-partition-ordered source (the SSE source's frame order) or an
    * upstream watermarked sort.
    *
    * Dormancy flush bounds the key set: a user silent for `ttlHours` of
    * event time has their open interval FLUSHED as a closed row —
    * valid_to = their last observed event second (the interval is closed
    * at its last evidence, not at the arbitrary eviction instant) — and
    * the state dropped. A re-admitted user opens a fresh version-1
    * interval; downstream dimension consumers key on (user_id,
    * valid_from), for which version restart is invisible. The default
    * 90-day TTL keeps every parity spec lossless. */
  def scd2Stream(events: Dataset[ChangeEvent],
      lateness: String = "1 hour",
      ttlHours: Long = 2160L): Dataset[Scd2Interval] = {
    import events.sparkSession.implicits._
    val ttlMs = ttlHours * 3600000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Interval](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[ChangeEvent], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(Scd2Interval(uid, st.version, st.status, st.n, st.from, st.last))
          } else {
          var s = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Interval]
          var lastMs = Long.MinValue
          // µs sort (batch window orders by true-µs ts, then event_id);
          // the emitted interval bounds stay at second granularity
          it.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
            val t = usOf(e.ts) / 1000000L
            lastMs = math.max(lastMs, e.ts.getTime)
            s match {
              case null =>
                s = Scd2State(1L, e.event_type, 1L, t, t)
              case st if st.status == e.event_type =>
                s = st.copy(n = st.n + 1, last = math.max(st.last, t))
              case st =>
                out += Scd2Interval(uid, st.version, st.status, st.n, st.from, t)
                s = Scd2State(st.version + 1L, e.event_type, 1L, t, t)
            }
          }
          if (s != null) {
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(lastMs, state.getCurrentWatermarkMs() + 1L) + ttlMs)
          }
          out.iterator
          }
      }
  }

  /** Gap sessionization on Spark 4's `transformWithState` with EVENT-TIME
    * TIMERS — the reference-identity stateful op ([[sessionize]]) ported
    * to the modern API, closing the fMGWS-only gap the funnel/SCD-2/OHLC/
    * bitmap/transition twins already closed: session state is ONE
    * `ValueState` per user (n, sum, start-µs, last-µs) and the close is an
    * engine-managed event-time timer armed at the LAST instant any event
    * could still merge under the batch floor-second gap rule,
    * (⌊last⌋ + gap + 1) s — exactly [[sessionize]]'s
    * `setTimeoutTimestamp` instant, now re-armed via the
    * [[Scd2Processor]] one-timer-per-key delete/register pattern. Same
    * semantics contract: µs-sorted intra-batch fold, floor-second gap
    * compare (a raw-ms gap would split sessions the batch merges), closed
    * sessions in append mode with full-µs boundaries. Timers live in the
    * checkpointed RocksDB store, so a close armed before a shutdown fires
    * after the restart — the spec drives exactly that. */
  def sessionizeTws(events: Dataset[StreamEvent], gapSec: Long = 1800L,
      lateness: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSec),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** SCD-2 compaction on Spark 4's `transformWithState` with EVENT-TIME
    * TIMERS — the same closed-interval semantics as [[scd2Stream]] (one
    * open interval per user, O(1) state, closed rows byte-identical to the
    * batch `ev_scd2`), but the dormancy flush is an engine-managed
    * event-time TIMER instead of the fMGWS `EventTimeTimeout` hand-roll:
    * each input batch re-arms the user's flush timer at last-evidence +
    * `ttlHours`, and when the watermark passes that instant the engine
    * calls `handleExpiredTimer`, which emits the open interval closed at
    * its last observed second and clears the state. Timers live in the
    * checkpointed RocksDB store, so a flush armed before a shutdown fires
    * after the restart — the spec drives exactly that. Completes the
    * modern-API migration story [[transitionStreamTws]] started: that twin
    * proved TTL, this one proves TIMERS (the dimension SCD-2 actually
    * needs). Requires the RocksDB state-store provider. */
  def scd2StreamTws(events: Dataset[ChangeEvent],
      lateness: String = "1 hour",
      ttlHours: Long = 2160L): Dataset[Scd2Interval] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor(ttlHours * 3600000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming 4-tap EWMA smoothing — the in-flight twin of the batch
    * `ev_ewma_hourly`: keyed state per event type is the last ≤4 OBSERVED
    * (hour, count) taps (O(1) forever — exactly the lag window the batch
    * query reads), each batch folds its events into the tap list (the
    * current hour's count keeps accumulating across micro-batches) and
    * re-emits the refreshed integer EWMA (weights 8/4/2/1, ×15 scale — no
    * float division, same closed form as the batch SQL) for every hour it
    * touched. Same per-key in-order event-time assumption as
    * [[scd2Stream]]/[[funnel]]; the latest emission per (type, hour) is
    * the batch row, pinned by the parity spec across a mid-stream split. */
  def ewmaStream(events: Dataset[StreamEvent]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Seq[(Long, Long)], EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (et: String, it: Iterator[StreamEvent], state: GroupState[Seq[(Long, Long)]]) =>
          var taps = state.getOption.getOrElse(Seq.empty) // ascending (hourSec, cnt)
          val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
          it.toSeq.sortBy(e => usOf(e.ts)).foreach { e =>
            val hour = e.ts.getTime / 3600000L * 3600L
            touched += hour
            taps.indexWhere(_._1 == hour) match {
              case -1 => taps = (taps :+ (hour, 1L)).sortBy(_._1)
              case i  => taps = taps.updated(i, (hour, taps(i)._2 + 1L))
            }
          }
          // emissions read the UNpruned in-batch list (an early hour in a
          // multi-hour batch still sees its own predecessors); only the
          // carried state trims to the 4 taps any FUTURE hour can reach.
          // LATE-DATA CONTRACT: an event for an hour older than the carried
          // 4-tap horizon re-opens that hour with a fresh count — its
          // already-trimmed predecessors read as 0, so the re-emitted bar
          // under-weights history rather than crashing or double-counting.
          // Feeds that can be late beyond the horizon must gate upstream
          // with a watermark (the parity spec feeds per-key in-order).
          state.update(taps.takeRight(4))
          val byHour = taps.map(_._1).zipWithIndex.toMap
          touched.iterator.flatMap { h =>
            byHour.get(h).map { i =>
              def tap(k: Int): Long = if (i - k >= 0) taps(i - k)._2 else 0L
              EwmaPoint(et, h, taps(i)._2,
                tap(0) * 8 + tap(1) * 4 + tap(2) * 2 + tap(3))
            }
          }
      }
  }

  /** Streaming OHLC bars — the in-flight twin of the batch
    * `ev_ohlc_hourly`: keyed state per hour is the six-number bar
    * (open/close carry their (µs, event_id) argmin/argmax keys so
    * cross-batch ties resolve exactly like the batch's lexicographic
    * array min/max — O(1) per open hour, never per tick); each batch
    * folds its ticks in and re-emits the refreshed bar (append mode), so
    * the latest emission per hour IS the batch row once the hour closes
    * (parity spec across a mid-stream split). Integer cents throughout.
    *
    * CLOSED hours are evicted: once the watermark passes an hour's end no
    * on-time tick can still land in it, so the event-time timeout emits
    * the bar one final time and drops the cell — the same close-and-drop
    * rule as [[bitmapDistinctStream]] (each cell is O(1), but a year of
    * dead hour keys is still a year of dead state).
    *
    * BEHAVIOR CONTRACT (eviction's two visible consequences — shared with
    * [[bitmapDistinctStream]]): (1) the watermark DROPS late ticks — an
    * event later than `lateness` never reaches the state (the pre-r10
    * timeout-free form counted it), so pick a lateness that covers the
    * source's real disorder (`ev_watermark_recommend` measures it);
    * (2) append output re-emits the FINAL bar from the eviction timer
    * even when a refreshed emission for the same hour already went out —
    * consumers must keep the LATEST emission per hour_ts (the parity
    * specs' dedup rule), not assume one row per hour. */
  def ohlcStream(ticks: Dataset[Tick],
      lateness: String = "1 hour"): Dataset[OhlcBar] = {
    import ticks.sparkSession.implicits._
    ticks
      .withWatermark("ts", lateness)
      .groupByKey(t => t.ts.getTime / 3600000L * 3600L)
      .flatMapGroupsWithState[OhlcState, OhlcBar](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (hour: Long, it: Iterator[Tick], state: GroupState[OhlcState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(OhlcBar(hour, st.n, st.open, st.high, st.low, st.close, st.vol))
          } else {
          var s = state.getOption.orNull
          it.foreach { t =>
            val us = usOf(t.ts)
            val cents = math.floor(t.value * 100 + 0.5).toLong
            s = if (s == null)
              OhlcState(us, t.event_id, cents, cents, cents, us, t.event_id, cents, 1L, cents)
            else {
              val earlier = us < s.openUs || (us == s.openUs && t.event_id < s.openId)
              val later = us > s.closeUs || (us == s.closeUs && t.event_id > s.closeId)
              val o = if (earlier) (us, t.event_id, cents) else (s.openUs, s.openId, s.open)
              val c = if (later) (us, t.event_id, cents) else (s.closeUs, s.closeId, s.close)
              OhlcState(o._1, o._2, o._3, math.max(s.high, cents), math.min(s.low, cents),
                c._1, c._2, c._3, s.n + 1L, s.vol + cents)
            }
          }
          if (s == null) Iterator.empty
          else {
            state.update(s)
            // close-and-drop: finalize when the watermark passes hour end
            state.setTimeoutTimestamp(math.max((hour + 3600L) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.single(OhlcBar(hour, s.n, s.open, s.high, s.low, s.close, s.vol))
          }
          }
      }
  }

  /** [[ohlcStream]] on `transformWithState` — completing the modern-API
    * migration on the last heavy legacy twin: per-hour bar state moves to
    * a typed `ValueState[OhlcState]` with the SAME true-µs
    * (ts, event_id) argmin/argmax open/close rule, and finalize-and-drop
    * eviction rides an engine event-time TIMER re-armed at
    * max(hour end, watermark + 1) (the [[Scd2Processor]] /
    * [[BitmapDistinctProcessor]] one-timer-per-key pattern). Same
    * behavior contract as the fMGWS form: late ticks beyond `lateness`
    * drop; append output carries refreshed bars AND the timer's final
    * emission — consumers keep the latest per hour. */
  def ohlcStreamTws(ticks: Dataset[Tick],
      lateness: String = "1 hour"): Dataset[OhlcBar] = {
    import ticks.sparkSession.implicits._
    ticks
      .withWatermark("ts", lateness)
      .groupByKey(t => t.ts.getTime / 3600000L * 3600L)
      .transformWithState(new OhlcProcessor(),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming schema-drift monitor — the in-flight twin of the batch
    * `sse_schema_infer`: the stateless half (key explode + regex shape
    * classifier — the SAME column expressions as the batch audit) rides
    * the ingest map stage; the keyed half accumulates a (shape → count)
    * map per JSON key in `mapGroupsWithState` — state O(\|keys\|×\|shapes\|),
    * bounded by the SCHEMA, never the stream — and re-emits the refreshed
    * per-key profile each batch, so an operator watches new keys or shape
    * flips appear live instead of at the next batch audit. Parity spec:
    * after a split feed the final profile equals the batch inventory. */
  def schemaInferStream(docs: DataFrame): Dataset[KeyShapeProfile] = {
    import docs.sparkSession.implicits._
    graft.operators.Events.keyShapeRows(docs).as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], KeyShapeProfile](GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[(String, String)], state: GroupState[Map[String, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach { case (_, t) => m = m.updated(t, m.getOrElse(t, 0L) + 1L) }
          state.update(m)
          KeyShapeProfile(key, m)
      }
  }

  // ---- transformWithState ports of the remaining legacy stateful ops ----
  // With these, EVERY keyed stateful operator in the library has a
  // modern-API twin, each parity-spec-pinned bit-for-bit against its fMGWS
  // form on RocksDB: the full migration matrix, not a sampler. Sketches
  // with per-entry state (HLL registers, quantile buckets, CM counters,
  // JSON shapes) move to MapState — RocksDB writes only the entries a
  // batch touches, the same per-entry win the bitmap port measured —
  // while O(1) tuples stay in typed ValueStates.

  /** [[anomalies]] on `transformWithState`: Welford (n, mean, M2) in a
    * typed `ValueState`, same (µs, user, value) fold and ≥ minN gate. */
  def anomaliesTws(events: Dataset[StreamEvent], minN: Long = 30,
      zThreshold: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new AnomalyProcessor(minN, zThreshold),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** [[distinctSketch]] on `transformWithState`: the k smallest hashes in
    * a typed `ValueState[KmvSketch]` (the sketch IS one value — k longs). */
  def distinctSketchTws(events: Dataset[StreamEvent],
      k: Int = 64): Dataset[DistinctEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new KmvProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[hllSketch]] on `transformWithState`: the 64 registers in a
    * `MapState[bucket → rho]` — a batch writes only the registers it
    * RAISES (max-merge touches few once the sketch saturates), where the
    * fMGWS form re-serializes all 64 every batch. */
  def hllSketchTws(events: Dataset[StreamEvent]): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new HllProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[quantileSketch]] on `transformWithState`: the bucket→count map in a
    * `MapState` (per-bucket entries, count merge = per-entry add). */
  def quantileSketchTws(events: Dataset[StreamEvent]): Dataset[QuantileEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new QuantileProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[countMinStream]] on `transformWithState`: each hash row's counters
    * in a `MapState[bucket → count]` — bounded by the sketch width. */
  def countMinStreamTws(events: Dataset[StreamEvent], depth: Int = 4,
      width: Int = 512): Dataset[CmRowState] = {
    import events.sparkSession.implicits._
    events
      .flatMap(e => (0 until depth).map(j =>
        (j, (StreamOps.hash31(s"$j:${e.user_id}") % width).toInt)))
      .groupByKey(_._1)
      .transformWithState(new CountMinProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[latenessMonitor]] on `transformWithState`: the O(1) lateness tuple
    * in a typed `ValueState[LateState]`, same fold and HALF_UP finish. */
  def latenessMonitorTws(events: Dataset[StreamEvent]): Dataset[LatenessProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new LatenessProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[ewmaStream]] on `transformWithState`: the ≤4 carried taps in a
    * typed `ValueState` (trim-to-horizon semantics unchanged, including
    * the documented late-data contract). */
  def ewmaStreamTws(events: Dataset[StreamEvent]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new EwmaProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** [[burstStream]] on `transformWithState`: the closed-hour moment
    * triple + open hour in a typed `ValueState`, same integer 3σ rule. */
  def burstStreamTws(events: Dataset[StreamEvent]): Dataset[BurstVerdict] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "error")
      .groupByKey(_.event_type)
      .transformWithState(new BurstProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** [[schemaInferStream]] on `transformWithState`: the shape→count map in
    * a `MapState` — a drifting key writes one entry, not its whole map. */
  def schemaInferStreamTws(docs: DataFrame): Dataset[KeyShapeProfile] = {
    import docs.sparkSession.implicits._
    graft.operators.Events.keyShapeRows(docs).as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new SchemaInferProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** Streaming error-burst monitor — the in-flight form of the batch
    * `ev_error_burst`, with the honest streaming semantics: an hour is
    * judged against the integer mean+3σ of the CLOSED hours seen so far
    * (prefix stats — a live monitor cannot consult the future the batch
    * audit averages over). Keyed state is O(1) forever: the (n, Σx, Σx²)
    * moment triple over closed hours plus the one open hour's running
    * count; a new hour closes the previous one, which is tested with the
    * SAME all-integer 3σ inequality as the batch row ((n·x−Σx)² >
    * 9·(n·Σx²−(Σx)²)) and folded into the moments. Same per-key in-order
    * event-time assumption as the other keyed twins; spec replays the
    * fold locally and pins every closed-hour verdict. */
  def burstStream(events: Dataset[StreamEvent]): Dataset[BurstVerdict] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "error")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[BurstState, BurstVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[StreamEvent], state: GroupState[BurstState]) =>
          var s = state.getOption.getOrElse(BurstState(0L, 0L, 0L, -1L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[BurstVerdict]
          def close(): Unit = if (s.openHour >= 0) {
            val (n, x) = (s.n, s.openCnt)
            val devN = n * x - s.s1
            val burst = n > 0 && devN > 0 &&
              devN * devN > 9L * (n * s.s2 - s.s1 * s.s1)
            out += BurstVerdict(s.openHour, x, burst)
            s = BurstState(n + 1, s.s1 + x, s.s2 + x * x, -1L, 0L)
          }
          it.toSeq.sortBy(e => usOf(e.ts)).foreach { e =>
            val hour = e.ts.getTime / 3600000L * 3600L
            if (hour != s.openHour) { close(); s = s.copy(openHour = hour, openCnt = 0L) }
            s = s.copy(openCnt = s.openCnt + 1L)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming DSIR scoring — ship-the-model for the text-selection
    * family: the BATCH pass trains the 128-bucket importance model
    * ([[graft.operators.Pipeline.dsirModelLocal]], ~1 KiB whatever the
    * corpus size) and the stream scores each arriving document in a
    * STATELESS projection — bucket every token with the shared md5
    * `hash31` kernel and sum the bucket log-weights embedded as a plan
    * LITERAL. No join, no state store, no watermark; re-training is a
    * plan swap (the [[decontaminateStream]]/[[assignCellsStream]] pattern
    * applied to importance resampling). Parity spec: per-doc scores match
    * the batch `dsirDocScores` within one round-4 step (the two sides sum
    * the same terms in different orders). */
  def dsirScoreStream(docs: DataFrame, bucketWeights: Seq[Double]): DataFrame = {
    import graft.functions.Kernels.tokens
    val nB = bucketWeights.size
    docs.select(col("doc_id"),
      round(aggregate(
        transform(tokens(col("text")),
          w => element_at(typedLit(bucketWeights),
            (pmod(graft.functions.Kernels.hash31(w), lit(nB.toLong)) + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x), 4).as("score"))
  }

  /** Streaming ingest funnel — the in-flight composition of the batch
    * `docs_pipeline_full`'s STATELESS stages, chained as ONE projection:
    * quality gate (same token-count/distinct-ratio rule) → Bloom
    * decontamination probe (the batch-published filter embedded as a plan
    * literal, [[decontaminateStream]]'s kernel) → DSIR importance score
    * ([[dsirScoreStream]]'s shipped 128-bucket model) → hashed-linear
    * quality-classifier band ([[graft.operators.Pipeline.qualityClassifier]]'s
    * exact integer arithmetic). No join, no state store, no watermark —
    * at 100 TB/day the whole funnel rides the ingest map stage, and
    * re-publishing any model (filter, weights) is a plan swap.
    *
    * Emits per doc: the funnel verdict `stage` ∈ quality \| contam \| kept
    * plus both scores. The two STATEFUL batch stages (exact dedup,
    * near-dup clustering) are deliberately absent — cross-document
    * identity needs corpus state and lives downstream (batch, or the
    * bounded-watermark streaming dedups); the parity contract is: any doc
    * the batch funnel labels quality/contam/kept gets the SAME label here,
    * and batch exact/neardup docs pass through as kept-or-contam for the
    * downstream dedup to adjudicate (the spec pins both on a split feed).
    * A doc with no shingles is never "contam" (the batch probe's ≥3-token
    * universe). */
  def ingestFunnelStream(docs: DataFrame, filterWords: Seq[Long],
      bucketWeights: Seq[Double], mBits: Int = 65536): DataFrame = {
    funnelStages(docs, filterWords, bucketWeights, mBits)
      .select(col("doc_id"), col("source"), col("stage"),
        col("nw"), col("n_sh"), col("n_flagged"), col("dsir_score"),
        col("clf_band"))
  }

  /** The stateless funnel verdicts plus the two dedup keys (md5 digest,
    * 32-hash MinHash signature) — the [[ingestFunnelFullStream]] input
    * frame, package-visible so the parity spec can run the SAME
    * projection in batch mode and replay the claim logic exactly. */
  private[streaming] def funnelStagedDocs(docs: DataFrame,
      filterWords: Seq[Long], bucketWeights: Seq[Double],
      mBits: Int): Dataset[StagedDoc] = {
    import docs.sparkSession.implicits._
    import graft.functions.Kernels.{shingles3, tokens}
    val sh = array_distinct(shingles3(tokens(col("text"))))
    val sigExpr = when(size(sh) > 0,
      transform(sequence(lit(0), lit(31)), k =>
        array_min(transform(sh, s => graft.functions.Kernels.hash31(
          concat(k.cast("string"), lit(" "), s))))))
      .otherwise(array().cast("array<long>"))
    funnelStages(docs, filterWords, bucketWeights, mBits)
      .select(col("doc_id"), col("source"), col("stage").as("stage0"),
        md5(col("text")).as("digest"), sigExpr.as("sig"))
      .as[StagedDoc]
  }

  /** The stateless funnel verdict columns, appended WITHOUT dropping the
    * caller's others — shared by [[ingestFunnelStream]] (which selects its
    * published contract) and [[ingestFunnelFullStream]] (which also needs
    * the dedup keys). */
  private def funnelStages(docs: DataFrame, filterWords: Seq[Long],
      bucketWeights: Seq[Double], mBits: Int): DataFrame = {
    import graft.functions.Kernels.{bloomContains, shingles3, tokens}
    val nB = bucketWeights.size
    val t = tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"), col("text"),
        size(t).cast("long").as("nw"),
        size(array_distinct(t)).cast("long").as("nd"),
        array_distinct(shingles3(t)).as("sh"))
      .select(col("doc_id"), col("source"), col("text"), col("nw"), col("nd"),
        size(col("sh")).cast("long").as("n_sh"),
        size(filter(col("sh"), s => bloomContains(s, filterWords, mBits)))
          .cast("long").as("n_flagged"))
      .withColumn("kept_q", col("nw") >= 30 && col("nw") <= 80 &&
        col("nd").cast("double") / col("nw") >= 0.45)
      .withColumn("contaminated",
        col("n_sh") > 0 && col("n_flagged") * 2 >= col("n_sh"))
      .withColumn("dsir_score", round(aggregate(
        transform(tokens(col("text")),
          w => element_at(typedLit(bucketWeights),
            (pmod(graft.functions.Kernels.hash31(w), lit(nB.toLong)) + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x), 4))
      // the classifier's exact integer chain: token → md5 bucket →
      // (bucket · 2654435761) mod 2048 weight; band = (10·Σw) div (2048·n)
      .withColumn("clf_s", aggregate(
        transform(tokens(col("text")),
          // top 32 bits of the 60-bit md5 prefix == the first 8 hex digits
          w => (shiftright(graft.functions.Kernels.hash60(w), 28)
            % graft.operators.Pipeline.ClassifierBuckets) * 2654435761L % 2048L),
        lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"), col("source"), col("text"),
        when(!col("kept_q"), "quality")
          .when(col("contaminated"), "contam")
          .otherwise("kept").as("stage"),
        col("nw"), col("n_sh"), col("n_flagged"), col("dsir_score"),
        when(col("nw") > 0, expr("(10 * clf_s) div (2048 * nw)"))
          .otherwise(lit(null)).as("clf_band"))
  }

  /** The FULL ingest funnel in-flight (`ingestFunnelFullStream`) —
    * [[ingestFunnelStream]]'s stateless stages composed with the two
    * deliberately-downstream STATEFUL stages, so every verdict of the
    * batch `docs_pipeline_full` contract (quality | exact | neardup |
    * contam | kept) is adjudicated on the stream:
    *
    *  1. stateless funnel (quality gate, Bloom contamination probe) — one
    *     projection, plus the md5 text digest and a 32-hash MinHash
    *     signature computed map-side (array lambdas — no explode, no
    *     shuffle).
    *  2. EXACT stage: [[ExactClaimProcessor]] keyed by the digest — the
    *     LABELING twin of [[dedupWithinWatermark]]: the first arrival
    *     claims the digest and keeps its verdict, every later copy is
    *     emitted labeled `exact` (dropDuplicatesWithinWatermark would
    *     silently drop them; a funnel must account). Bounded state via
    *     native TWS TTL, the [[TransitionProcessor]] dimension.
    *  3. NEAR-DUP probe: each surviving doc fans out to 8 LSH bands
    *     (4 signature hashes each); [[BandClaimProcessor]] keyed by
    *     (band, band-hash) lets the first doc claim the bucket with its
    *     full signature, and flags any later collider whose
    *     signature-estimated Jaccard (matching positions / 32) ≥ 1/2 —
    *     state per bucket is one doc_id + 32 longs, never a shingle set.
    *
    * Output: per-doc verdict rows (band = −1) plus `neardup` flag rows
    * (band = k) for flagged colliders; the consumer's reduction is
    * "any neardup row overrides the doc's verdict row" with the batch
    * precedence quality > exact > neardup > contam > kept (the split-feed
    * spec pins label-for-label parity against `docs_pipeline_full` on the
    * planted-family corpus). Arrival order is canonical order — feed in
    * doc_id order to reproduce the batch's min-id canonicals. At 100 TB/
    * day the stateless stages ride the ingest map stage; the two keyed
    * stages shuffle once each on model-free keys with TTL-bounded
    * stores. */
  def ingestFunnelFullStream(docs: DataFrame, filterWords: Seq[Long],
      bucketWeights: Seq[Double], mBits: Int = 65536,
      ttl: java.time.Duration = null): Dataset[FunnelRow] = {
    import docs.sparkSession.implicits._
    val afterExact = funnelStagedDocs(docs, filterWords, bucketWeights, mBits)
      .groupByKey(_.digest)
      .transformWithState(new ExactClaimProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
    afterExact
      .flatMap { d =>
        // verdict rows key on the doc id itself — unique per doc, so the
        // passthrough branch never concentrates on one hot key
        val base = BandRow(d.doc_id, d.source, d.stage0, -1,
          d.doc_id.toString, Seq.empty)
        if (d.stage0 == "quality" || d.stage0 == "exact" || d.sig.isEmpty)
          Seq(base)
        else base +: (0 until 8).map { b =>
          val bkey = d.sig.slice(b * 4, b * 4 + 4).mkString(",")
          BandRow(d.doc_id, d.source, d.stage0, b, bkey, d.sig)
        }
      }
      .groupByKey(r => (r.band, r.bkey))
      .transformWithState(new BandClaimProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Streaming CUSUM change-point monitor — the in-flight twin of the batch
    * `ev_changepoint`, in ship-the-model form: the batch run publishes each
    * type's mean hourly rate (the CUSUM reference k — a \|types\|-sized
    * model), the stream tracks Page's statistic against it live. Per-type
    * state is O(1) FOREVER: the open hour's count plus the (prefix sum,
    * running min, max drift, drift hour, closed hours) tuple — never a
    * series. An hour closes when a later-hour event of the same type
    * arrives, so the closed-hour universe is exactly the batch operator's
    * (which excludes each type's trailing open hour) and the parity spec
    * pins the final emission equal to the batch row. Emits the refreshed
    * verdict per batch (update semantics downstream). */
  def cusumStream(events: Dataset[StreamEvent],
      refMeans: Map[String, Long]): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, it: Iterator[StreamEvent], state: GroupState[CusumState]) =>
          val ref = refMeans.getOrElse(typ, 0L)
          var s = state.getOption.orNull
          def closeHour(): Unit = {
            val p = s.p + s.cnt - ref
            val runmin = math.min(s.runmin, p)
            val drift = p - runmin
            val (md, dh) =
              if (drift > s.maxDrift) (drift, s.openHour)
              else (s.maxDrift, s.driftHour)
            s = CusumState(s.openHour, 0L, p, runmin, md, dh, s.nClosed + 1)
          }
          it.toSeq.sortBy(e => usOf(e.ts)).foreach { e =>
            val h = e.ts.getTime / 3600000L
            s match {
              // maxDrift starts at −1 so the FIRST closed hour claims the
              // all-zero-drift tie — the batch lexicographic [drift, −hour]
              // max resolves the same way (earliest hour)
              case null => s = CusumState(h, 1L, 0L, Long.MaxValue, -1L, -1L, 0L)
              case st if h == st.openHour => s = st.copy(cnt = st.cnt + 1)
              case _ =>
                closeHour()
                s = s.copy(openHour = h, cnt = 1L)
            }
          }
          state.update(s)
          Iterator.single(CusumPoint(typ, s.nClosed, s.maxDrift, s.driftHour))
      }
  }

  /** [[cusumStream]] on Spark 4's `transformWithState` — the CUSUM
    * change-point monitor's 7-long state tuple in a typed `ValueState`,
    * same hour-close fold and first-hour tie rule as the fMGWS form
    * (re-implemented, parity-spec-pinned across a mid-stream split on
    * RocksDB including an hour spanning the boundary). The modern-API
    * migration row for the drift family. */
  def cusumStreamTws(events: Dataset[StreamEvent],
      refMeans: Map[String, Long]): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(refMeans),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Native bounded-state streaming dedup — Spark's
    * `dropDuplicatesWithinWatermark`: duplicates of an event id arriving
    * within the watermark delay are dropped, and state for ids older than
    * the watermark is RECLAIMED — the production form of [[dedupById]]
    * (whose keep-forever key set grows without bound on an infinite
    * stream). The reference connector forwards each SSE event id at most
    * once per reconnect window; this is that guarantee with bounded
    * state. */
  def dedupWithinWatermark(events: DataFrame,
      lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming bitmap exact-distinct (`StreamOps.bitmapDistinctStream`) —
    * the in-flight twin of batch `ev_bitmap_distinct`: per (day, type)
    * the state is the word→bits map of the 62-bit user bitmap — bounded
    * by ⌈users/62⌉ per key, 62× smaller than the user set a naive
    * streaming countDistinct would hold, and the merge is pure `bit_or`
    * (idempotent: replayed events cannot double-count, unlike a counter).
    * Emits the refreshed popcount per batch; the parity spec pins the
    * final emission per cell equal to the batch operator's exact count
    * after a split feed.
    *
    * FINALIZED cells are evicted: each (day, type) bitmap is the heaviest
    * state in the library (O(users/62) longs per cell) and day keys would
    * otherwise accrete forever. Once the watermark passes the cell's day
    * end, no on-time event can still land in it — the event-time timeout
    * emits the cell's FINAL popcount once more and drops the bitmap, so
    * steady-state store size is O(open days × types), never O(history).
    * The timeout fires at max(day end, watermark + 1): a cell first
    * touched by a late-but-in-watermark event whose day already closed
    * finalizes on the next watermark advance.
    *
    * BEHAVIOR CONTRACT (same as [[ohlcStream]]): the watermark DROPS
    * events later than `lateness` (they are silently absent from the
    * count — set the lateness from measured disorder), and append output
    * carries BOTH per-batch refreshed counts and the timer's final row
    * per cell — consumers keep the latest emission per (day, type). */
  def bitmapDistinctStream(events: Dataset[StreamEvent],
      lateness: String = "1 hour"): Dataset[BitmapCell] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(e => (e.ts.getTime / 86400000L, e.event_type))
      .flatMapGroupsWithState[Map[Long, Long], BitmapCell](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, String), it: Iterator[StreamEvent],
         state: GroupState[Map[Long, Long]]) =>
          if (state.hasTimedOut) {
            val m = state.get
            state.remove()
            val distinct = m.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum
            Iterator.single(BitmapCell(key._1, key._2, m.size.toLong, distinct))
          } else {
            var m = state.getOption.getOrElse(Map.empty[Long, Long])
            it.foreach { e =>
              val w = e.user_id / 62
              m = m.updated(w, m.getOrElse(w, 0L) | (1L << (e.user_id % 62).toInt))
            }
            state.update(m)
            state.setTimeoutTimestamp(math.max((key._1 + 1L) * 86400000L,
              state.getCurrentWatermarkMs() + 1L))
            val distinct = m.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum
            Iterator.single(BitmapCell(key._1, key._2, m.size.toLong, distinct))
          }
      }
  }

  /** [[bitmapDistinctStream]] on Spark 4's `transformWithState` — the
    * modern-API migration applied to the operator that stresses the state
    * store MOST: the per-cell bitmap is the library's heaviest state
    * (O(users/62) longs per (day, type)), and the fMGWS form re-serializes
    * the WHOLE word map on every update because the legacy API holds one
    * opaque state value per key. Here the bitmap lives in a TWS
    * `MapState[word → bits]` — RocksDB persists each word as its own
    * store entry, so a batch that touches w words writes w entries, not
    * the whole map — and the (n_words, distinct) pair rides a separate
    * `ValueState` updated INCREMENTALLY as bits first appear, so emitting
    * a refreshed count never scans the map (the fMGWS twin popcounts the
    * full map per batch). Finalized-cell eviction keeps the fMGWS twin's
    * exact rule via an event-time TIMER re-armed at
    * max(day end, watermark + 1) (the [[Scd2Processor]] one-timer-per-key
    * pattern): when it fires, the cell emits its final count once more
    * and ALL three state variables clear. Same behavior contract as
    * [[bitmapDistinctStream]] (late events beyond `lateness` are dropped;
    * append output needs latest-emission-per-cell); parity + eviction +
    * checkpointed-restart specs pin it on RocksDB. */
  def bitmapDistinctStreamTws(events: Dataset[StreamEvent],
      lateness: String = "1 hour"): Dataset[BitmapCell] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(e => (e.ts.getTime / 86400000L, e.event_type))
      .transformWithState(new BitmapDistinctProcessor(),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming gap-octave monitor — the in-flight twin of the batch
    * `ev_gap_histogram`, BY COMPOSITION: [[transitionStream]] already
    * carries every per-user dwell gap (O(1) last-event state), so the
    * octave view is a stateless projection on its output — the same
    * `length(bin(gap_s + 1))` bucketing as the batch SQL; a downstream
    * streaming agg keeps the live histogram. Parity spec pins per
    * (type, bucket) counts equal to the batch operator across a
    * mid-stream split. */
  def gapOctaveStream(events: Dataset[ChangeEvent]): DataFrame =
    transitionStream(events).toDF()
      .select(col("to_type").as("event_type"),
        length(bin(expr("gap_us div 1000000 + 1"))).cast("long").as("bucket"))

  /** The transition monitor on Spark 4's `transformWithState` API — the
    * SAME semantics as [[transitionStream]] (O(1) last-event state per
    * user, one edge emitted per arriving event) expressed as a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]] with a typed
    * `ValueState`: the modern stateful-processing surface (RocksDB state
    * store, state TTL, timers, state-variable evolution) the fMGWS API
    * predates. Kept beside the fMGWS form deliberately — the parity spec
    * pins both to the batch operator, proving the engine-level migration
    * path leaves results bit-identical. Requires the RocksDB state-store
    * provider (TWS rejects the default HDFS-backed store).
    *
    * A non-null `ttl` (processing-time, the TTL dimension TWS natively
    * supports) bounds the key set: the store expires a user's `last` value
    * `ttl` after its final update, after which their next event opens a
    * fresh chain (no edge) — same re-admission semantics as the fMGWS
    * twin's event-time eviction, enforced by the ENGINE instead of user
    * code. TTL requires `TimeMode.ProcessingTime`, under which the engine
    * keeps scheduling timer micro-batches even with no data — correct on a
    * production trigger, but it never settles under `processAllAvailable`,
    * so the TTL spec drives it with `Trigger.AvailableNow` restarts over a
    * shared checkpoint; `ttl = null` keeps the timer-free `TimeMode.None`
    * plan for always-on parity twins. */
  def transitionStreamTws(events: Dataset[ChangeEvent],
      ttl: java.time.Duration = null): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == null) org.apache.spark.sql.streaming.TimeMode.None()
      else org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor(ttl), mode, OutputMode.Append())
  }

  /** STATE-EVOLUTION twin of [[transitionStreamTws]] — the processor a team
    * deploys as an UPGRADE against a checkpoint the V1 processor has been
    * writing: the `last` state variable's class gains a cumulative edge
    * counter ([[LastEventV2]] adds `n_edges: Option[Long]` — nullable, the
    * Avro-evolvable shape). Restarting the same checkpoint under the new
    * schema is legal only when the state store was created with the Avro
    * encoding (`spark.sql.streaming.stateStore.encodingFormat=avro`, set
    * BEFORE the first run; the default UnsafeRow encoding pins the state
    * schema for the checkpoint's lifetime): on read, Avro schema evolution
    * fills the added field with null, the processor treats None as "counter
    * starts now", and V1-written last-events still chain — no edge is lost
    * across the upgrade. Output adds `cum_edges` so the evolved field is
    * observable downstream. The spec drives the actual operational
    * sequence: run V1 → stop → resume V2 on the same checkpoint. */
  def transitionStreamTwsV2(events: Dataset[ChangeEvent]): Dataset[TransitionV2] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessorV2,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** WARM-START twin of [[transitionStreamTws]] — the batch→streaming
    * cutover: the per-user `last` state is seeded from a batch snapshot
    * (each user's final event in the history table, one [[UserLastEvent]]
    * row per user) through TWS's initial-state surface
    * ([[org.apache.spark.sql.streaming.StatefulProcessorWithInitialState]]
    * .handleInitialState, invoked once per snapshot key on the FIRST
    * micro-batch), so a migrated user's first streamed event chains off
    * their batch-era last event instead of opening a cold chain — no edge
    * is lost at the cutover, and the history table never replays. The
    * snapshot is a keyed Dataset: at scale it shuffles once into the
    * store's own partitioning, never through the driver. */
  def transitionStreamTwsWarm(events: Dataset[ChangeEvent],
      snapshot: Dataset[UserLastEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessorWarm,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append(),
        snapshot.groupByKey(_.user_id))
  }

  /** Streaming Markov-transition monitor — the in-flight twin of the batch
    * `ev_transition_matrix`: per-user state is the LAST event only (type +
    * epoch-µs — O(1) per user, the streaming form of the batch query's
    * per-user lag window), and each arriving event emits its (from → to)
    * edge with the dwell gap immediately (append mode). Downstream a plain
    * streaming agg keeps the live transition-count/gap-sum matrix; the
    * parity spec pins per-edge counts AND µs gap sums against the batch
    * operator across a mid-stream batch split, so state provably carries
    * last-event context over batch boundaries. Same per-key in-order
    * assumption as [[scd2Stream]]/[[funnel]].
    *
    * Event-time TTL bounds the key set: a user silent for `ttlHours`
    * (default 90 days) is evicted, so their NEXT event opens a fresh chain
    * and emits no edge — a dwell gap longer than the TTL is a return
    * visit, not a transition, so the drop is the analytically-intended
    * cut, and state stays O(recently-active users) forever. */
  def transitionStream(events: Dataset[ChangeEvent],
      lateness: String = "1 hour",
      ttlHours: Long = 2160L): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val ttlMs = ttlHours * 3600000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[ChangeEvent], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          def us(e: ChangeEvent): Long = usOf(e.ts)
          var s = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          // full-µs tiebreak: the batch twin's lag window orders by
          // (ts, event_id) at µs granularity; sorting on getTime (ms)
          // would flip same-ms pairs whose id order differs from µs order
          it.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
            val t = us(e)
            if (s != null)
              out += Transition(uid, s.event_type, e.event_type, t - s.us)
            s = LastEvent(e.event_type, t)
          }
          if (s != null) {
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.us / 1000L, state.getCurrentWatermarkMs() + 1L) + ttlMs)
          }
          out.iterator
          }
      }
  }
}

/** One (day, type) cell's refreshed exact-distinct count, emitted per
  * batch by [[StreamOps.bitmapDistinctStream]]. */
case class BitmapCell(day: Long, event_type: String, n_words: Long,
    distinct_users: Long)

/** CUSUM monitor state per event type — O(1) forever: the open hour plus
  * the running (prefix sum, min, max drift) triple. */
private case class CusumState(openHour: Long, cnt: Long, p: Long,
    runmin: Long, maxDrift: Long, driftHour: Long, nClosed: Long)

/** The refreshed change-point verdict for one type, emitted per batch by
  * [[StreamOps.cusumStream]]. */
case class CusumPoint(event_type: String, n_hours: Long, max_drift: Long,
    drift_hour: Long)

/** One (from → to) edge with its dwell gap, emitted per arriving event by
  * [[StreamOps.transitionStream]]. */
case class Transition(user_id: Long, from_type: String, to_type: String,
    gap_us: Long)

/** [[StreamOps.transitionStreamTws]]'s typed processor: per-user
  * `ValueState[LastEvent]` on the new stateful API, with engine-enforced
  * processing-time TTL so the key set never grows unbounded. */
class TransitionProcessor(ttl: java.time.Duration = null)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChangeEvent, Transition] {
  import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
  @transient private var last: ValueState[LastEvent] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    last = getHandle.getValueState[LastEvent]("last",
      org.apache.spark.sql.Encoders.product[LastEvent],
      if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

  override def handleInputRows(uid: Long, rows: Iterator[ChangeEvent],
      timers: TimerValues): Iterator[Transition] = {
    def us(e: ChangeEvent): Long = StreamOps.usOf(e.ts)
    var s = if (last.exists()) last.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    // µs-granularity sort — must match the batch lag window's (ts, id)
    // ordering exactly (getTime alone is ms-truncated)
    rows.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
      val t = us(e)
      if (s != null) out += Transition(uid, s.event_type, e.event_type, t - s.us)
      s = LastEvent(e.event_type, t)
    }
    last.update(s)
    out.iterator
  }
}

/** Last-seen event per user — O(1) state for
  * [[StreamOps.transitionStream]]. */
private case class LastEvent(event_type: String, us: Long)

/** [[StreamOps.transitionStreamTwsV2]]'s upgraded processor: identical
  * transition semantics, but the state carries a per-user cumulative edge
  * counter. Reads V1-written [[LastEvent]] rows through Avro schema
  * evolution (the added field arrives as None) — the state-variable name
  * ("last") and key type must match V1 exactly; only the value class
  * evolves. */
class TransitionProcessorV2
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChangeEvent, TransitionV2] {
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var last: ValueState[LastEventV2] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    last = getHandle.getValueState[LastEventV2]("last",
      org.apache.spark.sql.Encoders.product[LastEventV2], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[ChangeEvent],
      timers: TimerValues): Iterator[TransitionV2] = {
    def us(e: ChangeEvent): Long = StreamOps.usOf(e.ts)
    var s = if (last.exists()) last.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[TransitionV2]
    rows.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
      val t = us(e)
      if (s != null) {
        // a V1-written value surfaces with n_edges = None: the counter
        // begins at the upgrade, the chain itself is preserved
        val n = s.n_edges.getOrElse(0L) + 1
        out += TransitionV2(uid, s.event_type, e.event_type, t - s.us, n)
        s = LastEventV2(e.event_type, t, Some(n))
      } else s = LastEventV2(e.event_type, t, Some(0L))
    }
    last.update(s)
    out.iterator
  }
}

/** [[StreamOps.transitionStreamTwsWarm]]'s processor: [[TransitionProcessor]]
  * semantics with the initial-state hook — each snapshot row seeds the
  * user's `last` value before any streamed batch runs. Streamed rows that
  * RACE the snapshot (same first batch) still order correctly because
  * handleInitialState runs before handleInputRows for a key. */
class TransitionProcessorWarm
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, ChangeEvent, Transition, UserLastEvent] {
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var last: ValueState[LastEvent] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    last = getHandle.getValueState[LastEvent]("last",
      org.apache.spark.sql.Encoders.product[LastEvent], TTLConfig.NONE)

  override def handleInitialState(uid: Long, initial: UserLastEvent,
      timers: TimerValues): Unit =
    last.update(LastEvent(initial.event_type, initial.us))

  override def handleInputRows(uid: Long, rows: Iterator[ChangeEvent],
      timers: TimerValues): Iterator[Transition] = {
    def us(e: ChangeEvent): Long = StreamOps.usOf(e.ts)
    var s = if (last.exists()) last.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    rows.toSeq.sortBy(e => (us(e), e.event_id)).foreach { e =>
      val t = us(e)
      if (s != null) out += Transition(uid, s.event_type, e.event_type, t - s.us)
      s = LastEvent(e.event_type, t)
    }
    last.update(s)
    out.iterator
  }
}

/** One user's final batch-era event — the snapshot row type seeding
  * [[StreamOps.transitionStreamTwsWarm]]. */
case class UserLastEvent(user_id: Long, event_type: String, us: Long)

/** V2 of [[LastEvent]]: the added counter is `Option[Long]` (nullable →
  * an Avro union with a null default), the shape state-schema evolution
  * accepts; a bare `Long` would be a required Avro field with no default
  * and the restart would be rejected. */
private case class LastEventV2(event_type: String, us: Long,
    n_edges: Option[Long])

/** One (from → to) edge plus the user's post-upgrade cumulative edge
  * count, emitted by [[StreamOps.transitionStreamTwsV2]]. */
case class TransitionV2(user_id: Long, from_type: String, to_type: String,
    gap_us: Long, cum_edges: Long)

/** [[StreamOps.scd2StreamTws]]'s typed processor: per-user
  * `ValueState[Scd2State]` plus an event-time flush TIMER — the engine
  * fires [[handleExpiredTimer]] when the watermark passes last-evidence +
  * TTL, emitting the dormancy-flushed interval exactly like the fMGWS
  * twin's `hasTimedOut` branch. One timer per key: each batch deletes the
  * previously-armed instant (tracked in its own `ValueState`) before
  * re-arming, so dormant keys carry exactly one pending flush. */
/** [[StreamOps.ingestFunnelFullStream]]'s EXACT stage: keyed by the md5
  * text digest, the first arrival (in doc_id order within a batch — feed
  * order across batches) claims the digest and keeps its stateless
  * verdict; every later copy is re-labeled `exact`. The LABELING twin of
  * [[StreamOps.dedupWithinWatermark]] — same bounded-state contract, but
  * dropped copies are emitted with their verdict instead of vanishing
  * (a funnel must account). Quality-failed docs pass through without
  * claiming (the batch funnel dedups quality survivors only). State is
  * one long per live digest, TTL-bounded (native TWS TTL — the
  * [[TransitionProcessor]] dimension). */
class ExactClaimProcessor(ttl: java.time.Duration = null)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StagedDoc, StagedDoc] {
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var claimed: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    claimed = getHandle.getValueState[Long]("claimed",
      org.apache.spark.sql.Encoders.scalaLong,
      if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

  override def handleInputRows(digest: String, rows: Iterator[StagedDoc],
      timers: TimerValues): Iterator[StagedDoc] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[StagedDoc]
    rows.toSeq.sortBy(_.doc_id).foreach { d =>
      if (d.stage0 == "quality") out += d
      else if (!claimed.exists()) { claimed.update(d.doc_id); out += d }
      else if (claimed.get() == d.doc_id) out += d // replay-idempotent
      else out += d.copy(stage0 = "exact")
    }
    out.iterator
  }
}

/** [[StreamOps.ingestFunnelFullStream]]'s NEAR-DUP probe: keyed by
  * (band, band-hash), the first doc claims the bucket with its full
  * 32-hash MinHash signature; a later collider whose signature-estimated
  * Jaccard (matching positions / 32) ≥ 1/2 is flagged with a `neardup`
  * row. Bucket state is one doc_id + 32 longs — never a shingle set —
  * TTL-bounded. Verdict rows (band = −1, key unique per doc) pass
  * through stateless. */
class BandClaimProcessor(ttl: java.time.Duration = null)
    extends org.apache.spark.sql.streaming.StatefulProcessor[(Int, String), BandRow, FunnelRow] {
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var claim: ValueState[BandClaim] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    claim = getHandle.getValueState[BandClaim]("claim",
      org.apache.spark.sql.Encoders.product[BandClaim],
      if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

  override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
      timers: TimerValues): Iterator[FunnelRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelRow]
    if (key._1 == -1)
      rows.foreach(r => out += FunnelRow(r.doc_id, r.source, r.stage, -1))
    else rows.toSeq.sortBy(_.doc_id).foreach { r =>
      if (!claim.exists()) claim.update(BandClaim(r.doc_id, r.sig))
      else {
        val c = claim.get()
        if (c.doc_id != r.doc_id) {
          val matches = c.sig.zip(r.sig).count { case (a, b) => a == b }
          if (matches * 2 >= 32)
            out += FunnelRow(r.doc_id, r.source, "neardup", key._1)
        }
      }
    }
    out.iterator
  }
}

/** [[StreamOps.sessionizeTws]]'s typed processor: the gap session as one
  * TWS `ValueState` per user plus the [[Scd2Processor]] one-timer-per-key
  * close pattern — the timer re-arms at (⌊last-µs⌋ + gap + 1) s on every
  * batch that touches the user, and fires (emitting the closed session and
  * clearing the state) once the watermark proves no event can merge. */
class SessionProcessor(gapSec: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, StreamEvent, Session] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimerValues, ValueState}
  @transient private var cur: ValueState[SessionState] = _
  @transient private var armedAt: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    cur = getHandle.getValueState[SessionState]("session",
      org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    armedAt = getHandle.getValueState[Long]("armedAt",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(uid: Long, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[Session] = {
    var s = if (cur.exists()) cur.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    rows.toSeq.sortBy(e => StreamOps.usOf(e.ts)).foreach { e =>
      val t = StreamOps.usOf(e.ts)
      s match {
        case null => s = SessionState(1L, e.value, t, t)
        case st if Math.floorDiv(t, 1000000L) -
            Math.floorDiv(st.last, 1000000L) <= gapSec =>
          s = SessionState(st.n + 1, st.sum + e.value, st.start, math.max(st.last, t))
        case st => // gap exceeded: close previous, open new
          out += Session(uid, st.n, st.sum,
            StreamOps.tsOfUs(st.start), StreamOps.tsOfUs(st.last))
          s = SessionState(1L, e.value, t, t)
      }
    }
    if (s != null) {
      cur.update(s)
      if (armedAt.exists()) getHandle.deleteTimer(armedAt.get())
      val at = (Math.floorDiv(s.last, 1000000L) + gapSec + 1L) * 1000L
      getHandle.registerTimer(at)
      armedAt.update(at)
    }
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Session] = {
    if (!cur.exists()) { armedAt.clear(); Iterator.empty }
    else {
      val st = cur.get()
      cur.clear()
      armedAt.clear()
      Iterator.single(Session(uid, st.n, st.sum,
        StreamOps.tsOfUs(st.start), StreamOps.tsOfUs(st.last)))
    }
  }
}

class Scd2Processor(ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChangeEvent, Scd2Interval] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}
  @transient private var open: ValueState[Scd2State] = _
  @transient private var armedAt: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    open = getHandle.getValueState[Scd2State]("open",
      org.apache.spark.sql.Encoders.product[Scd2State], TTLConfig.NONE)
    armedAt = getHandle.getValueState[Long]("armedAt",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(uid: Long, rows: Iterator[ChangeEvent],
      timers: TimerValues): Iterator[Scd2Interval] = {
    var s = if (open.exists()) open.get() else null
    val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Interval]
    var lastMs = Long.MinValue
    // µs sort — the batch window orders by (true-µs ts, event_id)
    rows.toSeq.sortBy(e => (StreamOps.usOf(e.ts), e.event_id)).foreach { e =>
      val t = StreamOps.usOf(e.ts) / 1000000L
      lastMs = math.max(lastMs, e.ts.getTime)
      s match {
        case null =>
          s = Scd2State(1L, e.event_type, 1L, t, t)
        case st if st.status == e.event_type =>
          s = st.copy(n = st.n + 1, last = math.max(st.last, t))
        case st =>
          out += Scd2Interval(uid, st.version, st.status, st.n, st.from, t)
          s = Scd2State(st.version + 1L, e.event_type, 1L, t, t)
      }
    }
    if (s != null) {
      open.update(s)
      if (armedAt.exists()) getHandle.deleteTimer(armedAt.get())
      val at = math.max(lastMs, timers.getCurrentWatermarkInMs() + 1L) + ttlMs
      getHandle.registerTimer(at)
      armedAt.update(at)
    }
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Scd2Interval] = {
    if (!open.exists()) { armedAt.clear(); Iterator.empty }
    else {
      val st = open.get()
      open.clear()
      armedAt.clear()
      Iterator.single(Scd2Interval(uid, st.version, st.status, st.n, st.from, st.last))
    }
  }
}

/** [[StreamOps.bitmapDistinctStreamTws]]'s typed processor: the exact-
  * distinct bitmap as a TWS `MapState[word → bits]` (per-word RocksDB
  * entries — an update touches only its word), incrementally-maintained
  * (n_words, distinct) counters in a `ValueState` (emissions never scan
  * the map), and the [[Scd2Processor]] one-timer-per-key eviction pattern
  * firing at max(day end, watermark + 1). */
class BitmapDistinctProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, String), StreamEvent, BitmapCell] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, TTLConfig, TimerValues, ValueState}
  @transient private var words: MapState[Long, Long] = _
  @transient private var counts: ValueState[(Long, Long)] = _
  @transient private var armedAt: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    words = getHandle.getMapState[Long, Long]("words",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    counts = getHandle.getValueState[(Long, Long)]("counts",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    armedAt = getHandle.getValueState[Long]("armedAt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: (Long, String), rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[BitmapCell] = {
    var (nw, dist) = if (counts.exists()) counts.get() else (0L, 0L)
    rows.foreach { e =>
      val w = e.user_id / 62
      val bit = 1L << (e.user_id % 62).toInt
      if (words.containsKey(w)) {
        val cur = words.getValue(w)
        if ((cur & bit) == 0L) { words.updateValue(w, cur | bit); dist += 1 }
      } else { words.updateValue(w, bit); nw += 1; dist += 1 }
    }
    counts.update((nw, dist))
    if (armedAt.exists()) getHandle.deleteTimer(armedAt.get())
    val at = math.max((key._1 + 1L) * 86400000L,
      timers.getCurrentWatermarkInMs() + 1L)
    getHandle.registerTimer(at)
    armedAt.update(at)
    Iterator.single(BitmapCell(key._1, key._2, nw, dist))
  }

  override def handleExpiredTimer(key: (Long, String), timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[BitmapCell] = {
    if (!counts.exists()) { armedAt.clear(); words.clear(); Iterator.empty }
    else {
      val (nw, dist) = counts.get()
      words.clear(); counts.clear(); armedAt.clear()
      Iterator.single(BitmapCell(key._1, key._2, nw, dist))
    }
  }
}

/** [[StreamOps.ohlcStreamTws]]'s typed processor: the hourly bar in a
  * `ValueState[OhlcState]` (true-µs + event_id argmin/argmax open/close
  * keys carried in the state, exactly like the fMGWS twin) with the
  * one-timer-per-key finalize-and-drop eviction pattern. */
class OhlcProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Tick, OhlcBar] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimerValues, ValueState}
  @transient private var bar: ValueState[OhlcState] = _
  @transient private var armedAt: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    bar = getHandle.getValueState[OhlcState]("bar",
      Encoders.product[OhlcState], TTLConfig.NONE)
    armedAt = getHandle.getValueState[Long]("armedAt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(hour: Long, rows: Iterator[Tick],
      timers: TimerValues): Iterator[OhlcBar] = {
    var s = if (bar.exists()) bar.get() else null
    rows.foreach { t =>
      val us = StreamOps.usOf(t.ts)
      val cents = math.floor(t.value * 100 + 0.5).toLong
      s = if (s == null)
        OhlcState(us, t.event_id, cents, cents, cents, us, t.event_id, cents, 1L, cents)
      else {
        val earlier = us < s.openUs || (us == s.openUs && t.event_id < s.openId)
        val later = us > s.closeUs || (us == s.closeUs && t.event_id > s.closeId)
        val o = if (earlier) (us, t.event_id, cents) else (s.openUs, s.openId, s.open)
        val c = if (later) (us, t.event_id, cents) else (s.closeUs, s.closeId, s.close)
        OhlcState(o._1, o._2, o._3, math.max(s.high, cents), math.min(s.low, cents),
          c._1, c._2, c._3, s.n + 1L, s.vol + cents)
      }
    }
    if (s == null) Iterator.empty
    else {
      bar.update(s)
      if (armedAt.exists()) getHandle.deleteTimer(armedAt.get())
      val at = math.max((hour + 3600L) * 1000L,
        timers.getCurrentWatermarkInMs() + 1L)
      getHandle.registerTimer(at)
      armedAt.update(at)
      Iterator.single(OhlcBar(hour, s.n, s.open, s.high, s.low, s.close, s.vol))
    }
  }

  override def handleExpiredTimer(hour: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[OhlcBar] = {
    if (!bar.exists()) { armedAt.clear(); Iterator.empty }
    else {
      val st = bar.get()
      bar.clear(); armedAt.clear()
      Iterator.single(OhlcBar(hour, st.n, st.open, st.high, st.low, st.close, st.vol))
    }
  }
}

/** [[StreamOps.funnelTws]]'s typed processor: step times in an
  * append-only `ListState[Long]`, the done flag in a `ValueState`, and
  * the dormancy TTL on an engine event-time timer (one per key) whose
  * expiry clears everything — the ListState showcase beside
  * [[Scd2Processor]]'s ValueState+timer and
  * [[BitmapDistinctProcessor]]'s MapState. */
class FunnelProcessor(steps: Seq[String], ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, StreamEvent, Conversion] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TTLConfig, TimerValues, ValueState}
  @transient private var times: ListState[Long] = _
  @transient private var done: ValueState[Boolean] = _
  @transient private var armedAt: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    times = getHandle.getListState[Long]("times",
      Encoders.scalaLong, TTLConfig.NONE)
    done = getHandle.getValueState[Boolean]("done",
      Encoders.scalaBoolean, TTLConfig.NONE)
    armedAt = getHandle.getValueState[Long]("armedAt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(uid: Long, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[Conversion] = {
    var ts = times.get().toSeq
    var isDone = done.exists() && done.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
    var lastMs = Long.MinValue
    // same true-µs + step-index ordering and at-or-after chain as the
    // fMGWS twin (ties: a step sorts AFTER its predecessor)
    rows.toSeq.sortBy(e => (StreamOps.usOf(e.ts), steps.indexOf(e.event_type)))
      .foreach { e =>
        lastMs = math.max(lastMs, e.ts.getTime)
        if (!isDone) {
          val idx = ts.length
          val us = StreamOps.usOf(e.ts)
          if (idx < steps.length && e.event_type == steps(idx) &&
            (ts.isEmpty || us >= ts.last)) {
            times.appendValue(us) // per-entry append, not a re-serialize
            ts = ts :+ us
            if (ts.length == steps.length) {
              isDone = true
              out += Conversion(uid, StreamOps.tsOfUs(ts.head),
                StreamOps.tsOfUs(ts.last), (ts.last - ts.head) / 1000L)
            }
          }
        }
      }
    done.update(isDone)
    if (armedAt.exists()) getHandle.deleteTimer(armedAt.get())
    val at = math.max(lastMs, timers.getCurrentWatermarkInMs() + 1L) + ttlMs
    getHandle.registerTimer(at)
    armedAt.update(at)
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Conversion] = {
    times.clear(); done.clear(); armedAt.clear()
    Iterator.empty
  }
}

/** [[StreamOps.attributionStreamTws]]'s typed processor: the (last click,
  * last view) µs pair in a `ValueState[TouchState]`, horizon eviction on
  * an engine event-time timer (armed exactly where the fMGWS twin set its
  * timeout — max(last event, watermark + 1) + lookback). */
class AttributionProcessor(lookbackHours: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChangeEvent, Attribution] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimerValues, ValueState}
  private val horizonUs = lookbackHours * 3600L * 1000000L
  private val horizonMs = lookbackHours * 3600000L
  @transient private var touch: ValueState[TouchState] = _
  @transient private var armedAt: ValueState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    touch = getHandle.getValueState[TouchState]("touch",
      Encoders.product[TouchState], TTLConfig.NONE)
    armedAt = getHandle.getValueState[Long]("armedAt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(uid: Long, rows: Iterator[ChangeEvent],
      timers: TimerValues): Iterator[Attribution] = {
    var s = if (touch.exists()) touch.get() else TouchState(None, None)
    val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
    var lastMs = Long.MinValue
    rows.toSeq.sortBy(e => (StreamOps.usOf(e.ts), e.event_id)).foreach { e =>
      val us = StreamOps.usOf(e.ts)
      lastMs = math.max(lastMs, e.ts.getTime)
      e.event_type match {
        case "click" => s = s.copy(lastClickUs = Some(us))
        case "view" => s = s.copy(lastViewUs = Some(us))
        case "purchase" =>
          val channel = s match {
            case TouchState(Some(c), v) if us - c <= horizonUs &&
              v.forall(c >= _) => "click"
            case TouchState(_, Some(v)) if us - v <= horizonUs => "view"
            case _ => "none"
          }
          out += Attribution(uid, e.event_id, channel)
        case _ => ()
      }
    }
    touch.update(s)
    if (armedAt.exists()) getHandle.deleteTimer(armedAt.get())
    val at = math.max(lastMs, timers.getCurrentWatermarkInMs() + 1L) + horizonMs
    getHandle.registerTimer(at)
    armedAt.update(at)
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Attribution] = {
    touch.clear(); armedAt.clear()
    Iterator.empty
  }
}

/** [[StreamOps.anomaliesTws]]'s typed processor: Welford moments in one
  * `ValueState[TypeStats]`, emission before fold exactly as the fMGWS twin. */
class AnomalyProcessor(minN: Long, zThreshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, Anomaly] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var st: ValueState[TypeStats] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[TypeStats]("stats",
      Encoders.product[TypeStats], TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[Anomaly] = {
    var s = if (st.exists()) st.get() else TypeStats(0L, 0.0, 0.0)
    val out = scala.collection.mutable.ArrayBuffer.empty[Anomaly]
    rows.toSeq.sortBy(e => (StreamOps.usOf(e.ts), e.user_id, e.value)).foreach { e =>
      if (s.n >= minN) {
        val sd = math.sqrt(s.m2 / (s.n - 1).toDouble)
        if (sd > 0) {
          val z = (e.value - s.mean) / sd
          if (math.abs(z) >= zThreshold) out += Anomaly(typ, e.user_id, e.value, z, e.ts)
        }
      }
      val n1 = s.n + 1
      val d = e.value - s.mean
      val mean1 = s.mean + d / n1
      s = TypeStats(n1, mean1, s.m2 + d * (e.value - mean1))
    }
    st.update(s)
    out.iterator
  }
}

/** [[StreamOps.distinctSketchTws]]'s typed processor: the KMV sketch (k
  * smallest hashes) as one `ValueState` value. */
class KmvProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, DistinctEstimate] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var st: ValueState[KmvSketch] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[KmvSketch]("kmv",
      Encoders.product[KmvSketch], TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[DistinctEstimate] = {
    val prev = if (st.exists()) st.get().hashes else Seq.empty[Long]
    val merged = (prev.toSet ++ rows.map(e => StreamOps.hash31(e.user_id.toString)))
      .toSeq.sorted.take(k)
    st.update(KmvSketch(merged))
    val est =
      if (merged.size < k) merged.size.toLong
      else math.floor((k - 1).toDouble * 2147483647L / merged.max).toLong
    Iterator.single(DistinctEstimate(typ, est, merged.size))
  }
}

/** [[StreamOps.hllSketchTws]]'s typed processor: registers in a
  * `MapState[bucket → rho]`, written only when a batch RAISES one. */
class HllProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, HllEstimate] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimerValues}
  @transient private var regs: MapState[Int, Int] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    regs = getHandle.getMapState[Int, Int]("regs",
      Encoders.scalaInt, Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[HllEstimate] = {
    rows.foreach { e =>
      val h = StreamOps.hash60(e.user_id.toString)
      val b = (h % 64).toInt
      val w = h / 64
      val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val cur = if (regs.containsKey(b)) regs.getValue(b) else 0
      if (rho > cur) regs.updateValue(b, rho)
    }
    val r = Array.fill(64)(0)
    regs.iterator().foreach { case (b, v) => r(b) = v }
    val s = r.map(x => 1L << (55 - x)).sum
    val est = java.math.BigDecimal
      .valueOf(0.709 * 4096.0 * (1L << 55).toDouble / s)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    Iterator.single(HllEstimate(typ, est, r.count(_ > 0)))
  }
}

/** [[StreamOps.quantileSketchTws]]'s typed processor: log-linear buckets in
  * a `MapState[bucket → count]` (per-entry adds). */
class QuantileProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, QuantileEstimate] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimerValues}
  @transient private var buckets: MapState[Long, Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    buckets = getHandle.getMapState[Long, Long]("buckets",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[QuantileEstimate] = {
    rows.foreach { e =>
      val b = StreamOps.bucket31(e.value)
      val cur = if (buckets.containsKey(b)) buckets.getValue(b) else 0L
      buckets.updateValue(b, cur + 1L)
    }
    val m = buckets.iterator().map { case (b, c) => b -> c }.toMap
    val n = m.valuesIterator.sum
    Iterator.single(QuantileEstimate(typ, n, m.size,
      StreamOps.sketchQuantile(m, n, 0.50), StreamOps.sketchQuantile(m, n, 0.99)))
  }
}

/** [[StreamOps.countMinStreamTws]]'s typed processor: one hash row's
  * counters in a `MapState[bucket → count]` (≤ width entries). */
class CountMinProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Int, (Int, Int), CmRowState] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimerValues}
  @transient private var counters: MapState[Int, Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    counters = getHandle.getMapState[Int, Long]("counters",
      Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(j: Int, rows: Iterator[(Int, Int)],
      timers: TimerValues): Iterator[CmRowState] = {
    rows.foreach { case (_, b) =>
      val cur = if (counters.containsKey(b)) counters.getValue(b) else 0L
      counters.updateValue(b, cur + 1L)
    }
    Iterator.single(CmRowState(j,
      counters.iterator().map { case (b, c) => b -> c }.toMap))
  }
}

/** [[StreamOps.latenessMonitorTws]]'s typed processor: the O(1) lateness
  * tuple in one `ValueState[LateState]`. */
class LatenessProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, LatenessProfile] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var st: ValueState[LateState] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[LateState]("late",
      Encoders.product[LateState], TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[LatenessProfile] = {
    var s = if (st.exists()) st.get() else LateState(0L, 0L, 0L, Long.MinValue)
    rows.toSeq.sortBy(e => (StreamOps.usOf(e.ts), e.user_id)).foreach { e =>
      val t = e.ts.getTime
      if (t < s.runmax)
        s = s.copy(n = s.n + 1, nLate = s.nLate + 1,
          maxLateMs = math.max(s.maxLateMs, s.runmax - t))
      else s = s.copy(n = s.n + 1, runmax = t)
    }
    st.update(s)
    Iterator.single(LatenessProfile(typ, s.n, s.nLate,
      if (s.n == 0) 0.0
      else java.math.BigDecimal.valueOf(s.nLate.toDouble / s.n)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue(),
      s.maxLateMs))
  }
}

/** Carried EWMA taps for [[EwmaProcessor]] (≤ 4 ascending (hourSec, cnt)). */
private case class EwmaTaps(taps: Seq[(Long, Long)])

/** [[StreamOps.ewmaStreamTws]]'s typed processor: same in-batch unpruned
  * emission + trimmed carry semantics (and late-data contract) as the
  * fMGWS twin. */
class EwmaProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, EwmaPoint] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var st: ValueState[EwmaTaps] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[EwmaTaps]("taps",
      Encoders.product[EwmaTaps], TTLConfig.NONE)

  override def handleInputRows(et: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[EwmaPoint] = {
    var taps = if (st.exists()) st.get().taps else Seq.empty[(Long, Long)]
    val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
    rows.toSeq.sortBy(e => StreamOps.usOf(e.ts)).foreach { e =>
      val hour = e.ts.getTime / 3600000L * 3600L
      touched += hour
      taps.indexWhere(_._1 == hour) match {
        case -1 => taps = (taps :+ (hour, 1L)).sortBy(_._1)
        case i  => taps = taps.updated(i, (hour, taps(i)._2 + 1L))
      }
    }
    st.update(EwmaTaps(taps.takeRight(4)))
    val byHour = taps.map(_._1).zipWithIndex.toMap
    touched.iterator.flatMap { h =>
      byHour.get(h).map { i =>
        def tap(k: Int): Long = if (i - k >= 0) taps(i - k)._2 else 0L
        EwmaPoint(et, h, taps(i)._2,
          tap(0) * 8 + tap(1) * 4 + tap(2) * 2 + tap(3))
      }
    }
  }
}

/** [[StreamOps.burstStreamTws]]'s typed processor: closed-hour moments +
  * open hour in one `ValueState[BurstState]`, same integer 3σ verdict. */
class BurstProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, BurstVerdict] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var st: ValueState[BurstState] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[BurstState]("burst",
      Encoders.product[BurstState], TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[BurstVerdict] = {
    var s = if (st.exists()) st.get() else BurstState(0L, 0L, 0L, -1L, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[BurstVerdict]
    def close(): Unit = if (s.openHour >= 0) {
      val (n, x) = (s.n, s.openCnt)
      val devN = n * x - s.s1
      val burst = n > 0 && devN > 0 &&
        devN * devN > 9L * (n * s.s2 - s.s1 * s.s1)
      out += BurstVerdict(s.openHour, x, burst)
      s = BurstState(n + 1, s.s1 + x, s.s2 + x * x, -1L, 0L)
    }
    rows.toSeq.sortBy(e => StreamOps.usOf(e.ts)).foreach { e =>
      val hour = e.ts.getTime / 3600000L * 3600L
      if (hour != s.openHour) { close(); s = s.copy(openHour = hour, openCnt = 0L) }
      s = s.copy(openCnt = s.openCnt + 1L)
    }
    st.update(s)
    out.iterator
  }
}

/** [[StreamOps.schemaInferStreamTws]]'s typed processor: shape counts in a
  * `MapState[shape → count]` — one entry written per drifting shape. */
class SchemaInferProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, String), KeyShapeProfile] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimerValues}
  @transient private var shapes: MapState[String, Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    shapes = getHandle.getMapState[String, Long]("shapes",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, String)],
      timers: TimerValues): Iterator[KeyShapeProfile] = {
    rows.foreach { case (_, t) =>
      val cur = if (shapes.containsKey(t)) shapes.getValue(t) else 0L
      shapes.updateValue(t, cur + 1L)
    }
    Iterator.single(KeyShapeProfile(key,
      shapes.iterator().map { case (t, c) => t -> c }.toMap))
  }
}

/** [[StreamOps.heavyHittersTws]]'s typed processor: the Misra–Gries
  * counters in a `MapState[user → count]` (one RocksDB entry per tracked
  * user — the budget-full decrement is the only whole-map touch, bounded
  * by the sketch's k, never the stream's key cardinality) and the stream
  * length in a `ValueState`. Same per-batch (true-µs, user) arrival order
  * and [[StreamOps.mgUpdate]] fold as the fMGWS twin. */
class HeavyHittersProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, HeavyHittersProfile] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimerValues, ValueState}
  @transient private var n: ValueState[Long] = _
  @transient private var counters: MapState[Long, Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    n = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
    counters = getHandle.getMapState[Long, Long]("counters",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[HeavyHittersProfile] = {
    val before = counters.iterator().map { case (u, c) => u -> c }.toMap
    var m = before
    var nn = if (n.exists()) n.get() else 0L
    rows.toSeq.sortBy(e => (StreamOps.usOf(e.ts), e.user_id)).foreach { e =>
      nn += 1
      m = StreamOps.mgUpdate(m, k, e.user_id)
    }
    // write-back is diff-only: untouched counters cost no store write
    (before.keySet -- m.keySet).foreach(counters.removeKey)
    m.foreach { case (u, c) =>
      if (!before.get(u).contains(c)) counters.updateValue(u, c) }
    n.update(nn)
    val sorted = m.toSeq.sortBy { case (u, c) => (-c, u) }
    Iterator.single(HeavyHittersProfile(typ, nn, sorted.map(_._1), sorted.map(_._2)))
  }
}

/** [[StreamOps.cusumStreamTws]]'s typed processor: the CUSUM monitor's
  * O(1) 7-long state tuple in a `ValueState`, with the fMGWS twin's exact
  * hour-close fold (prefix sum − running min = drift; first closed hour
  * claims the all-zero tie via maxDrift = −1). */
class CusumProcessor(refMeans: Map[String, Long])
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, StreamEvent, CusumPoint] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
  @transient private var st: ValueState[CusumState] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[CusumState]("cusum",
      Encoders.product[CusumState], TTLConfig.NONE)

  override def handleInputRows(typ: String, rows: Iterator[StreamEvent],
      timers: TimerValues): Iterator[CusumPoint] = {
    val ref = refMeans.getOrElse(typ, 0L)
    var s = if (st.exists()) st.get() else null
    def closeHour(): Unit = {
      val p = s.p + s.cnt - ref
      val runmin = math.min(s.runmin, p)
      val drift = p - runmin
      val (md, dh) =
        if (drift > s.maxDrift) (drift, s.openHour)
        else (s.maxDrift, s.driftHour)
      s = CusumState(s.openHour, 0L, p, runmin, md, dh, s.nClosed + 1)
    }
    rows.toSeq.sortBy(e => StreamOps.usOf(e.ts)).foreach { e =>
      val h = e.ts.getTime / 3600000L
      s match {
        case null => s = CusumState(h, 1L, 0L, Long.MaxValue, -1L, -1L, 0L)
        case stv if h == stv.openHour => s = stv.copy(cnt = stv.cnt + 1)
        case _ =>
          closeHour()
          s = s.copy(openHour = h, cnt = 1L)
      }
    }
    st.update(s)
    Iterator.single(CusumPoint(typ, s.nClosed, s.maxDrift, s.driftHour))
  }
}

/** One smoothed traffic tap, emitted (and re-emitted as its hour
  * accumulates) by [[StreamOps.ewmaStream]]. */
case class EwmaPoint(event_type: String, hour_ts: Long, cnt: Long, ewma_x15: Long)

/** A priced tick for [[StreamOps.ohlcStream]]. */
case class Tick(event_id: Long, ts: Timestamp, value: Double)

/** Closed-hour moments + the open hour for [[StreamOps.burstStream]]:
  * n/Σx/Σx² over closed hours, openHour = -1 when none. */
private case class BurstState(n: Long, s1: Long, s2: Long,
    openHour: Long, openCnt: Long)

/** A closed hour's burst verdict against prefix statistics. */
case class BurstVerdict(hour_ts: Long, cnt: Long, burst: Boolean)

/** One JSON key's accumulated shape histogram from
  * [[StreamOps.schemaInferStream]]. */
case class KeyShapeProfile(key: String, shapes: Map[String, Long])

/** Per-hour bar state: open/close carry their (µs, event_id) ordering keys
  * so ties resolve like the batch lexicographic argmin/argmax. */
private case class OhlcState(openUs: Long, openId: Long, open: Long,
    high: Long, low: Long, closeUs: Long, closeId: Long, close: Long,
    n: Long, vol: Long)

/** A refreshed hourly bar from [[StreamOps.ohlcStream]]. */
case class OhlcBar(hour_ts: Long, n_trades: Long, open_cents: Long,
    high_cents: Long, low_cents: Long, close_cents: Long, volume_cents: Long)

/** Per-type running moments for [[StreamOps.anomalies]] (Welford). */
case class TypeStats(n: Long, mean: Double, m2: Double)

/** KMV sketch state: the k smallest distinct hashes seen for a key. */
case class KmvSketch(hashes: Seq[Long])

/** HLL register state: 64 max-merged leading-zero ranks. */
case class HllState(regs: Seq[Int])

/** Misra–Gries state: events seen + at most k lower-bound counters. */
case class HhState(n: Long, counters: Map[Long, Long])

/** Per-type heavy-hitter summary emitted each batch (parallel arrays
  * sorted by count desc, user asc). */
case class HeavyHittersProfile(event_type: String, n_events: Long,
    users: Seq[Long], count_lower_bounds: Seq[Long])

/** Per-type HLL estimate emitted each batch. */
case class HllEstimate(event_type: String, hll_estimate: Double, n_regs_used: Int)

/** Per-type distinct estimate emitted each batch. */
case class DistinctEstimate(event_type: String, n_distinct_est: Long, n_in_sketch: Int)

/** Per-type quantile estimates off the streaming log-linear sketch. */
case class QuantileEstimate(event_type: String, n_events: Long, n_buckets: Int,
    p50_est: Double, p99_est: Double)

/** Running disorder state for [[StreamOps.latenessMonitor]]. */
case class LateState(n: Long, nLate: Long, maxLateMs: Long, runmax: Long)

/** Funnel progress for [[StreamOps.funnel]]: completed step times. */
case class FunnelState(times: Seq[Long], done: Boolean)

/** A completed funnel, emitted once per user. */
case class Conversion(user_id: Long, first_step_ts: Timestamp,
    last_step_ts: Timestamp, duration_ms: Long)

/** Per-type disorder profile emitted each batch. */
case class LatenessProfile(event_type: String, n_events: Long, n_late: Long,
    late_frac: Double, max_late_ms: Long)

/** An emitted outlier. */
case class Anomaly(event_type: String, user_id: Long, value: Double, z: Double,
    ts: Timestamp)

/** A keyed change event for [[StreamOps.scd2Stream]] — carries the
  * event_id the batch `ev_scd2` uses as its deterministic ts tiebreak. */
case class ChangeEvent(user_id: Long, event_id: Long, event_type: String,
    ts: Timestamp)

/** A CLOSED SCD-2 interval ([valid_from, valid_to) epoch seconds),
  * emitted exactly once when the tracked status changes. */
case class Scd2Interval(user_id: Long, version: Long, status: String,
    n_events: Long, valid_from: Long, valid_to: Long)

/** Open-interval state for [[StreamOps.scd2Stream]] — O(1) per user.
  * `last` is the newest observed event second, the close point a dormancy
  * flush uses. */
private case class Scd2State(version: Long, status: String, n: Long,
    from: Long, last: Long)

/** One Count-Min hash row's counters, emitted per batch by
  * [[StreamOps.countMinStream]]. */
case class CmRowState(j: Int, counters: Map[Int, Long])

/** Latest click/view touch per user — O(1) state for
  * [[StreamOps.attributionStream]]. */
private case class TouchState(lastClickUs: Option[Long], lastViewUs: Option[Long])

/** An attributed purchase, emitted as it arrives. */
case class Attribution(user_id: Long, event_id: Long, channel: String)
