package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming metrics mirroring the reference client's counters
  * (reference ServerSentEventClient.java:87-102: totalEventsReceived,
  * reconnections, events/sec, time-since-last-event) — here fed by Spark's
  * StreamingQueryListener instead of a hand-rolled metrics loop, so the
  * numbers come from the engine's own progress accounting.
  */
final class SseMetricsListener extends StreamingQueryListener {
  private val totalEvents = new AtomicLong(0)
  private val totalBatches = new AtomicLong(0)
  private val starts = new AtomicLong(0)
  private val terminations = new AtomicLong(0)
  @volatile private var lastProgressTime: Long = 0L
  @volatile private var lastRowsPerSecond: Double = 0.0

  override def onQueryStarted(event: QueryStartedEvent): Unit = starts.incrementAndGet()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    totalEvents.addAndGet(event.progress.numInputRows)
    totalBatches.incrementAndGet()
    lastRowsPerSecond = event.progress.processedRowsPerSecond
    lastProgressTime = System.currentTimeMillis()
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminations.incrementAndGet()

  def eventsReceived: Long = totalEvents.get()
  def batches: Long = totalBatches.get()
  def queryStarts: Long = starts.get()
  def queryTerminations: Long = terminations.get()
  def timeSinceLastProgressMs: Long =
    if (lastProgressTime == 0) -1 else System.currentTimeMillis() - lastProgressTime

  /** One-line status, the analogue of the reference's getStatusSummary(). */
  def statusSummary: String =
    s"TotalEvents=${eventsReceived}, Batches=${batches}, Starts=${queryStarts}, " +
      s"Terminations=${queryTerminations}, LastRate=${lastRowsPerSecond}/s"
}
