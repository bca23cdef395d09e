package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming metrics mirroring the reference client's counters
  * (reference ServerSentEventClient.java:87-102), fed by Spark's
  * StreamingQueryListener instead of a hand-rolled metrics loop, so the
  * numbers come from the engine's own progress accounting.
  *
  * Counter map (reference → here):
  *  - totalEventsReceived → [[eventsReceived]] (sum of batch input rows)
  *  - totalConnectionAttempts → [[connectionAttempts]] (query starts)
  *  - totalSuccessfulConnections → [[successfulConnections]] (queries that
  *    produced at least one progress event)
  *  - totalFailedConnections → [[failedConnections]] (queries terminated
  *    with an exception)
  *  - totalReconnections → [[reconnections]] (starts following a previous
  *    termination — i.e. restarts from checkpoint)
  *  - maxQueueSize → [[maxBatchSize]] (largest single micro-batch admitted;
  *    the queue between upstream and poll() is the micro-batch here)
  *
  * The per-connection (transport-level) metrics — lifecycle state, backoff
  * attempts, bytes — live on [[graft.sources.sse.SseClient]].getMetrics;
  * this listener covers the query plane the way the reference's task-level
  * metrics loop covers poll().
  */
final class SseMetricsListener extends StreamingQueryListener {
  private val totalEvents = new AtomicLong(0)
  private val totalBatches = new AtomicLong(0)
  private val starts = new AtomicLong(0)
  private val terminations = new AtomicLong(0)
  private val failures = new AtomicLong(0)
  private val restarts = new AtomicLong(0)
  private val maxBatch = new AtomicLong(0)
  private val progressedRuns = ConcurrentHashMap.newKeySet[UUID]()
  @volatile private var lastProgressTime: Long = 0L
  @volatile private var lastRowsPerSecond: Double = 0.0

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    if (terminations.get() > 0) restarts.incrementAndGet()
    starts.incrementAndGet()
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    progressedRuns.add(event.progress.runId)
    totalEvents.addAndGet(event.progress.numInputRows)
    totalBatches.incrementAndGet()
    val n = event.progress.numInputRows
    if (n > maxBatch.get()) maxBatch.set(n)
    lastRowsPerSecond = event.progress.processedRowsPerSecond
    lastProgressTime = System.currentTimeMillis()
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
    if (event.exception.isDefined) failures.incrementAndGet()
    terminations.incrementAndGet()
  }

  def eventsReceived: Long = totalEvents.get()
  def batches: Long = totalBatches.get()
  def queryStarts: Long = starts.get()
  def queryTerminations: Long = terminations.get()
  def connectionAttempts: Long = starts.get()
  def successfulConnections: Long = progressedRuns.size.toLong
  def failedConnections: Long = failures.get()
  def reconnections: Long = restarts.get()
  def maxBatchSize: Long = maxBatch.get()
  def timeSinceLastProgressMs: Long =
    if (lastProgressTime == 0) -1 else System.currentTimeMillis() - lastProgressTime

  /** One-line status, the analogue of the reference's getStatusSummary(). */
  def statusSummary: String =
    s"TotalEvents=${eventsReceived}, Batches=${batches}, Starts=${queryStarts}, " +
      s"Terminations=${queryTerminations}, Attempts=${connectionAttempts}, " +
      s"Successful=${successfulConnections}, Failed=${failedConnections}, " +
      s"Reconnections=${reconnections}, MaxBatch=${maxBatchSize}, " +
      s"LastRate=${lastRowsPerSecond}/s"
}
