package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

class SseMetricsListenerSpec extends SparkSpec {

  test("listener accumulates engine-reported totals like the reference metrics loop") {
    val listener = new SseMetricsListener
    spark.streams.addListener(listener)
    try {
      val dir = Files.createTempDirectory("sse-metrics")
      val log = dir.resolve("stream.log")
      Files.writeString(log,
        (1 to 7).map(i => s"event: e\nid: $i\ndata: d$i\n\n").mkString)
      val q = spark.readStream.format("sse").option("path", log.toString)
        .option("maxEventsPerTrigger", "2").load()
        .writeStream.format("memory").queryName("sse_metrics")
        .option("checkpointLocation", dir.resolve("cp").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.eventsReceived < 7 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.eventsReceived == 7, listener.statusSummary)
      assert(listener.batches >= 4, listener.statusSummary) // ceil(7/2) batches
      assert(listener.queryStarts == 1)
      assert(listener.maxBatchSize == 2, listener.statusSummary)
      assert(listener.statusSummary.contains("TotalEvents=7"))
    } finally spark.streams.removeListener(listener)
  }

  test("connection counters across a forced restart and a failure (reference :87-102)") {
    val listener = new SseMetricsListener
    spark.streams.addListener(listener)
    try {
      val dir = Files.createTempDirectory("sse-metrics-restart")
      val log = dir.resolve("stream.log")
      Files.writeString(log,
        (1 to 4).map(i => s"event: e\nid: $i\ndata: d$i\n\n").mkString)
      def run(fail: Boolean): Unit = {
        val q = spark.readStream.format("sse").option("path", log.toString).load()
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.count()
            if (fail) throw new RuntimeException("injected sink failure")
          }
          .option("checkpointLocation", dir.resolve("cp").toString)
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination(60000)
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      }
      run(fail = true) // attempt #1: progresses, then dies with an exception
      run(fail = false) // attempt #2: restart from checkpoint, completes
      val deadline = System.currentTimeMillis() + 10000
      while ((listener.queryTerminations < 2 || listener.reconnections < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(listener.connectionAttempts == 2, listener.statusSummary)
      // the failed run dies before its batch commits, so it never progresses:
      // one successful connection (the restart), one failed (the injection)
      assert(listener.successfulConnections == 1, listener.statusSummary)
      assert(listener.failedConnections == 1, listener.statusSummary)
      assert(listener.reconnections == 1, listener.statusSummary)
      assert(listener.eventsReceived == 4, listener.statusSummary)
    } finally spark.streams.removeListener(listener)
  }
}
