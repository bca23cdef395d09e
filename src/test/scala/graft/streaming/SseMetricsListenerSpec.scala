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
      assert(listener.statusSummary.contains("TotalEvents=7"))
    } finally spark.streams.removeListener(listener)
  }
}
