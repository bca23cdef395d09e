package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked windowed counts aggregate per window and type") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    in.addData(
      StreamEvent(1, "click", 1.0, ts(5)),
      StreamEvent(2, "click", 2.0, ts(20)),
      StreamEvent(1, "view", 3.0, Timestamp.valueOf("2024-01-01 11:10:00")))
    val q = StreamOps.windowedCounts(in.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT date_format(window.start,'HH:mm') AS w, event_type, n_events, sum_value FROM wc ORDER BY w, event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("10:00", "click", 2L, 3.0), ("11:00", "view", 1L, 3.0)))
  }

  test("sessionize closes a session after the gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamEvent]
    // user 1: two events 10 min apart (one session), then 40-min gap → new session
    in.addData(
      StreamEvent(1, "click", 1.0, ts(0)),
      StreamEvent(1, "click", 2.0, ts(10)),
      StreamEvent(1, "click", 4.0, ts(50)))
    val q = StreamOps.sessionize(in.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val sessions = spark.sql(
      "SELECT user_id, n_events, sum_value FROM sess ORDER BY session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the first session (2 events, value 3.0) must be closed by the 50-min event
    assert(sessions.contains((1L, 2L, 3.0)), s"got ${sessions.mkString(",")}")
  }

  test("dedupById drops replayed events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val e = (7L, ts(1), "payload")
    in.addData(e, e, (8L, ts(2), "other"))
    val df = in.toDF().toDF("event_id", "ts", "data")
    val q = StreamOps.dedupById(df)
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM dd").head().getLong(0) == 2)
  }
}
