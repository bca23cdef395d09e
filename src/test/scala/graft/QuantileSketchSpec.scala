package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** The two properties that make the log-linear quantile sketch a sketch:
  * bounded error against the exact baseline (the [[Events.valueQuantiles]]
  * eval pattern, like ann_recall closes the ANN loop) and associative
  * mergeability of its bucket-count state. */
class QuantileSketchSpec extends SparkSpec {

  test("sketch quantiles stay within the log-linear error bound of exact order statistics") {
    // The sketch reports the midpoint of the bucket holding the ceil(q·n)-th
    // order statistic, so against THAT statistic (the inverted-CDF quantile
    // definition) the bound is half a sub-bucket: 1/(2·m) relative, plus
    // slack for cent rounding. (The interpolated quantile_cont definition is
    // NOT the baseline — in a sparse tail it sits between order stats that
    // can be far apart, a property of the data, not sketch error.)
    val m = Events.QuantileSketchSubBuckets
    val bound = 1.0 / (2 * m) + 0.01
    val est = Events.quantileSketch(spark, Sf)
      .select(col("event_type"), col("p50_est"), col("p90_est"), col("p99_est"))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byType = Tables.events(spark, Sf)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(est.keySet == byType.keySet && est.nonEmpty)
    for (t <- est.keySet) {
      val sorted = byType(t)
      for ((q, e) <- Seq(0.50, 0.90, 0.99).zip(est(t))) {
        val x = sorted(math.ceil(q * sorted.length).toInt - 1)
        val rel = math.abs(e - x) / x
        assert(rel <= bound, f"$t p$q: est $e vs order-stat $x (rel err $rel%.4f > $bound)")
      }
    }
  }

  test("streaming bucket31 matches the batch SQL bucketing on the whole events table") {
    // batch and streaming sketches must agree bucket-for-bucket or their
    // states could not be merged; pin the parity on real data, not samples
    val batch = Events.quantileSketchCounts(Tables.events(spark, Sf))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaScala = Tables.events(spark, Sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), graft.streaming.StreamOps.bucket31(r.getDouble(1))))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(batch.nonEmpty && viaScala == batch)
  }

  test("zero and negative values clamp into the underflow bucket identically in batch and streaming") {
    import spark.implicits._
    // without the clamp, vc=0 hits 1L<<-1 (wraps to 1L<<63) on the JVM while
    // the batch SQL's length(bin(0))=1 yields octave 1, and negative vc
    // diverges on floor-vs-truncate division — the clamp makes all of these
    // land in bucket 0 in BOTH engines by construction
    val vals = Seq(0.0, -0.004, -3.2, 0.004, 0.005, 0.01)
    val batch = Events.quantileSketchCounts(
        vals.map(v => ("t", v)).toDF("event_type", "value"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val viaScala = vals.map(graft.streaming.StreamOps.bucket31)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(batch == viaScala)
    // everything at or below one cent is the underflow bucket (idx 0)
    assert(batch.keySet == Set(0L) && batch(0L) == vals.size.toLong)
  }

  test("sketch state merges associatively: sum of split-corpus counts == full-corpus counts") {
    val ev = Tables.events(spark, Sf)
    val full = Events.quantileSketchCounts(ev)
    val even = Events.quantileSketchCounts(ev.filter(col("event_id") % 2 === 0))
    val odd = Events.quantileSketchCounts(ev.filter(col("event_id") % 2 === 1))
    // merge = union + sum per (type, bucket) — the map-side combine shape
    val merged = even.unionAll(odd)
      .groupBy(col("event_type"), col("idx"))
      .agg(sum(col("cnt")).as("cnt"))
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getLong(1))
    val fullMap = full.collect().map(r => key(r) -> r.getLong(2)).toMap
    val mergedMap = merged.collect().map(r => key(r) -> r.getLong(2)).toMap
    assert(fullMap.nonEmpty && mergedMap == fullMap)
  }
}
