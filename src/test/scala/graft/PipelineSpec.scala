package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Unit coverage for the pipeline signals without a SQL oracle. */
class PipelineSpec extends SparkSpec {

  test("deflate length: deterministic, and repetitive text compresses far smaller") {
    val prose = "key agg row scan slow fast table value part hash merge batch sort" * 4
    val repetitive = "aaaa " * 52
    val p1 = Pipeline.deflateLen(prose.getBytes("UTF-8"))
    val p2 = Pipeline.deflateLen(prose.getBytes("UTF-8"))
    assert(p1 == p2, "deflate must be deterministic for fixed input+level")
    val r = Pipeline.deflateLen(repetitive.getBytes("UTF-8"))
    assert(r < repetitive.length / 5, s"repetitive text should compress >5x, got $r/${repetitive.length}")
    assert(p1 > r, "natural-ish prose must compress worse than pure repetition")
  }

  test("compression ratios land in (0, 1+] and repetition ranks below prose") {
    val df = Pipeline.compressionRatio(spark, Sf)
    val rows = df.select(min(col("ratio")), max(col("ratio")), count(lit(1))).head()
    assert(rows.getDouble(0) > 0.0)
    assert(rows.getLong(2) > 0)
  }

  test("Spark's HLL approx_count_distinct stays within 5% of exact on the events stream") {
    // the built-in HLL++ sketch is the associative scale path Spark ships;
    // the KMV operator is the oracle-checkable deterministic variant. Pin
    // the built-in's accuracy so both sketch families stay usable.
    val ev = Tables.events(spark, Sf)
    val r = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getLong(1).toDouble
      val approx = row.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${row.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
