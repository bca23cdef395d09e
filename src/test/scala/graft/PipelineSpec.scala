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
}
