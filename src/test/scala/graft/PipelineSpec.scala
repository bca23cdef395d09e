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

  test("word-dictionary compression estimate: bounds hold and repetition compresses") {
    val df = Pipeline.compressionRatio(spark, Sf)
    val rows = df.selectExpr(
      "min(ratio_bp)", "max(ratio_bp)", "count(1)",
      // the dictionary can never hold more words than the doc, and the
      // estimate can never undercut pure dictionary cost
      "sum(CASE WHEN n_distinct > n_tokens THEN 1 ELSE 0 END)",
      "sum(CASE WHEN est_bytes < n_distinct THEN 1 ELSE 0 END)").head()
    assert(rows.getLong(0) > 0L, "ratio_bp must be positive")
    assert(rows.getLong(2) > 0L)
    assert(rows.getLong(3) == 0L && rows.getLong(4) == 0L)
    // direction check: a doc of one repeated word must estimate far below
    // a doc of all-unique words (the ranking the zlib signal gives)
    import spark.implicits._
    val toy = Seq((1L, ("spark " * 40).trim, "en", "s", 0L),
      (2L, (1 to 40).map(i => s"w$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val est = toy
      .selectExpr("doc_id",
        "aggregate(array_distinct(split(text, ' ')), 0L, (a, w) -> a + length(w) + 1) " +
          "+ 2 * (size(split(text, ' ')) - size(array_distinct(split(text, ' ')))) AS est",
        "length(text) AS chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2).toLong)).toMap
    assert(est(1L)._1 * 2 < est(1L)._2, "repetition must compress >2x under the dictionary model")
    assert(est(2L)._1 >= est(2L)._2, "all-unique words must not compress")
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
