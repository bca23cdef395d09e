package graft

import java.nio.file.Files

import graft.operators.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed tables make fact-fact joins and key-aligned aggregations plan
  * with zero exchanges — the pay-once co-location contract that matters at
  * 100 TB. These specs assert the exchange-free plans AND result equality
  * with the unbucketed execution. */
class BucketingSpec extends SparkSpec {

  private def countShuffles(df: DataFrame): Int = {
    var n = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case _: ShuffleExchangeExec => n += 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  test("co-located join + aligned aggregation plan with zero shuffles") {
    val dir = Files.createTempDirectory("graft-buckets")
    dir.toFile.deleteOnExit()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the join shape bucketing is for (broadcast would hide it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.bucketize(Tables.lineitem(spark, Sf)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
        "li_b", "l_orderkey", 4, dir.resolve("li").toString)
      Bucketing.bucketize(Tables.orders(spark, Sf)
        .select(col("o_orderkey"), col("o_totalprice")),
        "ord_b", "o_orderkey", 4, dir.resolve("ord").toString)

      val joined = Bucketing.colocatedJoin(spark, "li_b", "ord_b",
        "l_orderkey", "o_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("tp"))

      assert(countShuffles(joined) == 0,
        s"bucketed join + aligned agg must be exchange-free:\n${joined.queryExecution.executedPlan}")

      // same result as the unbucketed execution
      val plain = Tables.lineitem(spark, Sf)
        .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("tp"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("an unbucketed copy of the same join shuffles both sides (the cost bucketing removes)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = Tables.lineitem(spark, Sf)
        .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(countShuffles(plain) >= 2, "both join inputs should shuffle without bucketing")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
