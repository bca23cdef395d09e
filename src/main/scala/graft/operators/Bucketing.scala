package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: the co-location tool for fact-fact joins.
  *
  * At 100 TB the dominant cost of a repeated fact-fact join (lineitem ⋈
  * orders on orderkey, events ⋈ events on user) is the shuffle of both
  * sides. Writing the facts bucketed on the join key — hash-partitioned
  * into a fixed bucket count at write time, sorted within buckets — lets
  * every subsequent join and aggregation on that key plan with ZERO
  * exchanges: Spark matches bucket layouts and runs a sort-merge join
  * bucket-by-bucket. Pay the shuffle once at ingest; every downstream query
  * rides it for free (BucketingSpec asserts the exchange-free plans).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted external parquet table.
    * `nBuckets` must match across tables that will be joined — it's the
    * cluster-wide partitioning contract (size it to executors × cores). */
  def bucketize(df: DataFrame, table: String, key: String, nBuckets: Int,
      path: String): Unit =
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planned with no
    * shuffle on either side when bucket counts match. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
