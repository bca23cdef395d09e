package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Interleave the low 16 bits of a long into the even bit positions of a
    * 32-bit word (Morton/Z-curve "bit spread", the classic 4-step
    * mask-and-shift — public domain bit-twiddling, same form as Delta's
    * OPTIMIZE ZORDER interleaving). Pure integer Column arithmetic so the
    * oracle reproduces it bit-for-bit. */
  private def spread16(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(0xFFFFL))
    val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order layout audit (`q_zorder_layout`): the write-time clustering
    * step a 100 TB table needs before multi-dimension predicates can skip
    * files. Each lineitem row gets a 32-bit Morton code over its
    * (l_partkey, l_suppkey) pair — both keys min-max-scaled to the full
    * 16-bit coordinate space first, so the curve uses all its resolution
    * regardless of key ranges — and the top 5 z-bits assign it to one of
    * 32 fixed z-range chunks (the file a z-ordering writer would place it
    * in; fixed bit-prefix ranges, NOT a global sort, so chunk assignment
    * is a pure map). Output per chunk: row count plus the parquet-footer
    * min/max of BOTH keys and their spans in basis points of the full key
    * range — the numbers that decide whether a two-sided predicate can
    * prune the chunk. An ideal 32-chunk z-layout covers ~1/8 × 1/4 of the
    * (part, supp) rectangle per chunk; a naive single-key sort covers
    * 10000 bp of whichever key it ignored. Plan shape: one tiny extent
    * aggregate broadcast back, one map pass, one 32-group partial agg —
    * no wide shuffle, no window. */
  /** (l_partkey, l_suppkey) with both keys min-max-scaled to 16-bit
    * coordinates and the extent columns carried along — shared by the
    * z-order audit and the file-skipping eval. */
  private def scaledKeys(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val ext = li.agg(
      min(col("x")).as("mnx"), max(col("x")).as("mxx"),
      min(col("y")).as("mny"), max(col("y")).as("mxy"))
    li.crossJoin(broadcast(ext))
      .withColumn("xs", expr("(x - mnx) * 65535 div greatest(mxx - mnx, 1)"))
      .withColumn("ys", expr("(y - mny) * 65535 div greatest(mxy - mny, 1)"))
  }

  /** 32-bit Morton code of the scaled coordinate pair. */
  private def zValue: Column =
    spread16(col("xs")).bitwiseOR(shiftleft(spread16(col("ys")), 1))

  def zorderLayout(spark: SparkSession, d: String): DataFrame = {
    scaledKeys(spark, d)
      .withColumn("chunk", shiftright(zValue, 27).cast("long"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_part"), max(col("x")).as("max_part"),
        min(col("y")).as("min_supp"), max(col("y")).as("max_supp"),
        // extent cols are constant; carry them through the agg for spans
        min(col("mnx")).as("mnx"), min(col("mxx")).as("mxx"),
        min(col("mny")).as("mny"), min(col("mxy")).as("mxy"))
      .withColumn("span_part_bp",
        expr("(max_part - min_part + 1) * 10000 div (mxx - mnx + 1)"))
      .withColumn("span_supp_bp",
        expr("(max_supp - min_supp + 1) * 10000 div (mxy - mny + 1)"))
      .select("chunk", "n_rows", "min_part", "max_part", "min_supp",
        "max_supp", "span_part_bp", "span_supp_bp")
      .orderBy("chunk")
  }

  val zorderLayoutOracle: String =
    """WITH ext AS (
      |  SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
      |         min(l_suppkey) AS mny, max(l_suppkey) AS mxy FROM lineitem),
      |sc AS (
      |  SELECT l_partkey AS x, l_suppkey AS y, mnx, mxx, mny, mxy,
      |    (l_partkey - mnx) * 65535 // greatest(mxx - mnx, 1) AS xs,
      |    (l_suppkey - mny) * 65535 // greatest(mxy - mny, 1) AS ys
      |  FROM lineitem, ext),
      |s1 AS (SELECT *, (xs | (xs << 8)) & 16711935 AS xa,
      |               (ys | (ys << 8)) & 16711935 AS ya FROM sc),
      |s2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
      |               (ya | (ya << 4)) & 252645135 AS yb FROM s1),
      |s3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
      |               (yb | (yb << 2)) & 858993459 AS yc FROM s2),
      |s4 AS (SELECT *,
      |  (((xc | (xc << 1)) & 1431655765)
      |   | (((yc | (yc << 1)) & 1431655765) << 1)) >> 27 AS chunk FROM s3)
      |SELECT chunk, count(*) AS n_rows,
      |  min(x) AS min_part, max(x) AS max_part,
      |  min(y) AS min_supp, max(y) AS max_supp,
      |  (max(x) - min(x) + 1) * 10000 // (min(mxx) - min(mnx) + 1) AS span_part_bp,
      |  (max(y) - min(y) + 1) * 10000 // (min(mxy) - min(mny) + 1) AS span_supp_bp
      |FROM s4 GROUP BY 1 ORDER BY 1""".stripMargin

  /** File-skipping eval (`q_file_skipping`): the number the z-order audit
    * exists to move — for a workload of 20 two-sided (part-range ×
    * supp-range) predicates, how many of 32 chunks must be READ (zone-map
    * min/max overlap, exactly parquet row-group pruning) under the
    * Z-ORDER layout vs a LINEAR sort on l_partkey alone. The linear
    * layout prunes hard on its sort key but covers the whole supplier
    * range in every chunk, so supplier-side selectivity is wasted;
    * z-range chunks bound both keys and read ~√ of the area. Both
    * layouts' zone maps come from the same one-pass scaled scan
    * (chunk = top-5 z bits vs top-5 xs bits); predicates are a
    * deterministic 20-query grid over the key extents (i-th part
    * twentieth × (7i mod 20)-th supp twentieth), built from the same
    * broadcast extent row — no literals that would rot at another SF. */
  def fileSkipping(spark: SparkSession, d: String, nQueries: Int = 20): DataFrame = {
    val scaled = scaledKeys(spark, d)
    def zones(chunkCol: Column, layout: String): DataFrame = scaled
      .withColumn("chunk", chunkCol.cast("long"))
      .groupBy(col("chunk"))
      .agg(min(col("x")).as("min_part"), max(col("x")).as("max_part"),
        min(col("y")).as("min_supp"), max(col("y")).as("max_supp"),
        min(col("mnx")).as("mnx"), min(col("mxx")).as("mxx"),
        min(col("mny")).as("mny"), min(col("mxy")).as("mxy"))
      .withColumn("layout", lit(layout))
    val zmaps = zones(shiftright(zValue, 27), "zorder")
      .unionAll(zones(shiftright(col("xs"), 11), "linear"))
    val preds = spark.range(nQueries).select(col("id").as("q"))
    zmaps.crossJoin(broadcast(preds))
      .withColumn("p_lo", expr("mnx + q * (mxx - mnx + 1) div 20"))
      .withColumn("p_hi", expr("mnx + (q + 1) * (mxx - mnx + 1) div 20 - 1"))
      .withColumn("s_lo", expr("mny + ((q * 7) % 20) * (mxy - mny + 1) div 20"))
      .withColumn("s_hi", expr("mny + ((q * 7) % 20 + 1) * (mxy - mny + 1) div 20 - 1"))
      .withColumn("must_read",
        when(col("min_part") <= col("p_hi") && col("max_part") >= col("p_lo") &&
          col("min_supp") <= col("s_hi") && col("max_supp") >= col("s_lo"), 1L)
          .otherwise(0L))
      .groupBy(col("q"))
      .agg(sum(when(col("layout") === "zorder", col("must_read")).otherwise(0L))
          .as("chunks_zorder"),
        sum(when(col("layout") === "linear", col("must_read")).otherwise(0L))
          .as("chunks_linear"))
      .orderBy(col("q"))
  }

  val fileSkippingOracle: String =
    """WITH ext AS (
      |  SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
      |         min(l_suppkey) AS mny, max(l_suppkey) AS mxy FROM lineitem),
      |sc AS (
      |  SELECT l_partkey AS x, l_suppkey AS y, mnx, mxx, mny, mxy,
      |    (l_partkey - mnx) * 65535 // greatest(mxx - mnx, 1) AS xs,
      |    (l_suppkey - mny) * 65535 // greatest(mxy - mny, 1) AS ys
      |  FROM lineitem, ext),
      |s1 AS (SELECT *, (xs | (xs << 8)) & 16711935 AS xa,
      |               (ys | (ys << 8)) & 16711935 AS ya FROM sc),
      |s2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
      |               (ya | (ya << 4)) & 252645135 AS yb FROM s1),
      |s3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
      |               (yb | (yb << 2)) & 858993459 AS yc FROM s2),
      |s4 AS (SELECT *,
      |  (((xc | (xc << 1)) & 1431655765)
      |   | (((yc | (yc << 1)) & 1431655765) << 1)) >> 27 AS zchunk,
      |  xs >> 11 AS lchunk FROM s3),
      |zones AS (
      |  SELECT 'zorder' AS layout, zchunk AS chunk,
      |    min(x) AS min_part, max(x) AS max_part,
      |    min(y) AS min_supp, max(y) AS max_supp,
      |    min(mnx) AS mnx, min(mxx) AS mxx, min(mny) AS mny, min(mxy) AS mxy
      |  FROM s4 GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'linear', lchunk,
      |    min(x), max(x), min(y), max(y),
      |    min(mnx), min(mxx), min(mny), min(mxy)
      |  FROM s4 GROUP BY 1, 2),
      |preds AS (SELECT cast(range AS bigint) AS q FROM range(20)),
      |j AS (
      |  SELECT q, layout,
      |    CASE WHEN min_part <= mnx + (q + 1) * (mxx - mnx + 1) // 20 - 1
      |          AND max_part >= mnx + q * (mxx - mnx + 1) // 20
      |          AND min_supp <= mny + ((q * 7) % 20 + 1) * (mxy - mny + 1) // 20 - 1
      |          AND max_supp >= mny + ((q * 7) % 20) * (mxy - mny + 1) // 20
      |      THEN 1 ELSE 0 END AS must_read
      |  FROM zones, preds)
      |SELECT q,
      |  cast(sum(CASE WHEN layout = 'zorder' THEN must_read ELSE 0 END) AS bigint) AS chunks_zorder,
      |  cast(sum(CASE WHEN layout = 'linear' THEN must_read ELSE 0 END) AS bigint) AS chunks_linear
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
}
