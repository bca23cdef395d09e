package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics core — TPC-H-shaped headline queries adapted to the
  * testdata's (reduced) column set.
  *
  * Scale notes (100 TB design):
  *  - `region`/`nation`/`supplier`/`customer`/`part` are dimension tables that
  *    stay small relative to the facts at any SF, so every dim join is an
  *    explicit `broadcast()` — no shuffle of the fact side for them.
  *  - fact↔fact joins (orders↔lineitem) shuffle on the join key; AQE handles
  *    skew/coalescing at runtime.
  *  - All aggregates are partial-aggregation friendly (sum/count/min/max), so
  *    map-side combine bounds shuffle volume by |groups|, not |rows|.
  *  - Filters are plain column predicates on scan output → Catalyst pushes
  *    them into the parquet reader (verified in PlanSpec).
  *
  * Floating-point outputs are rounded (money → 2dp, ratios → 4dp) and every
  * query ends in a total ORDER BY, so results are deterministic and
  * hash-comparable against the DuckDB oracle.
  */
object Tpch {

  /** TPC-H Q1: pricing summary report. Single scan + groupBy — the shuffle
    * carries only 6 groups after partial agg. */
  def q1Pricing(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        // charge is exactly 6-decimal, but at large SF the accumulation noise
        // exceeds a 1e-6 half-step; round 2 instead — a 6-decimal value sits
        // on a .xx5000 boundary with probability 1e-4, vs certainty of noise
        // flips at round 6 (see SURVEY §6 rounding rule)
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3: shipping priority. customer is a broadcast dim; orders↔lineitem
    * shuffle on orderkey. Top-k on rounded revenue with id tie-break. */
  def q3Shipping(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, d).filter(col("o_orderdate") < lit("1996-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, d).filter(col("l_shipdate") > lit("1996-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5: local supplier volume within a region. All dims broadcast;
    * only orders↔lineitem shuffles. */
  def q5LocalSupplier(spark: SparkSession, d: String): DataFrame = {
    val region = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, d)
    val cust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey") &&
        supp("s_nationkey") === cust("c_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6: forecast revenue change. Pure filter+sum — every predicate is
    * parquet-pushable and the result is a single row. */
  def q6Forecast(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10: returned-item report. nation broadcast; customer joins after
    * the agg has reduced cardinality to |customers|. */
  def q10Returned(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nation = Tables.nation(spark, d).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-10-01") && col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, d).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .join(broadcast(cust), col("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"),
        col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18: large-volume orders. The having-filter runs on the agg side
    * BEFORE joining customer/orders detail — at scale this turns a fact↔fact
    * join into a tiny-side join. */
  def q18LargeOrders(spark: SparkSession, d: String, minQty: Double = 150.0): DataFrame = {
    val big = Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    val ord = Tables.orders(spark, d).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, d).select("c_custkey", "c_name")
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Time-bucketed revenue rollup (streaming-style agg in batch form). */
  def qRevenueByMonth(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("month"))
  }

  /** TPC-H Q7: trade volume between supplier and customer nations, by year.
    * Both nation dims broadcast; one fact↔fact shuffle. */
  def q7NationTrade(spark: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(spark, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q9 (adapted — no partsupp cost column): revenue by supplier
    * nation and order year for parts whose name contains a token. */
  def q9Profit(spark: SparkSession, d: String): DataFrame = {
    val part = Tables.part(spark, d).filter(col("p_name").contains("a")).select("p_partkey")
    val supp = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val nation = Tables.nation(spark, d).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, d).select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .select(col("nation"), col("o_year"), col("revenue"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q14: promo revenue share per month (conditional aggregation). */
  def q14PromoShare(spark: SparkSession, d: String): DataFrame = {
    val part = Tables.part(spark, d).select(col("p_partkey"), col("p_type"))
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))), 4).as("promo_revenue"),
        round(sum(rev), 4).as("total_revenue"),
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev), 4)
          .as("promo_pct"))
      .orderBy(col("month"))
  }

  /** TPC-H Q16 (adapted — supplier pairs come from lineitem, no partsupp):
    * distinct suppliers per (brand, type, size) for mid-size parts. */
  def q16PartSuppliers(spark: SparkSession, d: String): DataFrame = {
    val part = Tables.part(spark, d)
      .filter(col("p_size") >= 10 && col("p_size") <= 30 && col("p_brand") =!= "Brand#1")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, d).select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(part), col("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q19: disjunctive brand/size/quantity predicates (pushdown of an
    * OR-of-ANDs filter through a broadcast join). */
  def q19Disjunct(spark: SparkSession, d: String): DataFrame = {
    val part = Tables.part(spark, d).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, d)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size") <= 15 &&
          col("l_quantity") >= 1 && col("l_quantity") <= 21) ||
        (col("p_brand") === "Brand#3" && col("p_size") <= 20 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
        (col("p_brand") === "Brand#24" && col("p_size") <= 25 &&
          col("l_quantity") >= 20 && col("l_quantity") <= 40))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 (adapted): orders with at least one late-shipped line
    * (l_shipdate > o_orderdate), counted per priority. LEFT SEMI join: the
    * fact side deduplicates during the join — no order ever multiplies by
    * its line count, and the shuffle carries each key once. */
  def q4OrderPriority(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
      ord("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ord("o_orderdate"),
      "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Oracle: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q12 (adapted to the reduced schema): per return flag, how many
    * lines belong to high- vs low-priority orders. One fact-fact join +
    * conditional partial-agg counts. */
  def q12Priority(spark: SparkSession, d: String): DataFrame = {
    val hi = col("o_orderpriority").isInCollection(Seq("1-URGENT", "2-HIGH"))
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_returnflag")
      .join(Tables.orders(spark, d).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Oracle: String =
    """SELECT l_returnflag,
      |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
      |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS bigint) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q13: customer order-count distribution. LEFT OUTER join keeps
    * order-less customers at count 0; two stacked aggregations, both
    * partial-agg friendly. */
  def q13CustDist(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.customer(spark, d).select("c_custkey")
      .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Oracle: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1) t
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15: top supplier(s) by quarterly revenue — revenue aggregate,
    * broadcast scalar max, equality on the 4dp-rounded value (identical in
    * both engines per the SURVEY §6 rounding rule). */
  def q15TopSupplier(spark: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("m"))
    Tables.supplier(spark, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev))
      .filter(col("total_revenue") === col("m"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Oracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey, round(sum(l_extendedprice*(1-l_discount)), 4) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 (adapted): revenue from small-quantity lines — quantity
    * below 20% of the part's average. The per-part average broadcasts back
    * onto the fact scan; quantities are integer-valued, so the per-part sum
    * (and hence the 0.2·avg threshold) is EXACT in both engines — the
    * comparison cannot flip on accumulation order. */
  def q17SmallQty(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val partAvg = li.groupBy(col("l_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_lim"))
    val brandParts = Tables.part(spark, d)
      .filter(col("p_brand") === "Brand#1").select("p_partkey")
    li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(partAvg.withColumnRenamed("l_partkey", "pk"), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_lim"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  val q17Oracle: String =
    """WITH pa AS (
      |  SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_lim
      |  FROM lineitem GROUP BY 1)
      |SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN pa ON l_partkey = pk
      |WHERE p_brand = 'Brand#1' AND l_quantity < qty_lim""".stripMargin

  /** Running totals: each customer's cumulative spend over their order
    * sequence — the partitioned running-sum window (frame UNBOUNDED
    * PRECEDING → CURRENT ROW). One shuffle co-locates each customer; the
    * running sum is computed in deterministic ORDER BY order, so the
    * addition sequence (and result) is identical cross-engine. */
  def qRunningTotals(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("order_seq", row_number().over(w))
      .withColumn("cum_spend", round(sum(col("o_totalprice")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("order_seq").cast("int").as("order_seq"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("cum_spend"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val qRunningTotalsOracle: String =
    """SELECT o_custkey, o_orderkey,
      |  cast(row_number() OVER w AS int) AS order_seq,
      |  round(o_totalprice, 2) AS o_totalprice,
      |  round(sum(o_totalprice) OVER
      |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** TPC-H Q22 (adapted): customers with above-average positive balance and
    * no orders in 1997+ (scalar subquery + anti join), by market segment. */
  def q22IdleCustomers(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("a"))
    val recent = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select("o_custkey").distinct()
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q2 (adapted — no partsupp cost in the reduced schema): for each
    * size-15 part, the supplier who shipped it FIRST (min shipdate,
    * supplier-key tie-break) — Q2's per-group correlated-min shape via one
    * rank window over the (part, supplier) aggregate; dims broadcast. */
  def q2FirstSupplier(spark: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(spark, d).filter(col("p_size") === 15)
      .select("p_partkey", "p_name")
    val first = Tables.lineitem(spark, d)
      .select("l_partkey", "l_suppkey", "l_shipdate")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("l_shipdate")).as("first_ship"))
    first.withColumn("rk", row_number().over(
        Window.partitionBy(col("p_partkey"))
          .orderBy(col("first_ship"), col("l_suppkey"))))
      .filter(col("rk") === 1)
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("first_ship"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q8 (adapted): one supplier nation's market share of a customer
    * region's revenue, per order year — conditional-aggregate ratio over a
    * fact join with every dimension broadcast. */
  def q8MarketShare(spark: SparkSession, d: String): DataFrame = {
    val nation = Tables.nation(spark, d)
    val region = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val asianNations = nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, d)
      .join(broadcast(asianNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val supN = Tables.supplier(spark, d)
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val natRev = sum(when(col("supp_nation") === "NATION_7", rev).otherwise(lit(0.0)))
    Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(natRev, 4).as("nation_revenue"),
        round(sum(rev), 4).as("total_revenue"),
        round(lit(100.0) * natRev / sum(rev), 4).as("mkt_share_pct"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q20 (adapted — no partsupp): suppliers who DOMINATED shipment of
    * a 'small …' part — more than TWICE the part's per-supplier average
    * quantity (scale-robust: a fixed share threshold empties out as supplier
    * counts grow with the corpus). Nested aggregate (per part-supplier,
    * then per part via window) + broadcast semi chain. Quantities are
    * integer-valued doubles and the threshold is a product comparison, so
    * the arithmetic is exact in both engines. */
  def q20DominantSuppliers(spark: SparkSession, d: String): DataFrame = {
    val smallParts = Tables.part(spark, d)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val psQty = Tables.lineitem(spark, d)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val w = Window.partitionBy(col("l_partkey"))
    psQty
      .withColumn("tot", sum(col("qty")).over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .filter(col("qty") * col("nsupp") > col("tot") * 2)
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_parts_dominated"),
        sum(col("qty")).cast("long").as("qty_dominated"))
      .orderBy(col("n_parts_dominated").desc, col("s_name"))
  }

  /** TPC-H Q11 (adapted — no partsupp): per supplier nation, the parts
    * shipped at more than 3× the nation's per-part average quantity —
    * Q11's group-vs-global-threshold HAVING shape with a scale-robust
    * relative threshold (a fixed fraction of the nation total empties out
    * as the part count grows). The per-nation totals ride a broadcast join
    * (NOT a nation-partitioned window: |nations| is a fixed vocabulary, so
    * a window there would bottleneck on 25 reducers at scale). All-integer
    * quantities → exact product-comparison threshold. Global top-100 =
    * TakeOrderedAndProject. */
  def q11ImportantParts(spark: SparkSession, d: String): DataFrame = {
    val supN = Tables.supplier(spark, d)
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val pq = Tables.lineitem(spark, d)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("l_partkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    val tot = pq.groupBy(col("n_name"))
      .agg(sum(col("qty")).as("tot"), count(lit(1)).as("nparts"))
    pq.join(broadcast(tot), "n_name")
      .filter(col("qty") * col("nparts") > col("tot") * 3)
      .select(col("n_name").as("nation"), col("l_partkey"), col("qty"))
      .orderBy(col("qty").desc, col("nation"), col("l_partkey"))
      .limit(100)
  }

  /** TPC-H Q21 (adapted — the reduced schema has no commit/receipt dates):
    * suppliers who UNIQUELY shipped the last line of a multi-supplier order
    * ("kept the order waiting"). One groupBy to (order, supplier) shipping
    * maxima, then the order-level profile via windows over the order key —
    * high-cardinality partitions, no single reducer. */
  def q21LateSuppliers(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
    val perSupp = Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("smax"))
      .withColumn("omax", max(col("smax")).over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
    perSupp
      .withColumn("nlast", sum(when(col("smax") === col("omax"), 1L).otherwise(0L)).over(w))
      .filter(col("nsupp") >= 2 && col("nlast") === 1 && col("smax") === col("omax"))
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("waiting_orders"))
      .orderBy(col("waiting_orders").desc, col("s_name"))
      .limit(10)
  }

  /** Multi-level subtotal report: order revenue by (customer nation, order
    * year) with ROLLUP — per-(nation, year) detail rows, per-nation
    * subtotals, and the grand total in one pass. Spark compiles the rollup
    * into a single Expand + hash aggregate, so the fact side is scanned
    * once and each grouping set still gets map-side partial aggregation
    * (shuffle volume = Σ|grouping-set groups|, not rows×levels). Revenue is
    * summed in exact integer cents (o_totalprice is exact 2-decimal data),
    * so every subtotal — including the grand total, whose float
    * accumulation noise WOULD straddle round-2 boundaries at large SF — is
    * bit-exact cross-engine. Null group keys from rolled-up levels are
    * coalesced to sentinels so sort order is engine-independent;
    * `grouping_id` (bit 2 = nation rolled up, bit 1 = year rolled up)
    * disambiguates a real nation named 'ALL' from the subtotal row. */
  def qRollupRevenue(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(spark, d).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("o_year"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .rollup(col("n_name"), col("o_year"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_orders"),
        grouping_id().cast("int").as("lvl"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("o_year"), lit(-1)).as("o_year"),
        col("lvl"), col("revenue_cents"), col("n_orders"))
      .orderBy(col("nation"), col("o_year"))
  }

  val qRollupRevenueOracle: String =
    """SELECT coalesce(n_name, 'ALL') AS nation,
      |  coalesce(cast(year(o_orderdate) AS int), -1) AS o_year,
      |  cast(grouping(n_name, year(o_orderdate)) AS int) AS lvl,
      |  cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS revenue_cents,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, year(o_orderdate))
      |ORDER BY nation, o_year""".stripMargin

  /** CUBE(market segment, order year): all four grouping sets — detail,
    * per-segment, per-year, grand total — in the same single Expand +
    * aggregate pass as [[qRollupRevenue]] (CUBE only adds grouping sets to
    * the Expand, never rescans); exact integer cents throughout so every
    * marginal is bit-exact. The cross-marginals are what rollup cannot
    * give: per-year totals ACROSS segments sit beside per-segment totals
    * across years. */
  def qCubeRevenue(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("o_year"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .cube(col("c_mktsegment"), col("o_year"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_orders"),
        grouping_id().cast("int").as("lvl"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_year"), lit(-1)).as("o_year"),
        col("lvl"), col("revenue_cents"), col("n_orders"))
      .orderBy(col("segment"), col("o_year"), col("lvl"))
  }

  val qCubeRevenueOracle: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |  coalesce(cast(year(o_orderdate) AS int), -1) AS o_year,
      |  cast(grouping(c_mktsegment, year(o_orderdate)) AS int) AS lvl,
      |  cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS revenue_cents,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE(c_mktsegment, year(o_orderdate))
      |ORDER BY segment, o_year, lvl""".stripMargin

  /** Explicit GROUPING SETS report (`q_grouping_sets`) — the general form
    * behind `q_rollup_revenue`/`q_cube_revenue`: exactly the three
    * groupings a dashboard wants — (segment, year), (segment), (year) —
    * and NOT the grand total or any other lattice point a cube would also
    * pay for. One scan: Catalyst plans the sets as a single Expand (each
    * input row multiplied by \|sets\| with per-set null masks) feeding one
    * hash aggregate with map-side partial combine — at 100 TB that is 3
    * report levels for one shuffle instead of three scans-plus-unions,
    * and the Expand factor is the set count, not the group cardinality. */
  def qGroupingSets(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).select("c_custkey", "c_mktsegment")
    val ord = Tables.orders(spark, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("o_year"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment"), col("o_year")),
          Seq(col("c_mktsegment")), Seq(col("o_year"))),
        col("c_mktsegment"), col("o_year"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_orders"),
        grouping_id().cast("int").as("lvl"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_year"), lit(-1)).as("o_year"),
        col("lvl"), col("revenue_cents"), col("n_orders"))
      .orderBy(col("segment"), col("o_year"), col("lvl"))
  }

  val qGroupingSetsOracle: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |  coalesce(cast(year(o_orderdate) AS int), -1) AS o_year,
      |  cast(grouping(c_mktsegment, year(o_orderdate)) AS int) AS lvl,
      |  cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS revenue_cents,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment, year(o_orderdate)),
      |  (c_mktsegment), (year(o_orderdate)))
      |ORDER BY segment, o_year, lvl""".stripMargin

  /** Customer-spend decile report (ntile semantics) WITHOUT the
    * single-reducer global window ntile needs: the exact global rank is
    * assembled distributedly — range-repartition on the sort key, per-
    * partition `row_number` (partitioned window — every reducer ranks its
    * own slice), then each partition's start offset from a broadcast
    * triangular join over the \|partitions\|-row count table. The rank is
    * boundary-independent (whatever rows land where, slice-rank + offset
    * = total-order position), so the sampled range boundaries don't hurt
    * determinism. decile = (rank−1)·10 div n + 1, the exact integer closed
    * form of SQL ntile (first n mod 10 buckets one row larger). Spend is
    * exact cents, custkey breaks ties → a strict total order. */
  def qSpendDeciles(spark: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(spark, d)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("spend_cents"), count(lit(1)).as("n_orders"))
    // localCheckpoint pins ONE materialization of the range exchange: the
    // counts/offsets branch and the row_number branch below both read it.
    // Without the pin they are two logical scans of a RangePartitioner whose
    // sampled boundaries carry an RDD-id-dependent seed — if exchange reuse
    // ever fails to kick in (exchange.reuse=false, AQE divergence), the
    // pid→offset map would silently mismatch the window's partitioning.
    val sliced = spend
      .repartitionByRange(col("spend_cents").desc, col("o_custkey").asc)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = sliced.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.select(col("pid").as("bpid"), col("cnt").as("bcnt"))),
        col("bpid") < col("pid"), "left")
      .groupBy(col("pid"))
      .agg(coalesce(sum(col("bcnt")), lit(0L)).as("offset"))
    val n = spend.groupBy().agg(count(lit(1)).as("n"))
    sliced
      .withColumn("rn", row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("spend_cents").desc, col("o_custkey"))))
      .join(broadcast(offsets), "pid")
      .join(broadcast(n))
      .withColumn("decile",
        (expr("(rn + offset - 1) * 10 div n") + 1L).cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_custs"),
        min(col("spend_cents")).as("min_spend_cents"),
        max(col("spend_cents")).as("max_spend_cents"),
        sum(col("spend_cents")).as("total_spend_cents"),
        sum(col("n_orders")).as("n_orders"))
      .orderBy(col("decile"))
  }

  val qSpendDecilesOracle: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS spend_cents,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT *, row_number() OVER
      |    (ORDER BY spend_cents DESC, o_custkey) AS rn,
      |    count(*) OVER () AS n
      |  FROM spend),
      |dec AS (
      |  SELECT *, cast((rn - 1) * 10 // n + 1 AS int) AS decile FROM ranked)
      |SELECT decile, count(*) AS n_custs,
      |  min(spend_cents) AS min_spend_cents,
      |  max(spend_cents) AS max_spend_cents,
      |  cast(sum(spend_cents) AS bigint) AS total_spend_cents,
      |  cast(sum(n_orders) AS bigint) AS n_orders
      |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin

  /** Incremental aggregation maintenance (`q_incremental_agg`): the
    * monthly revenue rollup computed the way a 100 TB pipeline actually
    * maintains it — a FROZEN historical partial (orders before the
    * cutoff) merged with a fresh delta partial (orders on/after it), the
    * merge being a sum of partial (sum, count) states rather than a
    * re-scan of history. The oracle computes the same rollup DIRECTLY in
    * one pass, so the hash match PROVES the partial-merge path is
    * lossless — which is only true because revenue is carried as exact
    * integer cents end-to-end: float partial sums re-associate under
    * merge and would drift in the last ulp. Each partial is an ordinary
    * partial-agg shuffle on month; the merge is a |months|-row union+agg.
    * Cutoff 1997-01-01 splits the order history mid-range. */
  def qIncrementalAgg(spark: SparkSession, d: String): DataFrame = {
    val cents = (floor(col("o_totalprice") * 100 + lit(0.5))).cast("long")
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(cents).as("rev_cents"), count(lit(1)).as("n_orders"))
    val ord = Tables.orders(spark, d)
    val hist = partial(ord.filter(col("o_orderdate") < lit("1997-01-01")))
    val delta = partial(ord.filter(col("o_orderdate") >= lit("1997-01-01")))
    hist.unionAll(delta)
      .groupBy(col("month"))
      .agg(sum(col("rev_cents")).as("rev_cents"), sum(col("n_orders")).as("n_orders"))
      .orderBy(col("month"))
  }

  val qIncrementalAggOracle: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint) AS rev_cents,
      |  count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Month-over-month movers (`q_mom_delta`): per market segment, monthly
    * revenue in exact cents with the absolute and basis-point change vs
    * the prior month — the trend/regression report every revenue
    * dashboard publishes. Customer dim broadcasts into the fact scan;
    * the lag window partitions per segment over \|months\| rows, so the
    * window input is the AGGREGATED series, never the fact table. First
    * month per segment carries null deltas (no prior). */
  def qMomDelta(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).select(col("c_custkey"), col("c_mktsegment"))
    val cents = (floor(col("o_totalprice") * 100 + lit(0.5))).cast("long")
    val monthly = Tables.orders(spark, d)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(cents).as("rev_cents"))
    val w = Window.partitionBy(col("segment")).orderBy(col("month"))
    monthly
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .withColumn("delta_cents", col("rev_cents") - col("prev_cents"))
      .withColumn("delta_bp",
        when(col("prev_cents").isNotNull && col("prev_cents") =!= 0,
          expr("(rev_cents - prev_cents) * 10000 div prev_cents")))
      .select("segment", "month", "rev_cents", "delta_cents", "delta_bp")
      .orderBy("segment", "month")
  }

  val qMomDeltaOracle: String =
    """WITH m AS (
      |  SELECT c_mktsegment AS segment,
      |    date_trunc('month', o_orderdate) AS month,
      |    cast(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS bigint) AS rev_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |l AS (
      |  SELECT *, lag(rev_cents) OVER
      |    (PARTITION BY segment ORDER BY month) AS prev_cents
      |  FROM m)
      |SELECT segment, month, rev_cents,
      |  rev_cents - prev_cents AS delta_cents,
      |  -- both engines truncate integer division toward zero, so negative
      |  -- deltas agree (verified: -5 // 2 = -2 in DuckDB, -5 div 2 = -2 in Spark)
      |  CASE WHEN prev_cents IS NOT NULL AND prev_cents != 0
      |    THEN (rev_cents - prev_cents) * 10000 // prev_cents END AS delta_bp
      |FROM l ORDER BY 1, 2""".stripMargin

  /** Bloom runtime-filter join (`q_bloom_join`) — the semi-join pruning a
    * warehouse applies before shuffling a fact table into a selective join
    * (Spark's own `spark.sql.optimizer.runtime.bloomFilter` made explicit
    * and engine-checkable): urgent orders publish a 64 Kib two-hash Bloom
    * filter (ONE md5 per key — the k=2 hashes are the two halves of the
    * digest, the `docs_decontaminate_bloom` kernel), lineitem probes it
    * map-side via two broadcast word-table joins, and only surviving rows
    * enter the real join. The report prices the filter: probe volume,
    * bloom survivors, true matches (= the plain semi join, so false
    * positives are visible), and matched revenue in exact cents — at
    * 100 TB the win is the fact-side shuffle shrinking to the survivor
    * set while the filter stays m bits whatever the build side holds. */
  def qBloomJoin(spark: SparkSession, d: String, mBits: Int = 65536): DataFrame = {
    import graft.functions.Kernels.{hash60, hash60b}
    val wb = 62 // bits per filter word (sign + 62 usable; matches Dedup)
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val filt = urgent
      .select(explode(array(
        pmod(hash60(col("o_orderkey").cast("string")), lit(mBits.toLong)),
        pmod(hash60b(col("o_orderkey").cast("string")), lit(mBits.toLong)))).as("p"))
      .select(expr(s"p div $wb").as("word"),
        expr(s"shiftleft(cast(1 AS bigint), cast(p % $wb AS int))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
    val probe = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + lit(0.5))
          .cast("long").as("rev_cents"))
      .withColumn("p1", pmod(hash60(col("l_orderkey").cast("string")), lit(mBits.toLong)))
      .withColumn("p2", pmod(hash60b(col("l_orderkey").cast("string")), lit(mBits.toLong)))
      .join(broadcast(filt.select(col("word").as("w1"), col("bits").as("b1"))),
        expr(s"p1 div $wb") === col("w1"), "left")
      .join(broadcast(filt.select(col("word").as("w2"), col("bits").as("b2"))),
        expr(s"p2 div $wb") === col("w2"), "left")
      .withColumn("pass",
        col("b1").isNotNull &&
          expr(s"b1 & shiftleft(cast(1 AS bigint), cast(p1 % $wb AS int))") =!= 0L &&
          col("b2").isNotNull &&
          expr(s"b2 & shiftleft(cast(1 AS bigint), cast(p2 % $wb AS int))") =!= 0L)
    val joined = probe.filter(col("pass"))
      .join(urgent.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
    val stats = probe.groupBy()
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_bloom_pass"))
    val matched = joined.groupBy()
      .agg(count(lit(1)).as("n_matched"), sum(col("rev_cents")).as("matched_rev_cents"))
    stats.crossJoin(matched)
      .select(col("n_probe"), col("n_bloom_pass"), col("n_matched"),
        (col("n_bloom_pass") - col("n_matched")).as("n_false_positive"),
        col("matched_rev_cents"))
  }

  val qBloomJoinOracle: String = {
    import graft.functions.Kernels.{sqlHash60, sqlHash60b}
    s"""WITH urgent AS (
       |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
       |pos AS (
       |  SELECT ${sqlHash60("cast(o_orderkey AS varchar)")} % 65536 AS p FROM urgent
       |  UNION ALL
       |  SELECT ${sqlHash60b("cast(o_orderkey AS varchar)")} % 65536 AS p FROM urgent),
       |filt AS (
       |  SELECT p // 62 AS word,
       |    bit_or(cast(1 AS bigint) << cast(p % 62 AS int)) AS bits
       |  FROM pos GROUP BY 1),
       |probe AS (
       |  SELECT l_orderkey,
       |    cast(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS bigint)
       |      AS rev_cents,
       |    ${sqlHash60("cast(l_orderkey AS varchar)")} % 65536 AS p1,
       |    ${sqlHash60b("cast(l_orderkey AS varchar)")} % 65536 AS p2
       |  FROM lineitem),
       |flags AS (
       |  SELECT l_orderkey, rev_cents,
       |    (f1.bits IS NOT NULL
       |      AND (f1.bits & (cast(1 AS bigint) << cast(p1 % 62 AS int))) != 0
       |      AND f2.bits IS NOT NULL
       |      AND (f2.bits & (cast(1 AS bigint) << cast(p2 % 62 AS int))) != 0) AS pass
       |  FROM probe
       |  LEFT JOIN filt f1 ON f1.word = p1 // 62
       |  LEFT JOIN filt f2 ON f2.word = p2 // 62),
       |m AS (
       |  SELECT count(*) AS n_matched,
       |    cast(sum(rev_cents) AS bigint) AS matched_rev_cents
       |  FROM flags WHERE pass AND l_orderkey IN (SELECT o_orderkey FROM urgent)),
       |s AS (
       |  SELECT count(*) AS n_probe,
       |    cast(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS bigint) AS n_bloom_pass
       |  FROM flags)
       |SELECT n_probe, n_bloom_pass, n_matched,
       |  n_bloom_pass - n_matched AS n_false_positive, matched_rev_cents
       |FROM s, m""".stripMargin
  }

  /** Incremental JOIN-view maintenance (`q_delta_join`) — the join twin of
    * `q_incremental_agg`: the materialized view V = σ_urgent(orders) ⋈
    * lineitem, aggregated to monthly revenue, is maintained by the delta
    * rule V' = V ∪ (ΔA ⋈ B) when a new month of orders arrives — the
    * historical partial is FROZEN (never re-scanned, never re-joined);
    * only the delta batch joins against lineitem. The oracle computes the
    * view DIRECTLY from the full join, so the hash match PROVES the delta
    * rule lossless — true only because revenue rides exact integer cents
    * (float partials re-associate under the merge union). Each path is an
    * ordinary shuffle join + partial agg; the merge is a \|months\|-row
    * union+agg. */
  def qDeltaJoin(spark: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1997-01-01")
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + lit(0.5))
          .cast("long").as("rev_cents"))
    def view(ord: DataFrame): DataFrame = ord
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("rev_cents")).as("rev_cents"), count(lit(1)).as("n_lines"))
    val urgent = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val frozen = view(urgent.filter(col("o_orderdate") < cutoff))
    val delta = view(urgent.filter(col("o_orderdate") >= cutoff))
    frozen.unionAll(delta)
      .groupBy(col("month"))
      .agg(sum(col("rev_cents")).as("rev_cents"), sum(col("n_lines")).as("n_lines"))
      .orderBy(col("month"))
  }

  val qDeltaJoinOracle: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  cast(sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
      |    AS bigint)) AS bigint) AS rev_cents,
      |  count(*) AS n_lines
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Referential-integrity audit (`q_integrity_audit`) — the foreign-key
    * constraint suite a lake runs where a warehouse would have enforced
    * FKs (Deequ's isContainedIn/uniqueness checks): orphaned fact rows
    * (lineitem → orders), childless parents (orders without lines — a
    * real condition in this data), and dangling dims (orders → customer),
    * each as a LEFT ANTI join — the shuffle is key-only, violations in
    * exact basis points. At 100 TB every check is one hash-partitioned
    * anti join; nothing ever materializes the non-violating side. */
  def qIntegrityAudit(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"))
    val cust = Tables.customer(spark, d).select(col("c_custkey"))
    def audit(name: String, violations: DataFrame, total: DataFrame): DataFrame = {
      val v = violations.groupBy().agg(count(lit(1)).as("n_violations"))
      val t = total.groupBy().agg(count(lit(1)).as("n_total"))
      v.crossJoin(t).select(lit(name).as("check"), col("n_violations"), col("n_total"),
        expr("n_violations * 10000 div n_total").as("violation_bp"))
    }
    audit("lineitem_orphan_orderkey",
        li.join(ord.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti"), li)
      .unionAll(audit("orders_childless",
        ord.select(col("o_orderkey")).join(li.select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"), "left_anti"), ord))
      .unionAll(audit("orders_dangling_custkey",
        ord.select(col("o_custkey")).join(cust.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti"), ord))
      .orderBy(col("check"))
  }

  val qIntegrityAuditOracle: String =
    """WITH a AS (
      |  SELECT 'lineitem_orphan_orderkey' AS check,
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
      |    (SELECT count(*) FROM lineitem) AS n_total
      |  UNION ALL
      |  SELECT 'orders_childless',
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)),
      |    (SELECT count(*) FROM orders)
      |  UNION ALL
      |  SELECT 'orders_dangling_custkey',
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |    (SELECT count(*) FROM orders))
      |SELECT "check", n_violations, n_total,
      |  n_violations * 10000 // n_total AS violation_bp
      |FROM a ORDER BY 1""".stripMargin

  /** Column-profile report (`q_data_profile`) — the per-column statistics
    * pass a data catalog materializes (Deequ/Great-Expectations profiling):
    * count / nulls / exact distinct / integer min-max for each audited
    * orders column, numerics normalized to exact integers (cents, epoch
    * seconds) so the profile hashes cross-engine. ONE scan computes every
    * column's aggregates side by side; the per-column rows come from
    * exploding the 1-row aggregate — the unpivot costs nothing at any
    * scale. Exact countDistinct per column shuffles one digest set per
    * column (the HLL sketch family is the approximate path at 100 TB). */
  def qDataProfile(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
      .select(col("o_orderkey"),
        col("o_custkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("price_cents"),
        unix_timestamp(col("o_orderdate")).as("date_sec"))
    val agg = ord.groupBy().agg(
      count(lit(1)).as("n"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
      countDistinct(col("o_orderkey")).as("nd_key"),
      min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      countDistinct(col("o_custkey")).as("nd_cust"),
      min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
      sum(when(col("price_cents").isNull, 1L).otherwise(0L)).as("null_price"),
      countDistinct(col("price_cents")).as("nd_price"),
      min(col("price_cents")).as("min_price"), max(col("price_cents")).as("max_price"),
      sum(when(col("date_sec").isNull, 1L).otherwise(0L)).as("null_date"),
      countDistinct(col("date_sec")).as("nd_date"),
      min(col("date_sec")).as("min_date"), max(col("date_sec")).as("max_date"))
    agg.select(col("n"), explode(array(
        struct(lit("o_orderkey").as("column"), col("null_key").as("n_null"),
          col("nd_key").as("n_distinct"), col("min_key").as("min_v"), col("max_key").as("max_v")),
        struct(lit("o_custkey").as("column"), col("null_cust").as("n_null"),
          col("nd_cust").as("n_distinct"), col("min_cust").as("min_v"), col("max_cust").as("max_v")),
        struct(lit("o_totalprice_cents").as("column"), col("null_price").as("n_null"),
          col("nd_price").as("n_distinct"), col("min_price").as("min_v"), col("max_price").as("max_v")),
        struct(lit("o_orderdate_sec").as("column"), col("null_date").as("n_null"),
          col("nd_date").as("n_distinct"), col("min_date").as("min_v"), col("max_date").as("max_v"))
      )).as("p"))
      .select(col("p.column").as("column"), col("n"), col("p.n_null").as("n_null"),
        col("p.n_distinct").as("n_distinct"), col("p.min_v").as("min_v"),
        col("p.max_v").as("max_v"))
      .orderBy(col("column"))
  }

  val qDataProfileOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS price_cents,
      |    cast(floor(epoch(o_orderdate)) AS bigint) AS date_sec
      |  FROM orders)
      |SELECT 'o_orderkey' AS "column", count(*) AS n,
      |  cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_null,
      |  count(DISTINCT o_orderkey) AS n_distinct,
      |  min(o_orderkey) AS min_v, max(o_orderkey) AS max_v FROM o
      |UNION ALL
      |SELECT 'o_custkey', count(*),
      |  cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint),
      |  count(DISTINCT o_custkey), min(o_custkey), max(o_custkey) FROM o
      |UNION ALL
      |SELECT 'o_totalprice_cents', count(*),
      |  cast(sum(CASE WHEN price_cents IS NULL THEN 1 ELSE 0 END) AS bigint),
      |  count(DISTINCT price_cents), min(price_cents), max(price_cents) FROM o
      |UNION ALL
      |SELECT 'o_orderdate_sec', count(*),
      |  cast(sum(CASE WHEN date_sec IS NULL THEN 1 ELSE 0 END) AS bigint),
      |  count(DISTINCT date_sec), min(date_sec), max(date_sec) FROM o
      |ORDER BY 1""".stripMargin

  /** Per-order item ceiling for [[marketBasket]]'s pair self-join — see
    * the cap note there; [[basketStats]] is the audited channel. TPC-H
    * baskets hold ≤ 7 distinct parts at every SF, so 64 never bites on
    * gate data. */
  val MaxBasketItems = 64

  /** Basket-size ledger (`q_basket_stats`) — the audited channel behind
    * [[marketBasket]]'s [[MaxBasketItems]] ceiling (the family convention:
    * every capped self-join publishes its occupancy): orders and items
    * total, orders/items the cap excludes, the largest basket, and
    * Σ C(items,2) over kept orders — the exact pair budget the capped
    * self-join pays, provably ≤ maxBasket·items/2. One distinct + one
    * per-order partial aggregate; constant-size output. */
  def basketStats(spark: SparkSession, d: String,
      maxBasket: Int = MaxBasketItems): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("c")).as("n_items"),
        sum(when(col("c") > maxBasket, 1L).otherwise(0L)).as("n_capped_orders"),
        sum(when(col("c") > maxBasket, col("c")).otherwise(0L)).as("n_dropped_items"),
        max(col("c")).as("max_basket"),
        sum(when(col("c") <= maxBasket, expr("c * (c - 1) div 2"))
          .otherwise(0L)).as("kept_pair_budget"))

  val basketStatsOracle: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |h AS (SELECT l_orderkey, count(*) AS c FROM li GROUP BY 1)
       |SELECT count(*) AS n_orders,
       |  cast(sum(c) AS bigint) AS n_items,
       |  cast(sum(CASE WHEN c > $MaxBasketItems THEN 1 ELSE 0 END) AS bigint)
       |    AS n_capped_orders,
       |  cast(sum(CASE WHEN c > $MaxBasketItems THEN c ELSE 0 END) AS bigint)
       |    AS n_dropped_items,
       |  max(c) AS max_basket,
       |  cast(sum(CASE WHEN c <= $MaxBasketItems THEN c * (c - 1) // 2
       |    ELSE 0 END) AS bigint) AS kept_pair_budget
       |FROM h""".stripMargin

  /** Market-basket affinity (`q_market_basket`) — the top co-purchased part
    * pairs with support and lift: the classic association-rule readout a
    * retail analytics engine serves ("customers who bought A also bought
    * B"). Support = orders containing both parts; lift (in basis points) =
    * support·N / (cnt_a·cnt_b) — >10000 means the pair co-occurs more than
    * independence predicts.
    *
    * Plan shape: one distinct (order, part) projection feeds BOTH sides of
    * the pair self-join, so the orderkey exchange is computed once and
    * reused (ReusedExchange); baskets are bounded (≤7 lines/order in
    * TPC-H), so the pair explosion is ≤ C(7,2)·\|orders\| — linear in the
    * fact table, never quadratic in the catalog. Per-part counts join the
    * \|parts\|-sized dimension aggregate, the one-row order total is a
    * broadcast, and the global top-20 plans as TakeOrderedAndProject
    * (distributed partial top-k). All-integer lift — bit-exact oracle. */
  def marketBasket(spark: SparkSession, d: String, k: Int = 20,
      maxBasket: Int = MaxBasketItems): DataFrame = {
    // pin the distinct (order, part) projection (r15): four consumers
    // (ceiling pass, order total, per-part counts, both pair-join sides)
    // replayed the scan+distinct — 20 parquet scans. The ceiling join
    // itself stays UNPINNED so the basket-cap filter remains in the
    // executed plan (PlanSpec's cap guard).
    val li0 = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    // per-order item ceiling (the MaxShingleDf/MaxKnnBucket family
    // convention): the pair explosion is Σ C(items,2) per order — bounded
    // at ≤7 on TPC-H but a latent |basket|² on arbitrary data, so baskets
    // above the ceiling are excluded (a 10k-item "basket" is a feed bug or
    // a bot, not an affinity signal) and the drop is published by the
    // oracle-checked [[basketStats]] ledger. The keep-join shuffles on
    // l_orderkey, the same key as the pair self-join — one exchange,
    // reused. Ceiling sits far above every gate-SF max basket, so gate
    // results are bit-identical to the uncapped form.
    val keep = li0.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxBasket).select(col("l_orderkey"))
    val li = li0.join(keep, "l_orderkey")
    val tot = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val pc = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
    pairs
      .join(pc.withColumnRenamed("l_partkey", "part_a").withColumnRenamed("cnt", "cnt_a"), "part_a")
      .join(pc.withColumnRenamed("l_partkey", "part_b").withColumnRenamed("cnt", "cnt_b"), "part_b")
      .join(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("support"), col("cnt_a"), col("cnt_b"),
        expr("support * n_orders * 10000 div (cnt_a * cnt_b)").as("lift_bp"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Broadcastability audit (`q_broadcast_audit`) — the planner-adjacent
    * report behind every `broadcast()` hint this library places: for each
    * dimension table, its row count, estimated in-memory bytes (string
    * bytes + 8 per numeric column — the flat-row estimate), and whether
    * it clears Spark's default 10 MiB autoBroadcastJoinThreshold. The
    * operational question at 100 TB is WHICH side of each join stays a
    * broadcast as dimensions grow — this is the table that answers it
    * before a plan silently flips to sort-merge. One aggregate per
    * FIXED table, unioned to a 5-row report. */
  def broadcastAudit(spark: SparkSession, d: String): DataFrame = {
    def audit(name: String, df: DataFrame, strCols: Seq[String],
        numCols: Int): DataFrame = {
      val strBytes = strCols.map(c => sum(length(col(c)).cast("long")))
        .reduceOption(_ + _).getOrElse(lit(0L))
      df.agg(lit(name).as("table_name"), count(lit(1)).as("n_rows"),
        (strBytes + count(lit(1)) * (8L * numCols)).as("est_bytes"))
        .select(col("table_name"), col("n_rows"), col("est_bytes"),
          (col("est_bytes") <= 10L * 1024 * 1024).cast("long").as("broadcastable"))
    }
    audit("region", Tables.region(spark, d), Seq("r_name"), 1)
      .unionAll(audit("nation", Tables.nation(spark, d), Seq("n_name"), 2))
      .unionAll(audit("supplier", Tables.supplier(spark, d), Seq("s_name"), 3))
      .unionAll(audit("customer", Tables.customer(spark, d),
        Seq("c_name", "c_mktsegment"), 3))
      .unionAll(audit("part", Tables.part(spark, d),
        Seq("p_name", "p_brand", "p_type"), 3))
      .orderBy(col("table_name"))
  }

  val broadcastAuditOracle: String =
    """SELECT * FROM (
      |SELECT 'region' AS table_name, count(*) AS n_rows,
      |  cast(sum(length(r_name)) + count(*) * 8 AS bigint) AS est_bytes,
      |  cast(CASE WHEN sum(length(r_name)) + count(*) * 8 <= 10485760
      |    THEN 1 ELSE 0 END AS bigint) AS broadcastable
      |FROM region
      |UNION ALL
      |SELECT 'nation', count(*),
      |  cast(sum(length(n_name)) + count(*) * 16 AS bigint),
      |  cast(CASE WHEN sum(length(n_name)) + count(*) * 16 <= 10485760
      |    THEN 1 ELSE 0 END AS bigint)
      |FROM nation
      |UNION ALL
      |SELECT 'supplier', count(*),
      |  cast(sum(length(s_name)) + count(*) * 24 AS bigint),
      |  cast(CASE WHEN sum(length(s_name)) + count(*) * 24 <= 10485760
      |    THEN 1 ELSE 0 END AS bigint)
      |FROM supplier
      |UNION ALL
      |SELECT 'customer', count(*),
      |  cast(sum(length(c_name) + length(c_mktsegment)) + count(*) * 24
      |    AS bigint),
      |  cast(CASE WHEN sum(length(c_name) + length(c_mktsegment))
      |    + count(*) * 24 <= 10485760 THEN 1 ELSE 0 END AS bigint)
      |FROM customer
      |UNION ALL
      |SELECT 'part', count(*),
      |  cast(sum(length(p_name) + length(p_brand) + length(p_type))
      |    + count(*) * 24 AS bigint),
      |  cast(CASE WHEN sum(length(p_name) + length(p_brand) + length(p_type))
      |    + count(*) * 24 <= 10485760 THEN 1 ELSE 0 END AS bigint)
      |FROM part
      |) ORDER BY table_name""".stripMargin

  /** Incremental DISTINCT-view maintenance (`q_delta_distinct`) — the
    * third member of the incremental family (agg: `q_incremental_agg`,
    * join: `q_delta_join`): the distinct (partkey, suppkey) pair view V
    * maintained by V′ = V ∪ (Δ ∖ V) — the FROZEN historical distinct is
    * never re-scanned, the delta batch (lines shipped after the epoch-µs
    * midpoint) is reduced to its own distinct and anti-joined against V,
    * and only genuinely-new pairs append. The oracle computes the view
    * DIRECTLY from the full table, so the hash match PROVES the
    * anti-join increment lossless. Both distincts are ordinary hash
    * shuffles on the pair key; the anti join co-partitions on the same
    * key. Output: the maintained view size + append accounting. */
  def deltaDistinct(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
    val mid = li.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val withHalf = li.join(broadcast(mid))
    val hist = withHalf.filter(col("us") <= col("mid_us"))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val delta = withHalf.filter(col("us") > col("mid_us"))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val appended = delta.join(hist, Seq("l_partkey", "l_suppkey"), "left_anti")
    val nHist = hist.agg(count(lit(1)).as("n_hist"))
    val nDelta = delta.agg(count(lit(1)).as("n_delta"))
    val nApp = appended.agg(count(lit(1)).as("n_appended"))
    nHist.join(nDelta).join(nApp)
      .select(col("n_hist"), col("n_delta"), col("n_appended"),
        (col("n_hist") + col("n_appended")).as("view_size"))
  }

  val deltaDistinctOracle: String =
    """WITH li AS (
      |  SELECT l_partkey, l_suppkey, epoch_us(l_shipdate) AS us
      |  FROM lineitem),
      |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM li),
      |hist AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM li, mid WHERE us <= mid_us),
      |delta AS (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM li, mid WHERE us > mid_us),
      |app AS (
      |  SELECT * FROM delta WHERE NOT EXISTS (
      |    SELECT 1 FROM hist
      |    WHERE hist.l_partkey = delta.l_partkey
      |      AND hist.l_suppkey = delta.l_suppkey)),
      |direct AS (SELECT DISTINCT l_partkey, l_suppkey FROM li)
      |SELECT (SELECT count(*) FROM hist) AS n_hist,
      |  (SELECT count(*) FROM delta) AS n_delta,
      |  (SELECT count(*) FROM app) AS n_appended,
      |  (SELECT count(*) FROM direct) AS view_size""".stripMargin

  /** Partitioning advisor (`q_partition_advisor`) — the layout decision a
    * lake engineer makes before writing 100 TB: for each candidate
    * partition column of `orders` (priority, status, order month), its
    * cardinality, the largest partition's share in basis points (skew —
    * a hot partition defeats pruning AND parallelism), and the mean rows
    * per partition. Too few partitions = no pruning; too many = small
    * files; skew = stragglers: the three failure modes in one table. One
    * aggregate per candidate over the same scan, unioned to a
    * \|candidates\|-row report — candidate set is FIXED, so the report
    * shape never scales with data. Month derived arithmetically from
    * epoch-µs (30-day buckets, the `ev_stickiness` rule). */
  def partitionAdvisor(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate AS timestamp)) div 86400000000 div 30")
          .as("omonth"))
    def audit(colName: String, key: Column): DataFrame =
      o.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
        .agg(lit(colName).as("candidate"),
          count(lit(1)).as("n_partitions"),
          expr("max(n) * 10000 div sum(n)").as("max_share_bp"),
          expr("sum(n) div count(1)").as("mean_rows"))
    audit("o_orderpriority", col("o_orderpriority"))
      .unionAll(audit("o_orderstatus", col("o_orderstatus")))
      .unionAll(audit("order_month", col("omonth").cast("string")))
      .orderBy(col("candidate"))
  }

  val partitionAdvisorOracle: String =
    """WITH o AS (
      |  SELECT o_orderpriority, o_orderstatus,
      |    epoch_us(o_orderdate) // 86400000000 // 30 AS omonth
      |  FROM orders),
      |a1 AS (SELECT o_orderpriority AS k, count(*) AS n FROM o GROUP BY 1),
      |a2 AS (SELECT o_orderstatus AS k, count(*) AS n FROM o GROUP BY 1),
      |a3 AS (SELECT cast(omonth AS varchar) AS k, count(*) AS n FROM o GROUP BY 1)
      |SELECT 'o_orderpriority' AS candidate, count(*) AS n_partitions,
      |  cast(max(n) * 10000 // sum(n) AS bigint) AS max_share_bp,
      |  cast(sum(n) // count(*) AS bigint) AS mean_rows FROM a1
      |UNION ALL
      |SELECT 'o_orderstatus', count(*),
      |  cast(max(n) * 10000 // sum(n) AS bigint),
      |  cast(sum(n) // count(*) AS bigint) FROM a2
      |UNION ALL
      |SELECT 'order_month', count(*),
      |  cast(max(n) * 10000 // sum(n) AS bigint),
      |  cast(sum(n) // count(*) AS bigint) FROM a3
      |ORDER BY 1""".stripMargin

  /** Join-cardinality estimation audit (`q_join_card_est`) — the query
    * planner's join-size problem surfaced as an operator: the EXACT
    * self-join cardinality of events on user_id (Σ_k a_k² over the
    * per-key count histogram — computed from the \|keys\|-row aggregate,
    * never by materializing the join) beside a deterministic 1-in-4
    * key-sample estimate (md5 key routing, the `docs_split` rule) scaled
    * ×4, with the signed error in basis points. The number a
    * cost-based optimizer needs before choosing broadcast vs shuffle vs
    * salting — and the audit that shows when sampling lies (skewed keys
    * outside the sample). One corpus pass → per-key counts; everything
    * after is \|keys\|-row integer arithmetic. */
  def joinCardEst(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Kernels.hash31
    val keys = Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("a"))
      .withColumn("sampled",
        (pmod(hash31(concat(lit("card:"), col("user_id").cast("string"))),
          lit(4L)) === 0).cast("long"))
    keys.agg(
      count(lit(1)).as("n_keys"),
      sum(col("a") * col("a")).as("exact_pairs"),
      (sum(col("a") * col("a") * col("sampled")) * 4).as("est_pairs"),
      sum(col("sampled")).as("n_sampled"))
      .select(col("n_keys"), col("n_sampled"), col("exact_pairs"),
        col("est_pairs"),
        expr("(est_pairs - exact_pairs) * 10000 div exact_pairs").as("err_bp"))
  }

  val joinCardEstOracle: String = {
    import graft.functions.Kernels.sqlHash31
    s"""WITH keys AS (
      |  SELECT user_id, count(*) AS a,
      |    CASE WHEN ${sqlHash31("concat('card:', cast(user_id AS varchar))")}
      |      % 4 = 0 THEN 1 ELSE 0 END AS sampled
      |  FROM events GROUP BY 1)
      |SELECT count(*) AS n_keys,
      |  cast(sum(sampled) AS bigint) AS n_sampled,
      |  cast(sum(a * a) AS bigint) AS exact_pairs,
      |  cast(sum(a * a * sampled) * 4 AS bigint) AS est_pairs,
      |  cast((sum(a * a * sampled) * 4 - sum(a * a)) * 10000
      |    // sum(a * a) AS bigint) AS err_bp
      |FROM keys""".stripMargin
  }

  /** Customer segment migration (`q_segment_migration`) — the
    * cohort-movement matrix a retention team reads: customers segmented
    * low/mid/high by spend in each HALF of the timeline (split at the
    * epoch-µs midpoint), the output counts every (first-half segment →
    * second-half segment) move including `none` (acquired / churned).
    * Segments are RELATIVE to each half's own mean spend (floor-div, so
    * the cut is exact integer: <50% of mean = low, <200% = mid, else
    * high) — SF-independent where absolute thresholds would rot.
    * Plan: one fact pass → per (customer, half) partial agg, the 2-row
    * mean model broadcast back, halves pivoted by conditional max (no
    * pivot shuffle — the `ev_pivot_hour` rule), ≤16-row matrix out. */
  def segmentMigration(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val mid = o.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val spend = o.join(broadcast(mid))
      .select(col("o_custkey"),
        when(col("us") <= col("mid_us"), "h1").otherwise("h2").as("half"),
        col("cents"))
      .groupBy(col("o_custkey"), col("half"))
      .agg(sum(col("cents")).as("spend"))
    val means = spend.groupBy(col("half"))
      .agg(expr("sum(spend) div count(1)").as("mean_spend"))
    val seg = spend.join(broadcast(means), "half")
      .withColumn("ratio_bp", expr("spend * 10000 div mean_spend"))
      .select(col("o_custkey"), col("half"),
        when(col("ratio_bp") < 5000, "low")
          .when(col("ratio_bp") < 20000, "mid")
          .otherwise("high").as("seg"))
    seg.groupBy(col("o_custkey"))
      .agg(coalesce(max(when(col("half") === "h1", col("seg"))), lit("none"))
        .as("seg_h1"),
        coalesce(max(when(col("half") === "h2", col("seg"))), lit("none"))
          .as("seg_h2"))
      .groupBy(col("seg_h1"), col("seg_h2"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("seg_h1"), col("seg_h2"))
  }

  val segmentMigrationOracle: String =
    """WITH o AS (
      |  SELECT o_custkey, epoch_us(o_orderdate) AS us,
      |    cast(round(o_totalprice * 100) AS bigint) AS cents
      |  FROM orders),
      |mid AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM o),
      |spend AS (
      |  SELECT o_custkey,
      |    CASE WHEN us <= mid_us THEN 'h1' ELSE 'h2' END AS half,
      |    sum(cents) AS spend
      |  FROM o, mid GROUP BY 1, 2),
      |means AS (
      |  SELECT half, sum(spend) // count(*) AS mean_spend
      |  FROM spend GROUP BY 1),
      |seg AS (
      |  SELECT o_custkey, spend.half,
      |    CASE WHEN spend * 10000 // mean_spend < 5000 THEN 'low'
      |         WHEN spend * 10000 // mean_spend < 20000 THEN 'mid'
      |         ELSE 'high' END AS seg
      |  FROM spend JOIN means ON spend.half = means.half),
      |wide AS (
      |  SELECT o_custkey,
      |    coalesce(max(CASE WHEN half = 'h1' THEN seg END), 'none') AS seg_h1,
      |    coalesce(max(CASE WHEN half = 'h2' THEN seg END), 'none') AS seg_h2
      |  FROM seg GROUP BY 1)
      |SELECT seg_h1, seg_h2, count(*) AS n_customers
      |FROM wide GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Banded Pareto / ABC analysis (`q_pareto_bands`) — the concentration
    * report behind "80% of revenue comes from the top suppliers": suppliers
    * bucket into LOG-LINEAR revenue bands (octave = bit-length of gross
    * cents, 64 linear sub-buckets per octave — the quantile sketch's
    * HdrHistogram-style geometry, ≤1.6% relative band width), each band
    * reporting its supplier count, revenue, cumulative revenue share from
    * the richest band down, and the ABC class the cumulative share
    * implies (A ≤ 80%, B ≤ 95%, else C). The EXACT per-supplier ABC cut
    * needs a global revenue sort; the banded form is its distributed
    * sketch — band count bounded by the VALUE RANGE (64·octaves rows at
    * any corpus size), cut points off by at most one band width, no
    * global sort or unpartitioned window anywhere. Cumulative rides the
    * broadcast inequality join over the checkpointed band rows (the
    * `dedup_threshold_curve` shape); all integer. */
  def paretoBands(spark: SparkSession, d: String): DataFrame = {
    val bands = Tables.lineitem(spark, d)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_suppkey")).agg(sum(col("cents")).as("rev"))
      .withColumn("e", length(bin(col("rev"))))
      .groupBy(expr("cast(e AS bigint) * 64 + rev * 64 div shiftleft(1L, e - 1) - 64")
        .as("band"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("rev")).as("rev_cents"))
      .localCheckpoint()
    val tot = bands.agg(sum(col("rev_cents")).as("total"))
    val cum = bands.select(col("band").as("b2"), col("rev_cents").as("rc2"))
    bands.join(broadcast(cum), col("b2") >= col("band"))
      .groupBy(col("band"))
      .agg(max(col("n_suppliers")).as("n_suppliers"),
        max(col("rev_cents")).as("rev_cents"),
        sum(col("rc2")).as("cum_rev"))
      .join(broadcast(tot))
      .select(col("band"), col("n_suppliers"), col("rev_cents"),
        expr("cum_rev * 10000 div total").as("cum_share_bp"))
      .withColumn("abc_class",
        when(col("cum_share_bp") <= 8000, "A")
          .when(col("cum_share_bp") <= 9500, "B")
          .otherwise("C"))
      .orderBy(col("band").desc)
  }

  val paretoBandsOracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(cast(round(l_extendedprice * 100) AS bigint)) AS rev
      |  FROM lineitem GROUP BY 1),
      |bands AS (
      |  SELECT cast(length(bin(rev)) * 64
      |      + rev * 64 // (1::bigint << (length(bin(rev)) - 1)) - 64
      |      AS bigint) AS band,
      |    count(*) AS n_suppliers, cast(sum(rev) AS bigint) AS rev_cents
      |  FROM rev GROUP BY 1),
      |tot AS (SELECT sum(rev_cents) AS total FROM bands),
      |cum AS (
      |  SELECT b.band, max(b.n_suppliers) AS n_suppliers,
      |    max(b.rev_cents) AS rev_cents, sum(c.rev_cents) AS cum_rev
      |  FROM bands b JOIN bands c ON c.band >= b.band
      |  GROUP BY 1)
      |SELECT band, n_suppliers, rev_cents,
      |  cast(cum_rev * 10000 // total AS bigint) AS cum_share_bp,
      |  CASE WHEN cum_rev * 10000 // total <= 8000 THEN 'A'
      |       WHEN cum_rev * 10000 // total <= 9500 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM cum, tot ORDER BY band DESC""".stripMargin

  val marketBasketOracle: String =
    s"""WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |keep AS (SELECT l_orderkey FROM li0 GROUP BY 1
      |  HAVING count(*) <= $MaxBasketItems),
      |li AS (SELECT li0.* FROM li0 JOIN keep USING (l_orderkey)),
      |tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
      |pc AS (SELECT l_partkey, count(*) AS cnt FROM li GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |    count(*) AS support
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, support, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
      |  cast(support * n_orders * 10000 // (ca.cnt * cb.cnt) AS bigint) AS lift_bp
      |FROM pairs
      |JOIN pc ca ON pairs.part_a = ca.l_partkey
      |JOIN pc cb ON pairs.part_b = cb.l_partkey, tot
      |ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin
}
