package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the event stream — capabilities Spark SQL
  * lacks as built-ins, composed from existing operators per the preference
  * order in SURVEY §4 (compose > custom expression > custom plan): both
  * shapes below need no custom physical operator to be shuffle-optimal.
  */
object Joins {

  /** As-of join: for every purchase, the same user's latest click at or
    * before it.
    *
    * Implemented as the union + running-last window composition: tag both
    * sides, sort each user's timeline once, and carry the last click forward.
    * One shuffle (by user), no range predicate, no per-row probe — at 100 TB
    * this is strictly better than a join with an inequality condition, which
    * Spark would execute as a broadcast/nested-loop probe. Ties (click and
    * purchase in the same second) order the click first, so a same-second
    * click counts as "before".
    */
  def asofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsec"), col("event_id"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"))
    val timeline = Window.partitionBy(col("user_id"))
      .orderBy(col("tsec"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("c_id", last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(timeline))
      .withColumn("c_tsec", last(when(col("kind") === 0, col("tsec")), ignoreNulls = true).over(timeline))
      .filter(col("kind") === 1)
      .select(col("event_id").as("p_id"), col("user_id"), col("tsec").as("p_tsec"),
        col("c_id"), col("c_tsec"), (col("tsec") - col("c_tsec")).as("gap_sec"))
      .orderBy(col("p_id"))
  }

  val asofJoinOracle: String =
    """WITH tagged AS (
      |  SELECT user_id, cast(floor(epoch(ts)) AS bigint) AS tsec, event_id,
      |    CASE WHEN event_type='click' THEN 0 ELSE 1 END AS kind
      |  FROM events WHERE event_type IN ('click','purchase')),
      |w AS (
      |  SELECT *,
      |    last_value(CASE WHEN kind=0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tsec, kind, event_id
      |            ROWS UNBOUNDED PRECEDING) AS c_id,
      |    last_value(CASE WHEN kind=0 THEN tsec END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tsec, kind, event_id
      |            ROWS UNBOUNDED PRECEDING) AS c_tsec
      |  FROM tagged)
      |SELECT event_id AS p_id, user_id, tsec AS p_tsec, c_id, c_tsec,
      |  tsec - c_tsec AS gap_sec
      |FROM w WHERE kind=1 ORDER BY p_id""".stripMargin

  /** Bucketed range join: errors within `windowSec` after each purchase.
    *
    * The range predicate is turned into an equi-join on a time bucket of
    * width `windowSec`: each purchase probes its own bucket and the next
    * one (explode of 2 keys), then the exact range filter runs on the
    * matched pairs. Shuffle keys are (user, bucket), so the work is
    * proportional to events-per-bucket — the standard way to keep an
    * interval join from degenerating into a per-user cross product.
    */
  def rangeJoin(spark: SparkSession, d: String, windowSec: Long = 86400L): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_timestamp(col("ts")).as("p_tsec"))
      .withColumn("pb", floor(col("p_tsec") / windowSec).cast("long"))
      .withColumn("bucket", explode(array(col("pb"), col("pb") + 1)))
      .drop("pb")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_timestamp(col("ts")).as("e_tsec"))
      .withColumn("bucket", floor(col("e_tsec") / windowSec).cast("long"))
    purchases.join(errors, Seq("user_id", "bucket"))
      .filter(col("e_tsec") > col("p_tsec") && col("e_tsec") <= col("p_tsec") + windowSec)
      .groupBy(col("p_id"), col("user_id"))
      .agg(count(lit(1)).as("n_errors"),
        min(col("e_tsec") - col("p_tsec")).as("first_gap_sec"))
      .orderBy(col("p_id"))
  }

  val rangeJoinOracle: String =
    """SELECT p.event_id AS p_id, p.user_id, count(*) AS n_errors,
      |  min(e.tsec - p.tsec) AS first_gap_sec
      |FROM (SELECT user_id, event_id, cast(floor(epoch(ts)) AS bigint) AS tsec
      |      FROM events WHERE event_type='purchase') p
      |JOIN (SELECT user_id, cast(floor(epoch(ts)) AS bigint) AS tsec
      |      FROM events WHERE event_type='error') e
      |  ON e.user_id = p.user_id AND e.tsec > p.tsec AND e.tsec <= p.tsec + 86400
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Salted join — the skew defense for a fact⋈dim join where a handful of
    * hot keys would pin single reducers: the dim side replicates ×nSalts
    * (explode over the salt range — dims are small, replication is cheap),
    * the fact side computes a deterministic salt from its own row id, and
    * the join runs on (key, salt) — a hot key's rows spread over nSalts
    * reducers instead of one. Identical result to the unsalted join (the
    * oracle runs the plain form). AQE's skew-join split is the runtime
    * alternative; salting is the declarative-plan guarantee. */
  def skewJoinSalted(spark: SparkSession, d: String, nSalts: Int = 16): DataFrame = {
    val ev = Tables.events(spark, d)
    val fact = ev.select(col("user_id"), col("event_type"), col("event_id"))
      .withColumn("salt", pmod(col("event_id"), lit(nSalts.toLong)))
    val dim = ev.groupBy(col("user_id"))
      .agg(round(sum(col("value")), 2).as("user_total"))
      .withColumn("salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    fact.join(dim, Seq("user_id", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("user_total")), 4).as("avg_user_total"))
      .orderBy(col("event_type"))
  }

  val skewJoinSaltedOracle: String =
    """WITH dim AS (
      |  SELECT user_id, round(sum(value), 2) AS user_total
      |  FROM events GROUP BY 1)
      |SELECT event_type, count(*) AS n_events,
      |  round(avg(user_total), 4) AS avg_user_total
      |FROM events e JOIN dim ON e.user_id = dim.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Forward as-of join (`ev_forward_asof`): for every purchase, the same
    * user's EARLIEST error at or after it — the mirror of [[asofJoin]]'s
    * backward carry, closing both directions of the as-of family. Same
    * composition, reversed frame: one user-partitioned sort, a running
    * FIRST over (current row → unbounded following), no inequality probe —
    * one shuffle at 100 TB where a range-condition join would degenerate
    * into a per-user nested loop. Purchases order before errors on a
    * same-second tie, so a same-second error counts as "after"; purchases
    * with no later error keep null (left semantics). */
  def forwardAsofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsec"), col("event_id"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("kind"))
    val ahead = Window.partitionBy(col("user_id"))
      .orderBy(col("tsec"), col("kind"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("e_id", first(when(col("kind") === 1, col("event_id")), ignoreNulls = true).over(ahead))
      .withColumn("e_tsec", first(when(col("kind") === 1, col("tsec")), ignoreNulls = true).over(ahead))
      .filter(col("kind") === 0)
      .select(col("event_id").as("p_id"), col("user_id"), col("tsec").as("p_tsec"),
        col("e_id"), col("e_tsec"), (col("e_tsec") - col("tsec")).as("gap_sec"))
      .orderBy(col("p_id"))
  }

  val forwardAsofJoinOracle: String =
    """WITH tagged AS (
      |  SELECT user_id, cast(floor(epoch(ts)) AS bigint) AS tsec, event_id,
      |    CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS kind
      |  FROM events WHERE event_type IN ('purchase','error')),
      |w AS (
      |  SELECT *,
      |    first_value(CASE WHEN kind=1 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tsec, kind, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS e_id,
      |    first_value(CASE WHEN kind=1 THEN tsec END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY tsec, kind, event_id
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS e_tsec
      |  FROM tagged)
      |SELECT event_id AS p_id, user_id, tsec AS p_tsec, e_id, e_tsec,
      |  e_tsec - tsec AS gap_sec
      |FROM w WHERE kind=0 ORDER BY p_id""".stripMargin

  /** Triangle census of the co-purchase graph (`q_triangle_count`) — the
    * standard distributed graph-analytics kernel (edge-join-edge wedge
    * enumeration, the shape GraphX/Pregel systems reduce to): vertices are
    * parts, an edge joins two parts co-purchased in ≥2 orders (the
    * support-2 cut drops the random co-occurrence noise that would make
    * wedge enumeration quadratic), and the census reports vertices, edges,
    * the TRUE open-wedge count Σᵥ C(deg v, 2), triangles, and the standard
    * global clustering coefficient 3·Δ/wedges in basis points (≤ 10000 by
    * construction) — the graph-health number a recommender pipeline
    * watches.
    *
    * Canonical-order trick: every edge is stored once as (lo, hi); the
    * triangle ENUMERATION joins edges on their LOW endpoint with b < c, so
    * each triangle is counted exactly once as its (min, mid, max)
    * orientation — no 3× or 6× overcount to divide away. The gcc
    * DENOMINATOR is computed separately as Σ C(deg, 2) over every center
    * vertex (a vertex-keyed degree agg, no join) — the min-anchored join's
    * pair count is NOT the wedge count (each triangle contributes exactly
    * one min-anchored pair but three wedges), so using it as the
    * denominator inflates the ratio past 1.
    *
    * Hub guard (`MaxTriangleDeg`): a power-law hub of degree h fans the
    * wedge join out h²/2-fold — vertices above the cap are dropped from
    * the census (edges incident to them removed) and ACCOUNTED in
    * `n_hub_vertices`/`n_dropped_edges`, the same honest-accounting
    * convention as the shingle df-cap. At the testdata's support-2 graph
    * the max degree is 13, so the cap of 64 drops nothing and the census
    * is exact; on a web-scale graph it bounds the join quadratically. */
  val MaxTriangleDeg = 64

  def triangleCount(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e0 = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2)
      .select(col("pa"), col("pb"))
    triangleCensus(e0, MaxTriangleDeg)
  }

  /** The census kernel over an edge list (cols `pa` < `pb`, one row per
    * undirected edge) — split out so the hub-guard spec can plant a
    * synthetic star. See [[triangleCount]] for the algorithm. */
  def triangleCensus(e0: DataFrame, maxDeg: Int): DataFrame = {
    // localCheckpoint pins ONE materialization of the support-cut edge
    // set: the degree agg plus five capped-graph consumers would otherwise
    // each re-run the fact-table self-join that builds it, and the
    // support-2 cut makes the pinned set dimension-sized. EAGER on purpose
    // (r16 finding): the census consumes eAll/e from several CONCURRENT
    // stages of one job — lazily pinned, the racing stages each recompute
    // the fact-table self-join before the cache lands (sf1 A/B: 7.7->10.8 s
    // lazy; eager restores it).
    val eAll = e0.localCheckpoint()
    val deg = eAll.select(explode(array(col("pa"), col("pb"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val hubs = deg.filter(col("deg") > maxDeg)
    // drop hub-incident edges: two vertex-keyed anti-joins (hub set is
    // tiny by construction on any graph the cap matters for — AQE
    // broadcasts it; on the capless path it is empty)
    val e = eAll
      .join(hubs.select(col("v").as("ha")), col("pa") === col("ha"), "left_anti")
      .join(hubs.select(col("v").as("hb")), col("pb") === col("hb"), "left_anti")
      .localCheckpoint()
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.pa") === col("e2.pa") &&
        col("e1.pb") < col("e2.pb"))
      .select(col("e1.pa").as("a"), col("e1.pb").as("b"), col("e2.pb").as("c"))
    val tri = wedges.join(e, col("b") === col("pa") && col("c") === col("pb"))
    // true wedge count: Σ C(deg, 2) over the CAPPED graph's degrees
    val degC = e.select(explode(array(col("pa"), col("pb"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val nVerts = degC.agg(count(lit(1)).as("n_vertices"),
      expr("sum(deg * (deg - 1) div 2)").as("n_wedges"))
    val nE = e.agg(count(lit(1)).as("n_edges"))
    val nHub = hubs.agg(count(lit(1)).as("n_hub_vertices"))
    val nDrop = eAll.agg(count(lit(1)).as("n_edges_all"))
    val nT = tri.agg(count(lit(1)).as("n_triangles"))
    nVerts.join(nE).join(nHub).join(nDrop).join(nT)
      .select(col("n_vertices"), col("n_edges"), col("n_hub_vertices"),
        (col("n_edges_all") - col("n_edges")).as("n_dropped_edges"),
        col("n_wedges"), col("n_triangles"),
        expr("n_triangles * 3 * 10000 div greatest(n_wedges, 1)").as("gcc_bp"))
  }

  val triangleCountOracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg0 AS (SELECT v, count(*) AS deg FROM
      |  (SELECT unnest([pa, pb]) AS v FROM e0) GROUP BY 1),
      |hubs AS (SELECT v FROM deg0 WHERE deg > 64),
      |e AS (SELECT pa, pb FROM e0
      |  WHERE pa NOT IN (SELECT v FROM hubs)
      |    AND pb NOT IN (SELECT v FROM hubs)),
      |degc AS (SELECT v, count(*) AS deg FROM
      |  (SELECT unnest([pa, pb]) AS v FROM e) GROUP BY 1),
      |w AS (
      |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      |  FROM e e1 JOIN e e2 ON e1.pa = e2.pa AND e1.pb < e2.pb),
      |t AS (SELECT count(*) AS n_triangles
      |      FROM w JOIN e ON w.b = e.pa AND w.c = e.pb)
      |SELECT
      |  (SELECT count(*) FROM degc) AS n_vertices,
      |  (SELECT count(*) FROM e) AS n_edges,
      |  (SELECT count(*) FROM hubs) AS n_hub_vertices,
      |  (SELECT count(*) FROM e0) - (SELECT count(*) FROM e)
      |    AS n_dropped_edges,
      |  (SELECT cast(sum(deg * (deg - 1) // 2) AS bigint) FROM degc)
      |    AS n_wedges,
      |  n_triangles,
      |  cast(n_triangles * 3 * 10000 //
      |    greatest((SELECT sum(deg * (deg - 1) // 2) FROM degc), 1)
      |    AS bigint) AS gcc_bp
      |FROM t""".stripMargin

  /** PageRank iterations for [[pagerank]] — fixed so both engines replay
    * the identical run. */
  val PagerankIters = 3

  /** Integer rank scale: ranks are parts-per-10¹² of the stationary mass. */
  val PagerankScale = 1000000000000L

  /** Integer-exact PageRank (`q_pagerank`) over the customer↔supplier
    * trade graph — the canonical ITERATIVE graph op at corpus scale,
    * complementing the one-shot census rows (`q_triangle_count`) and the
    * model-sized chain (`ev_markov_stationary`, whose matrix is
    * |event types|²; THIS node set grows with the data). Nodes are every
    * customer/supplier appearing in a distinct (o_custkey, l_suppkey)
    * trade pair (key-disambiguated as 2k / 2k+1); edges run both ways, so
    * the graph has no dangling nodes and degree = outdegree. Arithmetic
    * is EXACT int64 end to end — r₀ = S div N with S = [[PagerankScale]],
    * each step r'(v) = (15·r₀) div 100 + (85·Σ_{u→v} r(u) div deg(u))
    * div 100 — a deterministic integer estimand both engines replay
    * bit-identically (sums stay ≤ S, far from overflow).
    *
    * 100 TB shape: each of the [[PagerankIters]] steps is ONE shuffled
    * join (edge list ⋈ rank vector on src — both hash-partitioned on the
    * same key, so AQE reuses the edge side's exchange across iterations)
    * plus a dst-keyed partial agg; the edge list with degrees is
    * localCheckpoint-pinned once. Nothing is ever collected to the
    * driver; the final top-20 rides orderBy+limit (TakeOrdered, bounded
    * per-partition heaps). The Bianchini et al. (TOIT'05) convergence
    * bound makes a fixed small iteration count the standard large-graph
    * deployment mode. */
  def pagerank(spark: SparkSession, d: String, topN: Int = 20): DataFrame = {
    val e0 = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
    // pin the edge list FIRST: deg, base, r0 and the per-iteration joins
    // all branch off it, and unpinned each branch would re-run the
    // orders⋈lineitem trade-pair build (plan-audited ~10 parquet rescans)
    val edges = e0.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      .unionAll(e0.select((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
      .localCheckpoint()
    // deg is read three times (edgesDeg build, node count, r0) — pinned so
    // the degree aggregate over the edge list runs once
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val edgesDeg = edges.join(deg, "src").localCheckpoint()
    // every division is Spark SQL `div` (exact int64), never `/` (double):
    // a double quotient cast back to long can land one ULP across an
    // integer boundary and diverge from DuckDB's exact `//`
    val base = deg.agg(count(lit(1)).as("n"))
      .select(expr(s"${PagerankScale}L div n").as("b"))
    val r0 = deg.select(col("src").as("node")).crossJoin(broadcast(base))
      .select(col("node"), col("b").as("r"))
    val rFinal = (1 to PagerankIters).foldLeft(r0) { (ranks, _) =>
      edgesDeg.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
        .crossJoin(broadcast(base))
        .select(col("dst").as("node"),
          expr("(15L * b) div 100 + (85L * m) div 100").as("r"))
    }
    // rank the ≤topN surviving rows WITHOUT an unpartitioned Window (the
    // PlanSpec single-reducer guard): fold the limit-bounded set into one
    // array, sort by the row_number key (r desc via negation, node asc),
    // and posexplode — position+1 IS the rank, over topN rows of state
    rFinal.orderBy(col("r").desc, col("node")).limit(topN)
      .agg(collect_list(struct((-col("r")).as("nr"), col("node").as("n"))).as("xs"))
      .select(posexplode(array_sort(col("xs"))).as(Seq("p", "x")))
      .select(
        when(pmod(col("x.n"), lit(2)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("x.n div 2").as("entity_id"),
        (-col("x.nr")).as("rank_u"),
        (col("p") + 1).cast("int").as("rank"))
      .orderBy(col("rank"))
  }

  val pagerankOracle: String = {
    def step(k: Int): String =
      s"""r$k AS (
         |  SELECT e.dst AS node,
         |    cast((15 * b) // 100 + (85 * sum(r.r // e.deg)) // 100
         |      AS bigint) AS r
         |  FROM ed e JOIN r${k - 1} r ON r.node = e.src, base
         |  GROUP BY e.dst, b)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM e0
       |  UNION ALL SELECT s * 2 + 1, c * 2 FROM e0),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       |base AS (
       |  SELECT $PagerankScale // count(*) AS b FROM deg),
       |r0 AS (SELECT src AS node, b AS r FROM deg, base),
       |${(1 to PagerankIters).map(step).mkString(",\n")},
       |top AS (
       |  SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS rk
       |  FROM r$PagerankIters)
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS node_type,
       |  cast(node // 2 AS bigint) AS entity_id, r AS rank_u,
       |  cast(rk AS int) AS rank
       |FROM top WHERE rk <= 20 ORDER BY rank""".stripMargin
  }
}
