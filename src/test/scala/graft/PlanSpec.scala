package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-shape assertions: the properties that matter at 100 TB — pushdown,
  * broadcasting, codegen, and shuffle counts — must hold in the optimized
  * physical plans, not just in intent. */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def fmt(df: DataFrame): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

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
    walk(physical(df))
    n
  }

  test("q6: filters push into the parquet scan; projection prunes columns") {
    val s = fmt(Tpch.q6Forecast(spark, Sf))
    assert(s.contains("PushedFilters: ["), s)
    assert(s.contains("l_shipdate"), "shipdate filter should reach the scan")
    assert(!s.contains("l_orderkey"), "unused columns must be pruned from ReadSchema")
  }

  test("q1: single shuffle (partial agg before exchange)") {
    val df = Tpch.q1Pricing(spark, Sf)
    assert(fmt(df).contains("HashAggregate"), "agg should be hash-based")
    // one shuffle for the groupBy + one for the final orderBy
    assert(countShuffles(df) <= 2, s"q1 should not shuffle more than twice")
  }

  test("q5: dimension joins broadcast; no cartesian products") {
    val s = fmt(Tpch.q5LocalSupplier(spark, Sf))
    assert(s.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!s.contains("CartesianProduct"), "no cartesian join allowed")
  }

  test("whole-stage codegen covers the q1 pipeline") {
    val df = Tpch.q1Pricing(spark, Sf)
    df.collect() // materialize so AQE finalizes the physical plan
    assert(physical(df).toString.contains("*("),
      "executed plan should contain WholeStageCodegen stages")
  }

  test("dedup_exact shuffles digests, not documents") {
    val s = fmt(Dedup.exact(spark, Sf))
    assert(s.contains("md5"), "grouping key must be the digest")
    assert(s.contains("HashAggregate"))
  }

  test("ann_bruteforce broadcasts the query side") {
    val s = fmt(Similarity.bruteforceTopK(spark, Sf))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "query vectors must broadcast — the scan side must not shuffle")
  }

  test("vec_rp pushes the vec_id bound into the parquet scan (projection is O(nVecs))") {
    val s = fmt(Similarity.vecRp(spark, Sf))
    assert(s.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,50)]"),
      s"vec_id < 50 must reach the scan, not filter after projecting:\n$s")
  }

  test("rp top-k broadcasts the projected query side like every ANN scan") {
    val s = fmt(Similarity.rpTopK(spark, Sf))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "projected query vectors must broadcast — the corpus side must not shuffle")
  }

  test("no SparkEntry query plans a cartesian product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val s = physical(fn(spark, Sf)).toString
      // BroadcastNestedLoopJoin against a tiny broadcast side is fine
      // (ann_bruteforce uses it deliberately); an unbroadcast cartesian is not
      assert(!s.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("no SparkEntry query plans an unpartitioned window (single-reducer killer)") {
    import org.apache.spark.sql.execution.window.WindowExecBase
    SparkEntry.queries.foreach { case (name, fn) =>
      var bad = List.empty[String]
      def walk(p: SparkPlan): Unit = {
        p match {
          case w: WindowExecBase if w.partitionSpec.isEmpty =>
            bad ::= s"$name: ${w.nodeName} with empty partitionSpec"
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(physical(fn(spark, Sf)))
      assert(bad.isEmpty, bad.mkString("; "))
    }
  }

  test("substr family: no broadcast join — every build side derives from the corpus") {
    // r13's sf1 failure mode: AQE saw small COMPRESSED shuffle stats for
    // the digest-keyed anchors/sharedH sides (narrow long rows compress
    // hard), converted the SMJ to BroadcastHashJoin, and OOM'd the heap
    // deserializing the LongToUnsafeRowMap. Every join in this family has
    // a corpus-growing build side (shared digests, anchors, doc metadata,
    // winnow candidates), so the EXECUTED plan — post-AQE, where the
    // conversion happens — must contain no broadcast join at all. At
    // sf0.001 every side is tiny enough that AQE WOULD broadcast absent
    // the shuffle_hash hints, so this test fails the moment a hint is lost.
    // r15: the dup report variants replaced their distinct→df→join chain
    // with a count window over the digest (no join remains to convert), so
    // the ShuffledHashJoin pin applies to the apply/keep variants whose
    // anchor/metadata joins still exist; the no-broadcast rule covers all six
    val docs = graft.Tables.documents(spark, Sf)
    for ((name, df, needsShj) <- Seq(
      ("text_substr_dup", TextAnalysis.substrDupOn(docs), false),
      ("text_substr_apply", TextAnalysis.substrApplyOn(docs), true),
      ("text_substr_keep", TextAnalysis.substrKeepOn(docs), true),
      ("text_substr_dup_winnow", TextAnalysis.substrDupWinnowOn(docs), false),
      ("text_substr_apply_winnow", TextAnalysis.substrApplyWinnowOn(docs), true),
      ("text_substr_keep_winnow", TextAnalysis.substrKeepWinnowOn(docs), true))) {
      df.collect() // finalize AQE — the broadcast conversion is a runtime re-plan
      val s = physical(df).toString
      assert(!s.contains("BroadcastHashJoin") && !s.contains("BroadcastNestedLoopJoin"),
        s"$name executed plan broadcasts a corpus-derived build side:\n$s")
      if (needsShj)
        assert(s.contains("ShuffledHashJoin"),
          s"$name should join digest tables via ShuffledHashJoin:\n$s")
      else
        assert(!s.contains("Join"),
          s"$name should carry no join at all (df rides a count window):\n$s")
    }
  }

  test("dedup/ngram family: no broadcast join — every build side derives from the corpus") {
    // The r14 extension of the substr-family guard (verdict-r13 task 6):
    // the sf1 audit showed AQE converting the candidate/size/df joins of
    // the whole near-dup family to BroadcastHashJoin off small compressed
    // stats — the same class that OOM'd text_substr_keep, and measurably
    // SLOWER at sf1 even where it survives (minhash_lsh 17.6→9.5 s with
    // broadcasts off). Every join side in these rows grows with the
    // corpus (shingle postings, candidate pairs, per-doc sizes, digest
    // dfs, component labels), so the EXECUTED plans must carry only
    // shuffled joins. At sf0.001 AQE WOULD broadcast absent the
    // shuffle_hash hints, so this fails the moment a hint is lost.
    for ((name, df) <- Seq(
      "dedup_ngram_jaccard" -> Dedup.ngramJaccard(spark, Sf),
      "dedup_minhash_lsh" -> Dedup.minhashLsh(spark, Sf),
      "dedup_containment" -> Dedup.containment(spark, Sf),
      "dedup_winnow_pairs" -> Dedup.winnowPairs(spark, Sf),
      "dedup_minhash_recall" -> Dedup.minhashRecall(spark, Sf),
      "docs_decontaminate" -> Dedup.decontaminate(spark, Sf),
      "text_winnowing" -> TextAnalysis.winnowing(spark, Sf),
      "text_dup_ngram_frac" -> TextAnalysis.dupNgramFrac(spark, Sf),
      "text_ngram_novelty" -> TextAnalysis.ngramNovelty(spark, Sf))) {
      df.collect() // finalize AQE — the broadcast conversion is a runtime re-plan
      val s = physical(df).toString
      assert(!s.contains("BroadcastHashJoin") && !s.contains("BroadcastNestedLoopJoin"),
        s"$name executed plan broadcasts a corpus-derived build side:\n$s")
      assert(s.contains("ShuffledHashJoin"),
        s"$name should join corpus-derived tables via ShuffledHashJoin:\n$s")
    }
    // docs_pipeline_full: the ONLY legitimate broadcasts are the two Bloom
    // filter-word probes (bounded m/62 longs regardless of corpus size)
    val full = Pipeline.pipelineFullStages(spark, Sf)
    full.collect()
    // count on the executed TREE (the AQE toString prints the final AND
    // initial plans, double-counting string matches)
    var bhj = 0
    // identity-visited set: a ReusedExchangeExec points back at a subtree
    // that is ALSO reachable through its original exchange, so an unguarded
    // recursion would count any join under it twice
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan); return
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child); return
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => bhj += 1
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          fail(s"docs_pipeline_full plans a BroadcastNestedLoopJoin:\n${physical(full)}")
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(physical(full))
    assert(bhj == 2,
      s"docs_pipeline_full must broadcast exactly the two Bloom probes, found $bhj:\n${physical(full)}")
  }

  test("shingle self-joins run on the df-capped inverted index, not raw shingles") {
    // The scale guard for the corpus-wide near-dup joins: both sides of the
    // shingle self-join must be the cappedShingles output, i.e. the plan
    // carries the df <= MaxShingleDf ceiling filter. Without it, one hot
    // boilerplate shingle (df = corpus) makes the self-join df² ≈ n² pairs.
    val cap = Dedup.MaxShingleDf
    for ((name, df) <- Seq(
      "dedup_ngram_jaccard" -> Dedup.ngramJaccard(spark, Sf),
      "dedup_containment" -> Dedup.containment(spark, Sf),
      "docs_decontaminate" -> Dedup.decontaminate(spark, Sf))) {
      val s = fmt(df)
      assert(s"""df#\\d+L? <= $cap""".r.findFirstIn(s).isDefined,
        s"$name plan lacks the shingle-df ceiling filter (df <= $cap)")
    }
  }

  test("the basket pair self-join runs on the item-count-capped order set") {
    // Same guard at basket granularity: the pair explosion is Σ C(items,2)
    // per order — bounded on TPC-H but a latent |basket|² on arbitrary
    // data, so the plan must carry the per-order ceiling filter.
    val cap = Tpch.MaxBasketItems
    val s = fmt(Tpch.marketBasket(spark, Sf))
    assert(s"""c#\\d+L? <= $cap""".r.findFirstIn(s).isDefined,
      s"q_market_basket plan lacks the basket-size ceiling filter (c <= $cap)")
  }

  test("banded Hamming self-joins run on the occupancy-capped bucket set") {
    // The same guard at band granularity: an exact-dup family lands whole
    // in one (band, value) bucket, so without the ceiling the candidate
    // join is quadratic in family size on real media/text.
    val cap = Dedup.MaxBandDf
    for ((name, df) <- Seq(
      "dedup_simhash" -> Dedup.simhash(spark, Sf),
      "dedup_minhash_lsh" -> Dedup.minhashLsh(spark, Sf),
      "mm_phash_dedup" -> Multimodal.phashDedup(spark, Sf))) {
      val s = fmt(df)
      assert(s"""df#\\d+L? <= $cap""".r.findFirstIn(s).isDefined,
        s"$name plan lacks the band-occupancy ceiling filter (df <= $cap)")
    }
  }

  test("vector-bucket self-joins run on the occupancy-capped bucket/cell set") {
    // r10's third cap family: LSH-bucket / k-means-cell self-joins over
    // embeddings. Tight direction-clusters co-bucket at ANY plane count
    // (origin hyperplanes split a cluster only in proportion to its
    // angular radius), so each of these plans must carry its occupancy
    // ceiling filter — the probe measured 41× (knn_join) and 14.5×
    // (dedup_embedding) at 10× vectors before the caps landed.
    for ((name, df, cap) <- Seq(
      ("knn_join", Similarity.knnJoin(spark, Sf), Similarity.MaxKnnBucket),
      ("dedup_embedding", Dedup.embeddingCosine(spark, Sf), Dedup.MaxEmbedBucket),
      ("dedup_semantic", Dedup.semantic(spark, Sf), Dedup.MaxSemanticCell))) {
      val s = fmt(df)
      assert(s"""c#\\d+L? <= $cap""".r.findFirstIn(s).isDefined,
        s"$name plan lacks the bucket-occupancy ceiling filter (c <= $cap)")
    }
  }

  test("ivf/pq assignments are map-side: no exchange on the streamed side of the codebook broadcast") {
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    for ((name, df) <- Seq(
      "ivf_assignments" -> Similarity.ivfAssignments(spark, Sf),
      "vec_pq" -> Similarity.vecPq(spark, Sf))) {
      var joins = 0
      def walk(p: SparkPlan): Unit = {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case j: BroadcastNestedLoopJoinExec =>
            joins += 1
            val streamed = if (j.buildSide == BuildRight) j.left else j.right
            def noShuffle(q: SparkPlan): Unit = {
              assert(!q.isInstanceOf[ShuffleExchangeExec],
                s"$name: the corpus side of the assignment must not shuffle")
              q.children.foreach(noShuffle)
            }
            noShuffle(streamed)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(physical(df))
      assert(joins == 1, s"$name: expected exactly the one-row codebook broadcast join")
      assert(physical(df).toString.toLowerCase.contains("nearestcell"),
        s"$name: assignment must be the native NearestCell expression")
    }
  }

  test("residual PQ: residual subtraction and code assignment stay map-side off chained broadcasts") {
    // the residual layout chains TWO one-row broadcasts (centroid matrix
    // for the subtraction, codebook for the codes) — the CORPUS side must
    // never exchange before the per-query top-k; shuffles under a
    // BroadcastExchange are the model builds (|cells|·dims-sized), allowed
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    var joins = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case j: BroadcastNestedLoopJoinExec =>
          joins += 1
          val streamed = if (j.buildSide == BuildRight) j.left else j.right
          def noShuffle(q: SparkPlan): Unit = q match {
            case _: BroadcastExchangeExec => () // model build — don't descend
            case s: ShuffleExchangeExec =>
              fail(s"the corpus side of the residual coding must not shuffle: $s")
            case other => other.children.foreach(noShuffle)
          }
          noShuffle(streamed)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(physical(Similarity.vecPqResidual(spark, Sf)))
    assert(joins >= 2, "expected the chained centroid-matrix + codebook broadcasts")
    val s = physical(Similarity.vecPqResidual(spark, Sf)).toString.toLowerCase
    assert(s.contains("nearestcell"), "codes must be native NearestCell argmins")
  }

  test("pq ADC search: corpus-side shuffles only at the per-query top-k; tables ride broadcasts") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val df = Similarity.pqSearchTopK(spark, Sf)
    // the codebook and the per-query distance tables are built with
    // query-sized shuffles INSIDE broadcast build sides; on the corpus
    // side the only permitted shuffle is the final rank partitioning —
    // count shuffles outside any broadcast subtree
    var corpusShuffles = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: BroadcastExchangeExec => // build side: its shuffles are query-sized
      case s: ShuffleExchangeExec => corpusShuffles += 1; s.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(physical(df))
    assert(corpusShuffles <= 2,
      s"ADC scoring must be map-side: only the top-k rank shuffle and the " +
        s"(output-sized) final ordering may move corpus-derived rows, got $corpusShuffles")
    val s = physical(df).toString
    assert(s.toLowerCase.contains("nearestcell"),
      "codes must come from the native NearestCell argmin")
    // the Partial WindowGroupLimit must run BEFORE the rank exchange so each
    // scan partition forwards at most k rows per query into the shuffle
    val lines = s.split("\n")
    val partialIdx = lines.indexWhere(l => l.contains("WindowGroupLimit") && l.contains("Partial"))
    val rankShuffleIdx = lines.indexWhere(l => l.contains("Exchange hashpartitioning(query_id"))
    assert(partialIdx > rankShuffleIdx && rankShuffleIdx >= 0,
      "rank <= k must prune per-partition (Partial WindowGroupLimit) before the rank shuffle")
  }

  test("global top-k queries plan as TakeOrderedAndProject (distributed partial top-k)") {
    for ((name, df) <- Seq(
      "ev_anomalies" -> Events.anomalies(spark, Sf),
      "text_bm25" -> TextAnalysis.bm25(spark, Sf))) {
      val s = physical(df).toString
      assert(s.contains("TakeOrderedAndProject"), s"$name: $s")
    }
  }

  test("per-group top-k queries plan map-side WindowGroupLimit (bounded heaps, not full sorts)") {
    // Spark's InferWindowGroupLimit rewrites rank<=k filters into a partial
    // WindowGroupLimit: each map task keeps at most k rows per group before
    // the shuffle. Guard that our rank-filter shape keeps qualifying.
    for ((name, df) <- Seq(
      "ann_lsh" -> Similarity.lshTopK(spark, Sf),
      "ann_multiprobe" -> Similarity.multiprobeTopK(spark, Sf),
      "knn_join" -> Similarity.knnJoin(spark, Sf),
      "text_tfidf" -> TextAnalysis.tfidf(spark, Sf),
      "q2_first_supplier" -> Tpch.q2FirstSupplier(spark, Sf),
      "ann_ivf_probe2" -> Similarity.ivfProbeTopK(spark, Sf))) {
      assert(physical(df).toString.contains("WindowGroupLimit"),
        s"$name should plan a map-side WindowGroupLimit")
    }
  }

  test("every SparkEntry query produces a non-empty result at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("rollup compiles to one Expand + one aggregate pass — no per-level rescan") {
    // grouping sets must not multiply fact scans: one Expand node replays
    // each row per grouping set into a single partial-agg pipeline, so the
    // shuffle carries Σ|grouping-set groups|, and the scan count stays 1
    val df = Tpch.qRollupRevenue(spark, Sf)
    val s = physical(df).toString
    assert(s.contains("Expand"), "rollup must plan an Expand, not a union of scans")
    assert("Scan parquet ".r.findAllIn(s).count(_ => true) == 3,
      "exactly one scan per table (orders + the two broadcast dims)")
    assert(countShuffles(df) <= 2, "one aggregate exchange + the final sort only")
  }

  test("pivot with an explicit vocabulary is a single conditional aggregate") {
    // the explicit value list keeps pivot from running a distinct-values
    // job; the plan is one groupBy(hour) with per-type conditional counts
    val df = Events.pivotHour(spark, Sf)
    assert(countShuffles(df) <= 2, "pivot must add no shuffle beyond agg + sort")
    assert("Scan parquet ".r.findAllIn(physical(df).toString).count(_ => true) == 1,
      "pivot reads the fact table exactly once")
  }

  test("line dedup shuffles digests, not document text; hot lines ride a broadcast") {
    val df = Dedup.lineDedup(spark, Sf)
    assert(physical(df).toString.contains("BroadcastHashJoin"),
      "the hot-line semi-join must broadcast the (small) boilerplate set")
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case e: ShuffleExchangeExec =>
          assert(!e.child.output.exists(_.name == "text"),
            "no exchange may carry the raw document text")
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(physical(df))
  }

  test("ivf-pq: cell + codes come from chained broadcasts, corpus shuffles only at the top-k") {
    // the composed index must keep both assignment passes map-side: the
    // only corpus-sized exchange allowed is the final per-query rank
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val df = Similarity.ivfPqSearchTopK(spark, Sf)
    val s = physical(df).toString
    assert(s.toLowerCase.contains("nearestcell"),
      "both quantizers must be native NearestCell expressions")
    assert(s.contains("WindowGroupLimit"),
      "the per-query top-k must prune map-side before the rank shuffle")
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    var bnlj = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case j: BroadcastNestedLoopJoinExec =>
          bnlj += 1
          val streamed = if (j.buildSide == BuildRight) j.left else j.right
          // the streamed side may itself contain the INNER broadcast join;
          // its build (small) side shuffles legitimately while building the
          // codebook — only the streamed spine must stay exchange-free
          def noShuffle(q: SparkPlan): Unit = q match {
            case _: BroadcastExchangeExec => // small-side build: don't descend
            case s: ShuffleExchangeExec =>
              fail(s"corpus-side exchange before the assignment broadcasts: $s")
            case other => other.children.foreach(noShuffle)
          }
          noShuffle(streamed)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(physical(df))
    assert(bnlj >= 2, "expected the chained centroid-matrix and PQ-codebook broadcasts")
  }

  test("bloom decontamination probes ride broadcasts — the train corpus never sort-merge-joins") {
    val df = Dedup.decontaminateBloom(spark, Sf)
    val s = physical(df).toString
    assert(!s.contains("SortMergeJoin"),
      "the Bloom probe must be a broadcast join, not a corpus-side shuffle join")
    assert("BroadcastHashJoin".r.findAllIn(s).count(_ => true) >= 2,
      "both hash probes must join the broadcast filter words")
  }

  test("semantic dedup assigns cells map-side: one codebook broadcast over an unshuffled corpus") {
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    // r10: semantic() materializes the assigned members ONCE
    // (localCheckpoint) so the ceiling filter and both self-join sides
    // share a single assignment pass — the plan property to pin lives on
    // the member pipeline itself
    val df = Dedup.semanticMembers(spark, Sf)
    var joins = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case j: BroadcastNestedLoopJoinExec =>
          joins += 1
          val streamed = if (j.buildSide == BuildRight) j.left else j.right
          def noShuffle(q: SparkPlan): Unit = {
            assert(!q.isInstanceOf[ShuffleExchangeExec],
              "the corpus side of the cell assignment must not shuffle")
            q.children.foreach(noShuffle)
          }
          noShuffle(streamed)
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(physical(df))
    assert(joins == 1, "exactly one codebook broadcast in the member pipeline")
    assert(physical(df).toString.toLowerCase.contains("nearestcell"),
      "assignment must be the native NearestCell expression")
  }
}
