package graft

import graft.operators.{Bucketing, Events, Similarity}
import org.apache.spark.sql.functions._

/** Round-8 coverage: the Z-order layout audit's clustering guarantee, the
  * two-stage refine search's recall dominance over its own shortlist
  * stage, and the SCD-2 history's interval algebra.
  */
class Round8Spec extends SparkSpec {

  test("r8 plan shapes: extent rides a 1-row broadcast, sketches avoid sort-merge") {
    // z-order/file-skipping: the key-extent aggregate must join back as a
    // BroadcastNestedLoopJoin (one row), never a shuffled join; the chunk
    // agg must keep partial aggregation (no plan-wide SortMergeJoin)
    // (q_cdc_merge is exempt: its FULL OUTER merge of the two compacted
    // per-user states cannot broadcast and correctly sort-merges AFTER
    // both sides shrank to |users| rows)
    Seq(Bucketing.zorderLayout(spark, Sf), Bucketing.fileSkipping(spark, Sf),
      Events.countMin(spark, Sf)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("SortMergeJoin"),
        s"tiny-side joins must broadcast, got:\n${p.linesIterator.take(25).mkString("\n")}")
    }
    val z = Bucketing.zorderLayout(spark, Sf).queryExecution.executedPlan.toString
    assert(z.contains("BroadcastNestedLoopJoin") || z.contains("BroadcastExchange"),
      "extent row must broadcast")
  }

  test("q_zorder_layout: chunks partition the table and cluster both keys") {
    val df = Bucketing.zorderLayout(spark, Sf).cache()
    val total = Tables.lineitem(spark, Sf).count()
    val agg = df.agg(sum(col("n_rows")), count(lit(1)),
      avg(col("span_part_bp") * col("span_supp_bp"))).head()
    assert(agg.getLong(0) == total, "chunks must partition the table exactly")
    val nChunks = agg.getLong(1)
    assert(nChunks >= 16 && nChunks <= 32, s"expected ~32 z-range chunks, got $nChunks")
    // clustering: a chunk's average (part × supp) rectangle must cover a
    // small fraction of the full key area — naive single-key sort leaves
    // one span at 10000 bp, i.e. product ≥ ~10000 × (10000/32) ≈ 3.1e6
    // only when the OTHER key clusters perfectly; z-order bounds both.
    val avgAreaBp2 = agg.getDouble(2)
    assert(avgAreaBp2 <= 0.15 * 10000.0 * 10000.0,
      s"z-chunks must cover ≤15% of the key area on average, got ${avgAreaBp2 / 1e8}")
    df.unpersist()
  }

  test("ann_refine: exact re-rank recalls at least as well as raw ADC order") {
    // truth = exact squared-L2 top-5 (the shortlist's own metric),
    // computed independently of any Spark path; refine (exact re-rank of
    // the 25-candidate shortlist) must dominate the ADC-ranked top-5
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val truth = (0L until 10L).flatMap { q =>
      val qe = vecs(q)
      vecs.iterator.filter(_._1 != q)
        .map { case (id, e) =>
          var d = 0.0; var i = 0
          while (i < qe.length) { val t = qe(i) - e(i); d += t * t; i += 1 }
          (id, d)
        }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(5)
        .map { case (id, _) => (q, id) }
    }.toSet
    val refined = Similarity.refineTopK(spark, Sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.pqSearchTopK(spark, Sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refineHits = (refined & truth).size
    val adcHits = (adc & truth).size
    assert(refineHits >= adcHits,
      s"refine must not lose recall vs its ADC stage: refine=$refineHits adc=$adcHits")
    // exactness of the re-rank stage: with the shortlist widened to the
    // whole corpus the two-stage search must reproduce exact-L2 truth
    // (round-4 distance ties allow a tiny slip)
    val full = Similarity.refineTopK(spark, Sf, shortlist = 1000)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullHits = (full & truth).size
    assert(fullHits >= truth.size - 2,
      s"full-shortlist refine must equal exact truth, got $fullHits/${truth.size}")
  }

  test("q_file_skipping: z-order never reads more chunks and wins in aggregate") {
    val df = Bucketing.fileSkipping(spark, Sf).cache()
    val worse = df.filter(col("chunks_zorder") > col("chunks_linear")).count()
    assert(worse == 0L,
      "on a two-sided predicate workload z-order must never read more chunks than a linear sort")
    val agg = df.agg(sum(col("chunks_zorder")), sum(col("chunks_linear"))).head()
    assert(agg.getLong(0) < agg.getLong(1),
      s"z-order must strictly win in aggregate: z=${agg.getLong(0)} linear=${agg.getLong(1)}")
    df.unpersist()
  }

  test("ann_mrl_recall: recall is monotone in prefix dims and 1.0 at full dims") {
    val rows = Similarity.mrlRecall(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val byDims = rows.groupBy(_._1).view.mapValues(v => v.map(_._3).sum / v.size).toMap
    assert(byDims(64L) == 1.0, "full-prefix tier must reproduce truth exactly")
    assert(byDims(16L) <= byDims(32L) + 0.1 && byDims(32L) <= byDims(64L) + 1e-9,
      s"recall should not degrade as the prefix widens: $byDims")
  }

  test("text_winnowing: shared substrings of length >= k+w-1 share a fingerprint") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // two docs with disjoint text except one planted 16-char common run:
    // winnowing (k=8, w=4) guarantees a shared fingerprint for any common
    // substring of length >= k+w-1 = 11
    val common = "zqxjvkwpyzqxjvkw"
    val toy = Seq((1L, s"alpha beta gamma $common delta epsilon zeta"),
      (2L, s"one two three four $common five six seven")).toDF("id", "t")
    val fps = toy
      .select(col("id"), TextAnalysis.winnowFps(TextAnalysis.kgramHashes(col("t"), 8), 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "planted 16-char common substring must produce a shared winnow fingerprint")
    // and two fully-disjoint docs share nothing
    val disj = Seq((1L, "aaaa bbbb cccc dddd eeee"), (2L, "ffff gggg hhhh iiii jjjj"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.winnowFps(TextAnalysis.kgramHashes(col("t"), 8), 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((disj(1L) & disj(2L)).isEmpty)
  }

  test("ev_count_min: the sketch never underestimates (one-sided error)") {
    val df = Events.countMin(spark, Sf)
    val rows = df.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CM must overestimate-or-equal: user ${r.getLong(0)} est=${r.getLong(2)} exact=${r.getLong(1)}")
    }
  }

  test("docs_split: deterministic assignment with ~80/10/10 global shares") {
    val a = graft.operators.Pipeline.splitAudit(spark, Sf).collect().toSeq
    val b = graft.operators.Pipeline.splitAudit(spark, Sf).collect().toSeq
    assert(a == b, "hash-bucket split must be run-deterministic")
    val bySplit = a.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") / total > 0.6 && bySplit("train") / total < 0.95)
    assert(bySplit("val") / total < 0.25 && bySplit("test") / total < 0.25)
  }

  test("q_cdc_merge: every user classified, actions consistent with the halves") {
    val df = Events.cdcMerge(spark, Sf).cache()
    val nUsers = Tables.events(spark, Sf).select(countDistinct(col("user_id"))).head().getLong(0)
    assert(df.count() == nUsers, "merge output must cover every user exactly once")
    val bad = df.filter(
      // merged state must always exist, and carries keep their old status
      col("status").isNull ||
        (col("action") === "carry" && col("changed_at").isNotNull) ||
        (col("action") =!= "carry" && col("changed_at").isNull) ||
        (col("action") === "insert" && col("old_status").isNotNull)).count()
    assert(bad == 0L, s"$bad inconsistent merge rows")
    df.unpersist()
  }

  test("ev_scd2: intervals are contiguous, versions dense, statuses alternate") {
    val df = Events.scd2(spark, Sf).cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val checked = df
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_version", lead(col("version"), 1).over(w))
      .withColumn("next_status", lead(col("status"), 1).over(w))
    val bad = checked.filter(
      // a closed interval must end exactly where the next begins
      (col("valid_to").isNotNull && (col("next_from").isNull ||
        col("valid_to") =!= col("next_from"))) ||
        // only the last (open) interval may have null valid_to
        (col("valid_to").isNull && col("next_version").isNotNull) ||
        // versions are 1,2,3,... with no gaps
        (col("next_version").isNotNull && col("next_version") =!= col("version") + 1) ||
        // a run boundary means the status actually changed
        (col("next_status").isNotNull && col("next_status") === col("status")))
      .count()
    assert(bad == 0L, s"$bad SCD-2 interval-algebra violations")
    // n_events re-aggregates to the cohort's event count
    val total = df.agg(sum(col("n_events"))).head().getLong(0)
    val expected = Tables.events(spark, Sf).filter(expr("user_id % 10 = 0")).count()
    assert(total == expected)
    df.unpersist()
  }
}
