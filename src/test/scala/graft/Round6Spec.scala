package graft

import graft.operators.{Dedup, Events, TextAnalysis, Tpch}
import org.apache.spark.sql.functions._

/** Functional coverage for the round-6 operators (rollup, pivot, PMI
  * collocations, line-level dedup, semantic dedup) beyond the DuckDB
  * oracle: each test checks an internal-consistency or planted-ground-truth
  * property the row-hash compare can't express.
  */
class Round6Spec extends SparkSpec {

  test("rollup: details sum to nation subtotals and subtotals to the grand total, exactly") {
    val df = Tpch.qRollupRevenue(spark, Sf).cache()
    try {
      val grand = df.filter(col("lvl") === 3).collect()
      assert(grand.length == 1, "exactly one grand-total row")
      val gRev = grand(0).getAs[Long]("revenue_cents")
      val gN = grand(0).getAs[Long]("n_orders")
      for (lvl <- Seq(0, 1)) {
        val r = df.filter(col("lvl") === lvl)
          .agg(sum("revenue_cents"), sum("n_orders")).head()
        // integer-cents accounting: levels must reconcile to the cent
        assert(r.getLong(0) == gRev, s"lvl $lvl revenue must equal grand total")
        assert(r.getLong(1) == gN, s"lvl $lvl order count must equal grand total")
      }
      assert(df.filter(!col("lvl").isin(0, 1, 3)).isEmpty,
        "rollup(nation, year) can only produce grouping ids 0, 1, 3")
    } finally df.unpersist()
  }

  test("pivot: each hour's type columns sum to that hour's total event count") {
    val wide = Events.pivotHour(spark, Sf)
    val totals = Tables.events(spark, Sf)
      .groupBy(hour(col("ts")).as("hour_of_day")).agg(count(lit(1)).as("n"))
    val bad = wide.join(totals, "hour_of_day")
      .filter(Events.EventTypes.map(col).reduce(_ + _) =!= col("n"))
    assert(bad.isEmpty, "pivoted row sums must conserve the per-hour counts")
    assert(wide.columns.toSeq == "hour_of_day" +: Events.EventTypes,
      "pivot must emit the declared vocabulary in order")
  }

  test("pmi matches a direct recomputation from raw counts for the top bigram") {
    val row = TextAnalysis.pmiBigrams(spark, Sf)
      .orderBy(col("c_xy").desc, col("w1"), col("w2")).head()
    val (w1, w2, cxy, pmi) = (row.getString(0), row.getString(1),
      row.getLong(2), row.getDouble(3))
    val toks = Tables.documents(spark, Sf)
      .select(graft.functions.Kernels.tokens(col("text")).as("t"))
    val nu = toks.select(explode(col("t")).as("w")).count()
    val c1 = toks.select(explode(col("t")).as("w")).filter(col("w") === w1).count()
    val c2 = toks.select(explode(col("t")).as("w")).filter(col("w") === w2).count()
    val nb = toks.select((size(col("t")) - 1).as("m")).filter(col("m") >= 1)
      .agg(sum("m")).head().getLong(0)
    val expected = math.log((cxy.toDouble * nu * nu) / ((c1.toDouble * c2) * nb))
    assert(math.abs(pmi - expected) < 5e-5,
      s"pmi($w1,$w2)=$pmi but direct recomputation gives $expected")
  }

  test("line dedup: every planted boilerplate instance is flagged as a duplicated line") {
    val df = Dedup.lineDedup(spark, Sf)
    val nPlanted = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 3 === 0).count()
    val flagged = df.agg(sum("n_boiler_lines")).head().getLong(0)
    // the planted line occurs n/3 times corpus-wide (>= minOcc), so at
    // LEAST every planted instance must be counted; natural repeats from
    // the generator's duplicated docs may add more
    assert(flagged >= nPlanted,
      s"flagged $flagged boilerplate line instances < $nPlanted planted")
    val lines = df.agg(sum("n_lines")).head().getLong(0)
    assert(flagged < lines, "flagging everything would mean the threshold is broken")
  }

  test("bloom decontamination: planted re-entries fully flagged (no false negatives), fp below signal") {
    val df = Dedup.decontaminateBloom(spark, Sf).cache()
    try {
      val planted = df.filter(col("doc_id") >= 5000000L).collect()
      assert(planted.nonEmpty, "the planted eval re-entries must be reported")
      planted.foreach { r =>
        // Bloom filters have no false negatives: a doc whose shingles were
        // ALL inserted must have every shingle flagged
        assert(r.getAs[Long]("n_flagged") == r.getAs[Long]("n_shingles"),
          s"planted doc ${r.getAs[Long]("doc_id")} partially flagged")
      }
      // flagged shingles on organic docs mix genuine eval overlap with
      // Bloom false positives; the invariant that holds regardless is that
      // the filter stays SELECTIVE — most of the train corpus is untouched
      val flagged = df.agg(coalesce(sum("n_flagged"), lit(0L))).head().getLong(0)
      val totalShingles = df.agg(coalesce(sum("n_shingles"), lit(0L))).head().getLong(0)
      assert(flagged >= planted.map(_.getAs[Long]("n_flagged")).sum)
      assert(flagged.toDouble / math.max(totalShingles, 1L) < 0.9,
        "even among reported docs the filter must not blanket-flag everything")
    } finally df.unpersist()
  }

  test("semantic dedup: every planted scaled copy is pruned back to its original") {
    val df = Dedup.semantic(spark, Sf).cache()
    try {
      val planted = Tables.embeddings(spark, Sf)
        .filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id")).collect()
        .map(_.getLong(0)).toSet
      val rows = df.collect()
      val found = rows.map(_.getAs[Long]("vec_id")).toSet
      assert(planted.subsetOf(found),
        s"missing planted copies: ${(planted -- found).take(5)}")
      rows.filter(r => planted(r.getAs[Long]("vec_id"))).foreach { r =>
        assert(r.getAs[Long]("kept_by") == r.getAs[Long]("vec_id") - 1000000L,
          s"copy ${r.getAs[Long]("vec_id")} must be kept by its original")
        assert(r.getAs[Double]("max_cos") == 1.0,
          "a ×2-scaled copy has cosine exactly 1 against its original")
      }
    } finally df.unpersist()
  }
}
