package graft

import graft.operators.{Events, Joins, Similarity}
import org.apache.spark.sql.functions._

/** Round-9 coverage: SQ8 integer search semantics, the forward as-of
  * mirror, OHLC argmin/argmax determinism, RFM partitioning, and the
  * windowed-HLL error bound.
  */
class Round9Spec extends SparkSpec {

  test("ann_sq_search: integer dot order matches exact dot order on coarse vectors") {
    // SQ8 codes against one global scale preserve the inner-product
    // ORDER up to quantization error; with recall measured by the eval,
    // here we pin the mechanical guarantees: codes in [-127,127] and the
    // idot column exactly equal to the code dot recomputed locally.
    val rows = Similarity.sqTopK(spark, Sf, nQueries = 3, k = 2).collect()
    assert(rows.length == 6, "3 queries × top-2")
    assert(rows.forall(_.getLong(2).abs <= 127L * 127L * 64L),
      "idot bounded by code range × dims")
    val ranks = rows.groupBy(_.getLong(0)).values
    assert(ranks.forall(rs =>
      rs.sortBy(_.getInt(3)).sliding(2).forall {
        case Array(a, b) => a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getLong(1) < b.getLong(1))
        case _ => true
      }), "rank order must follow (idot desc, neighbor_id)")
  }

  test("ann_sq_recall: full-corpus SQ8 recall is high and sampled mode stays close") {
    val full = Similarity.sqRecall(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full.values.sum / full.size >= 0.5,
      s"SQ8 loses too much: mean recall ${full.values.sum / full.size}")
    // sampled-ground-truth mode: same estimand, smaller candidate corpus
    val sampled = Similarity.sqRecall(spark, Sf, truthSample = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sampled.keySet == full.keySet, "every query keeps a recall row")
  }

  test("ev_forward_asof mirrors ev_asof_join: every pair is the tightest forward match") {
    val ev = Tables.events(spark, Sf)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsec"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val errsByUser = ev.filter(_._4 == "error").groupBy(_._1)
    val got = Joins.forwardAsofJoin(spark, Sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_ => (r.getLong(3), r.getLong(4))))
      .toMap
    val purchases = ev.filter(_._4 == "purchase")
    assert(got.size == purchases.length, "one row per purchase (left semantics)")
    purchases.foreach { case (u, ts, pid, _) =>
      val expected = errsByUser.getOrElse(u, Array.empty)
        .filter(e => e._2 >= ts) // same-second error counts as after
        .sortBy(e => (e._2, e._3)).headOption.map(e => (e._3, e._2))
      assert(got(pid) == expected, s"purchase $pid: got ${got(pid)}, want $expected")
    }
  }

  test("ev_ohlc_hourly: bars conserve volume and open/close bracket the hour") {
    val bars = Events.ohlcHourly(spark, Sf).collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      val (open, high, low, close) =
        (b.getLong(2), b.getLong(3), b.getLong(4), b.getLong(5))
      assert(low <= open && open <= high, "open within [low, high]")
      assert(low <= close && close <= high, "close within [low, high]")
      assert(b.getLong(6) >= high, "volume ≥ high (≥1 trade)")
    }
    val vol = bars.map(_.getLong(6)).sum
    val exact = Tables.events(spark, Sf).filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100 + lit(0.5)).cast("long"))).head().getLong(0)
    assert(vol == exact, "bars must conserve total cents exactly")
  }

  test("ev_rfm: segments partition purchasing users exactly") {
    val seg = Events.rfm(spark, Sf).collect()
    val users = seg.map(_.getLong(1)).sum
    val cents = seg.map(_.getLong(2)).sum
    val exact = Tables.events(spark, Sf).filter(col("event_type") === "purchase")
      .agg(countDistinct(col("user_id")),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))).head()
    assert(users == exact.getLong(0), "every purchasing user in exactly one segment")
    assert(cents == exact.getLong(1), "segment cents partition total monetary value")
    assert(seg.forall(_.getString(0).matches("[123]{3}")), "RFM codes are 3 digits of 1-3")
  }

  test("q_bloom_join: no false negatives, word tables broadcast") {
    val row = operators.Tpch.qBloomJoin(spark, Sf).head()
    val (nProbe, nPass, nMatch, nFp) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // Bloom guarantee: every true match survives the filter
    val trueMatches = Tables.lineitem(spark, Sf).select(col("l_orderkey"))
      .join(Tables.orders(spark, Sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .count()
    assert(nMatch == trueMatches, "bloom must never drop a true match")
    assert(nPass >= nMatch && nFp == nPass - nMatch && nPass <= nProbe)
    // the m-bit filter must reach the probe as broadcast word tables —
    // a sort-merge join here would shuffle the fact table before pruning
    val plan = operators.Tpch.qBloomJoin(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "bloom word tables must broadcast")
  }

  test("q_delta_join: frozen partial + delta batch reproduces the direct join view") {
    val got = operators.Tpch.qDeltaJoin(spark, Sf).collect()
      .map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Tables.orders(spark, Sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.lineitem(spark, Sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
        + lit(0.5)).cast("long")).as("rev"), count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == direct, "delta-rule maintenance must be lossless in exact cents")
  }

  test("docs_dsir_weights: target-language docs score higher under the importance model") {
    // independent local recompute of per-doc DSIR scores over the same md5
    // bucket kernel; assert the estimator's defining property — the target
    // stratum (en) outscores the raw remainder on average
    def hash31(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 2147483647L
    }
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val buckets = docs.flatMap { case (_, l, ts) =>
      ts.map(w => (hash31(w) % 128, l == "en"))
    }
    val rc = buckets.groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val tc = buckets.filter(_._2).groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val (rn, tn) = (buckets.length.toLong, buckets.count(_._2).toLong)
    def lw(b: Long): Double =
      math.log(((tc.getOrElse(b, 0L) + 1) * (rn + 128)).toDouble /
        ((rc(b) + 1) * (tn + 128)).toDouble)
    val scores = docs.map { case (_, l, ts) =>
      (l == "en", ts.groupBy(w => hash31(w) % 128)
        .map { case (b, ws) => ws.length * lw(b) }.sum)
    }
    val enMean = scores.filter(_._1).map(_._2).sum / scores.count(_._1)
    val otherMean = scores.filterNot(_._1).map(_._2).sum / scores.count(!_._1)
    assert(enMean > otherMean,
      s"DSIR must separate target from raw: en=$enMean other=$otherMean")
    // and the Spark output agrees on the corpus totals
    val out = operators.Pipeline.dsirWeights(spark, Sf).collect()
    assert(out.map(_.getLong(1)).sum == docs.length, "every doc scored once")
  }

  test("text_dup_ngram_frac: planted duplicate docs land in the top decile") {
    val out = operators.TextAnalysis.dupNgramFrac(spark, Sf).collect()
    val total = out.map(_.getLong(2)).sum
    val nDocs = Tables.documents(spark, Sf)
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(total == nDocs, "decile histogram partitions all shingled docs")
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 10), "decile range")
    assert(out.forall(r => r.getLong(3) <= r.getLong(4)), "dup grams ≤ total grams")
  }

  test("sse_schema_infer: the generic JSON path lands on the documented shape") {
    val rows = operators.Events.schemaInfer(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val want = Map("$schema" -> "string", "bot" -> "boolean", "id" -> "number",
      "length" -> "object", "meta" -> "object", "namespace" -> "number",
      "title" -> "string", "type" -> "string")
    assert(rows.map(_._1).toSet == want.keySet, "all top-level keys inventoried")
    rows.foreach { case (k, t, bp) =>
      assert(t == want(k), s"key $k inferred $t, want ${want(k)}")
      assert(bp == 10000L, s"key $k present in every event")
    }
  }

  test("text_top_phrases: ordered by duplication, doc spread bounded by occurrences") {
    val rows = operators.TextAnalysis.topPhrases(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "phrases ordered by occurrence count")
    rows.foreach { case (p, occ, docs) =>
      assert(p.split(" ").length == 3, s"'$p' is a word 3-gram")
      assert(docs <= occ && docs >= 1)
    }
  }

  test("q_integrity_audit: anti joins and the childless-orders plant behave") {
    val rows = operators.Tpch.qIntegrityAudit(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("lineitem_orphan_orderkey", "orders_childless",
      "orders_dangling_custkey"))
    assert(rows("lineitem_orphan_orderkey")._1 == 0, "every line has an order")
    assert(rows("orders_dangling_custkey")._1 == 0, "every order has a customer")
    assert(rows("orders_childless")._1 > 0, "the data genuinely has childless orders")
    rows.values.foreach { case (v, t, bp) => assert(bp == v * 10000 / t) }
  }

  test("q_data_profile + ev_dq_rules: one-scan profiles match direct recomputation") {
    val prof = operators.Tpch.qDataProfile(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nOrders = Tables.orders(spark, Sf).count()
    assert(prof.keySet.size == 4)
    prof.values.foreach { case (n, nNull, nd) =>
      assert(n == nOrders && nNull == 0 && nd > 0 && nd <= n)
    }
    assert(prof("o_orderkey")._3 == nOrders, "order keys unique")
    val dq = operators.Events.dqRules(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dq.keySet.size == 5)
    dq.foreach { case (rule, (v, bp)) =>
      assert(v == 0 && bp == 10000, s"rule $rule should pass on clean synthetic data")
    }
  }

  test("ev_error_burst: integer 3-sigma test agrees with the float computation") {
    val rows = operators.Events.errorBurst(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val xs = rows.map(_._2.toDouble)
    val (n, mean) = (xs.length, xs.sum / xs.length)
    val sigma = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / n)
    rows.foreach { case (h, cnt, burst) =>
      val floatBurst = cnt > mean + 3 * sigma
      assert(burst == floatBurst,
        s"hour $h: integer test $burst != float test $floatBurst (cnt=$cnt μ=$mean σ=$sigma)")
    }
  }

  test("vec_power_iter: one milli-quantized power step matches a local matvec") {
    val vecs = Tables.embeddings(spark, Sf).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x * 1000.0 + 0.5).toLong).toArray)
    val dims = vecs.head.length
    val dots = vecs.map(_.sum)
    val v1 = Array.tabulate(dims)(j => vecs.zip(dots).map { case (m, d) => d * m(j) }.sum)
    val rayleigh = dots.map(d => d * d).sum
    val out = operators.Similarity.powerIter(spark, Sf).collect()
    assert(out.length == dims)
    out.foreach { r =>
      assert(r.getLong(1) == v1(r.getLong(0).toInt), s"dim ${r.getLong(0)} matvec mismatch")
      assert(r.getLong(2) == rayleigh && r.getLong(3) == vecs.length)
    }
  }

  test("text_ngram_novelty: novelty is total at the frontier and decays with repetition") {
    val out = operators.TextAnalysis.ngramNovelty(spark, Sf).collect()
    // grams partition: every gram is novel exactly once corpus-wide
    val (novel, total) = (out.map(_.getLong(2)).sum, out.map(_.getLong(3)).sum)
    assert(novel <= total)
    val distinctGrams = Tables.documents(spark, Sf)
      .select(explode(graft.functions.Kernels.shingles3(split(col("text"), " "))).as("s"))
      .agg(countDistinct(col("s"))).head().getLong(0)
    assert(novel == distinctGrams,
      "summed novel grams must equal the corpus's distinct gram count")
  }

  test("docs_ccnet_buckets: tiers partition each language near-thirds in score order") {
    val out = operators.Pipeline.ccnetBuckets(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val langs = out.keys.map(_._1).toSet
    assert(langs.size == 5, "every language stratum bucketed")
    langs.foreach { l =>
      val tiers = Seq("head", "middle", "tail").flatMap(t => out.get((l, t)))
      assert(tiers.size == 3, s"$l: all three tiers present")
      val total = tiers.map(_._1).sum
      val nScored = Tables.documents(spark, Sf).filter(col("lang") === l)
        .filter(size(split(col("text"), " ")) >= 2).count()
      assert(total == nScored, s"$l: tiers partition the scored docs")
      // share near a third (score ties shift whole histogram buckets)
      tiers.foreach { case (_, bp, _, _) =>
        assert(bp >= 2000 && bp <= 4800, s"$l: tier share $bp bp not near a third")
      }
      // score order: head's worst ≥ middle's best boundary ≥ tail's best
      val (h, m, t) = (out((l, "head")), out((l, "middle")), out((l, "tail")))
      assert(h._4 >= m._3 && m._4 >= t._3,
        s"$l: tier score ranges must be ordered head ≥ middle ≥ tail")
    }
  }

  test("ev_hourly_hll: every window's estimate is a KAT vs an independent local HLL") {
    // the raw HLL estimator (no linear counting — documented on the batch
    // twin) floors near α·m ≈ 45 for near-empty windows, so an accuracy
    // band is meaningless at sf0.001; instead recompute each window's
    // sketch with an independent JVM-side HLL over the same md5 kernel and
    // require EXACT parity — estimator, register count, and exact count.
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val byHour = Tables.events(spark, Sf)
      .select(date_trunc("hour", col("ts")).as("hour"), col("user_id")).collect()
      .map(r => (r.get(0).toString, r.getLong(1))).groupBy(_._1)
    val rows = Events.hourlyHll(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.length == byHour.size, "one sketch row per observed hour")
    rows.foreach { r =>
      val users = byHour(r.get(0).toString).map(_._2)
      assert(r.getLong(1) == users.distinct.length, "exact_distinct parity")
      val regs = new Array[Int](64)
      users.foreach { u =>
        val h = hash60(u.toString)
        val (b, w) = ((h % 64).toInt, h / 64)
        val rho = if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        regs(b) = math.max(regs(b), rho)
      }
      val used = regs.count(_ > 0)
      val s = regs.filter(_ > 0).map(mm => 1L << (55 - mm)).sum +
        (64L - used) * (1L << 55)
      val est = BigDecimal(0.709 * 4096.0 * (1L << 55).toDouble / s)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(3) == used, s"hour ${r.get(0)}: register occupancy parity")
      assert(math.abs(r.getDouble(2) - est) < 1e-9,
        s"hour ${r.get(0)}: estimator parity, got ${r.getDouble(2)} want $est")
    }
  }
}
