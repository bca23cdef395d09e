package graft.functions

import graft.SparkSpec
import graft.functions.Kernels._
import org.apache.spark.sql.functions._

class KernelsSpec extends SparkSpec {
  import spark.implicits._

  test("hash31 is md5-prefix mod P, in range, deterministic") {
    val rows = Seq("abc", "abc", "def").toDF("s")
      .select(hash31(col("s")).as("h")).collect().map(_.getLong(0))
    assert(rows(0) == rows(1) && rows(0) != rows(2))
    // md5("abc") = 900150983cd24fb0... → 0x90015098 % P
    assert(rows(0) == 0x90015098L % P)
    assert(rows.forall(h => h >= 0 && h < P))
  }

  test("hash60 uses 15 hex digits and stays positive") {
    val h = Seq("abc").toDF("s").select(hash60(col("s"))).head().getLong(0)
    assert(h == java.lang.Long.parseLong("900150983cd24fb", 16) && h > 0)
  }

  test("native md5-prefix hashes equal the conv(substring(md5)) composition bit-for-bit") {
    // the r15 hot-path rewrite: hash31/hash60/hash60b now ride the native
    // Md5Prefix expression; every equality class, winnow minimum and band
    // key downstream depends on these longs, so pin them to the original
    // declarative composition over adversarial inputs (empty, long,
    // multi-byte UTF-8, whitespace) and 500 pseudo-random strings
    val rng = new scala.util.Random(42)
    val strs = Seq("", "a", " ", "héllo wörld ✓ 漢字", "x" * 500) ++
      (1 to 500).map(_ => rng.alphanumeric.take(rng.nextInt(60) + 1).mkString)
    val df = strs.toDF("s")
    val rows = df.select(
      hash31(col("s")).as("n31"),
      hash60(col("s")).as("n60"),
      hash60b(col("s")).as("n60b"),
      pmod(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"), lit(P)).as("o31"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("o60"),
      conv(substring(md5(col("s")), 16, 15), 16, 10).cast("long").as("o60b")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(3), s"hash31 diverged: $r")
      assert(r.getLong(1) == r.getLong(4), s"hash60 diverged: $r")
      assert(r.getLong(2) == r.getLong(5), s"hash60b diverged: $r")
    }
  }

  test("shingles3 builds word 3-grams; short docs yield none") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(shingles3(tokens(col("t"))).as("sh")).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d") && out(1).isEmpty)
  }

  test("cosine: identical and scaled vectors → 1, orthogonal → 0") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(2.0f, 4.0f, 6.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))).toDF("a", "b")
    val cs = df.select(round(cosine(col("a"), col("b")), 9)).collect().map(_.getDouble(0))
    assert(cs(0) == 1.0 && cs(1) == 0.0)
  }

  test("dot/vecNorm factorization equals cosine") {
    val df = Seq((Array(0.5f, -1.5f, 2.5f), Array(1.0f, 1.0f, -1.0f))).toDF("a", "b")
    val both = df.select(
      cosine(col("a"), col("b")).as("c1"),
      (dot(vecDouble(col("a")), vecDouble(col("b"))) /
        (vecNorm(vecDouble(col("a"))) * vecNorm(vecDouble(col("b"))))).as("c2"))
      .head()
    assert(both.getDouble(0) == both.getDouble(1))
  }

  test("lshBucket is a 16-bit bucket, deterministic, scale-invariant") {
    val df = Seq(
      ("a", Array.tabulate(64)(i => (i % 7 - 3).toFloat)),
      ("b", Array.tabulate(64)(i => ((i % 7 - 3) * 2).toFloat)), // same direction
      ("c", Array.tabulate(64)(i => (3 - i % 7).toFloat))) // opposite
      .toDF("k", "v")
    val buckets = df.select(col("k"), lshBucket(col("v")).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets("a") == buckets("b")) // scaling preserves all sign bits
    assert(buckets("a") != buckets("c"))
    assert(buckets.values.forall(b => b >= 0 && b < (1 << 16)))
  }

  test("rolling hash: known answers, codegen path matches static compute") {
    assert(RollingHash.compute("") == 0L)
    assert(RollingHash.compute("ab") == 97L * 131 + 98) // 12805, matches oracle
    val viaSql = Seq("ab", "the quick brown fox", "")
      .toDF("s").select(call_function(GraftFunctions.RollingHashName, col("s")))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == Seq("ab", "the quick brown fox", "").map(RollingHash.compute))
  }

  test("native LshBucket matches the declarative lshWeight formulation") {
    val df = Seq(
      Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat),
      Array.tabulate(64)(i => (i % 11 - 5).toFloat)).toDF("v")
    // independent HOF reconstruction from the shared weight formula
    val dv = vecDouble(col("v"))
    val dims = sequence(lit(0), size(dv) - 1)
    val hof = aggregate(
      transform(sequence(lit(0), lit(15)), p => {
        val proj = aggregate(zip_with(dv, dims, (x, j) => x * lshWeight(p, j)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
      }),
      lit(0L), (acc, v) => acc + v)
    val rows = df.select(lshBucket(col("v")).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SQL surface: tables + native functions usable from spark.sql") {
    graft.GraftCatalog.registerViews(spark, Sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    val cos = spark.sql(
      """SELECT graft_dot(cast(a.embedding AS array<double>),
        |                 cast(b.embedding AS array<double>)) AS d
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 0
        |""".stripMargin).head().getDouble(0)
    assert(cos > 0.0) // self dot product is positive
    assert(spark.sql("SELECT graft_rolling_hash('ab')").head().getLong(0) == 12805L)
  }

  test("SQL surface: every operator reachable as a graft_<name> view") {
    graft.GraftCatalog.registerOperatorViews(spark, Sf)
    // a spot check across operator families, driven purely through SQL
    assert(spark.sql("SELECT count(*) FROM graft_q1_pricing").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM graft_dedup_minhash_lsh WHERE jaccard >= 0.5")
      .head().getLong(0) > 0)
    assert(spark.sql("SELECT max(rank) FROM graft_ann_lsh").head().getInt(0) <= 3)
    // views stay logical: Catalyst pushes SQL-level filters into the plan
    val plan = spark.sql(
      "SELECT * FROM graft_text_quality WHERE doc_id = 1").queryExecution
      .executedPlan.toString
    assert(plan.contains("doc_id"), plan)
  }

  test("nearestCell picks the max-cosine cell; ties (after round-6) go to the lower cell") {
    // matrix rows are cells; cosine is scale-invariant so [2,0] ≡ [1,0]
    val m = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (Array(1.0, 0.1), m),
      (Array(0.1, 1.0), m),
      // duplicate centroids: identical cosines → cell 0 wins the tie
      (Array(3.0, 4.0), Array(Array(3.0, 4.0), Array(3.0, 4.0))),
      // cosines that differ only past the 6th digit round equal → lower cell
      // wins even though cell 1 is exactly colinear
      (Array(1.0, 0.0), Array(Array(1.0, 1e-9), Array(1.0, 0.0))))
      .toDF("v", "m")
    val cells = df.select(nearestCell(col("v"), col("m"))).collect().map(_.getLong(0))
    assert(cells.toSeq == Seq(0L, 1L, 0L, 0L))
  }

  test("nearestCell matches the relational round(cos,6) argmax formulation") {
    // the long-format ground truth the expression replaced: per (vec, cell)
    // rounded cosine, argmax by (ccos desc, cell asc) — hand-computed here
    val vecs = Seq(
      Array(0.5, -1.5, 2.5), Array(1.0, 1.0, 1.0), Array(-2.0, 0.25, 0.75))
    val m = Array(Array(0.1, -0.9, 1.1), Array(0.8, 0.7, 0.6), Array(-1.0, 0.0, 0.5))
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.lazyZip(b).map(_ * _).sum
      round6(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val expected = vecs.map(v =>
      m.zipWithIndex.map { case (c, i) => (-cos(v, c), i) }.min._2.toLong)
    val got = vecs.map(v => Seq((v, m)).toDF("v", "m")
      .select(nearestCell(col("v"), col("m"))).head().getLong(0))
    assert(got == expected)
    // and via the SQL registration path
    val sql = Seq((vecs.head, m)).toDF("v", "m")
      .selectExpr("graft_nearest_cell(v, m)").head().getLong(0)
    assert(sql == expected.head)
  }

  test("nearestCellL2 picks the min-distance cell; ties go to the lower cell; metric differs from cosine") {
    val df = Seq(
      // closest by L2 is [1,1] (cell 1); by cosine, [10,0] (cell 0) is
      // colinear with the vector — the two metrics MUST disagree here
      (Array(1.0, 0.0), Array(Array(10.0, 0.0), Array(1.0, 1.0))),
      // exact duplicate centroids → tie → lower cell
      (Array(2.0, 3.0), Array(Array(2.0, 3.0), Array(2.0, 3.0))),
      // distances differing only past round-6 tie to the lower cell even
      // though cell 1 is exactly on the vector
      (Array(1.0, 0.0), Array(Array(1.0, 1e-4), Array(1.0, 0.0))))
      .toDF("v", "m")
    val l2 = df.select(nearestCellL2(col("v"), col("m"))).collect().map(_.getLong(0))
    assert(l2.toSeq == Seq(1L, 0L, 0L))
    val cos = df.limit(1).select(nearestCell(col("v"), col("m"))).head().getLong(0)
    assert(cos == 0L) // same inputs, cosine metric → the colinear cell
    // SQL path with the metric argument
    val sql = Seq((Array(1.0, 0.0), Array(Array(10.0, 0.0), Array(1.0, 1.0))))
      .toDF("v", "m").selectExpr("graft_nearest_cell(v, m, true)").head().getLong(0)
    assert(sql == 1L)
  }

  test("config args that are not foldable literals of the right type raise a clean AnalysisException") {
    // a wrong-typed or column-valued tuning argument must fail analysis
    // with the function's signature, not leak a ClassCastException/NPE out
    // of the resolver
    val df = Seq((Array(1.0, 0.0), Array(Array(1.0, 0.0)), true)).toDF("v", "m", "b")
    val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("graft_nearest_cell(v, m, 5)").head()
    }
    assert(wrongType.getMessage.contains("graft_nearest_cell(vec, centroids, l2: boolean)"))
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("graft_nearest_cell(v, m, b)").head()
    }
    assert(nonFoldable.getMessage.contains("graft_nearest_cell"))
    val lshBad = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("graft_lsh_bucket(v, 'eight')").head()
    }
    assert(lshBad.getMessage.contains("graft_lsh_bucket(vec, nPlanes: int)"))
    // the valid literal forms still resolve
    assert(df.selectExpr("graft_nearest_cell(v, m, true)").head().getLong(0) == 0L)
    assert(df.selectExpr("graft_lsh_bucket(v, 4)").head().getLong(0) >= 0L)
  }

  test("minhash permutation constants are in range and distinct") {
    val as = (0 until NumPerms).map(permA)
    val bs = (0 until NumPerms).map(permB)
    assert(as.forall(a => a > 0 && a < P) && bs.forall(b => b >= 0 && b < P))
    assert(as.distinct.size == NumPerms && bs.distinct.size == NumPerms)
  }
}
