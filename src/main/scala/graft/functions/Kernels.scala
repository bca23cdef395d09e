package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic kernels for the dedup / similarity operators.
  *
  * Every kernel is a pure `Column` composition over
  * `org.apache.spark.sql.functions._` (codegen'd, no UDFs), and every hash is
  * derived from md5 so the DuckDB oracle can reproduce it bit-for-bit with
  * `cast('0x'||substr(md5(x),1,n) as bigint)`. The same constants below are
  * injected into the generated oracle SQL — one source of truth.
  */
object Kernels {

  /** Mersenne prime 2^31-1: modulus for the MinHash permutation universe.
    * a*h+b stays < 2^62, so the arithmetic never overflows a signed long —
    * in Spark, in DuckDB, and on any executor at any scale. */
  val P = 2147483647L

  val NumPerms = 32
  val BandSize = 4
  val NumBands: Int = NumPerms / BandSize // 8

  /** LCG-derived permutation constants (deterministic, shared with oracle). */
  def permA(i: Int): Long = { val a = (1103515245L * (i + 1) + 12345L) % P; if (a == 0) 1L else a }
  def permB(i: Int): Long = (1103515245L * (i + 101) + 54321L) % P

  val SimhashBits = 60 // 15 hex digits of md5 → sign-safe in an int64
  val SimhashBands = 4
  val SimhashChunkBits: Int = SimhashBits / SimhashBands // 15

  /** Whitespace tokens. Single-space split, matching DuckDB string_split. */
  def tokens(text: Column): Column = split(text, " ")

  // The three md5-prefix hashes ride the native [[graft.functions.Md5Prefix]]
  // expression (r15): same longs bit-for-bit as the previous
  // `conv(substring(md5(s), 1, n), 16, 10)` composition (the first 15 / next
  // 15 / first 8 hex digits ARE the top nibbles of the digest bytes), but
  // without the per-row 32-char hex allocation, substring copy, and conv
  // base-16 reparse — on the stride-1 window families that composition ran
  // once per corpus CHARACTER. Oracle SQL fragments below are unchanged.
  //
  // REGISTRATION CONTRACT: these resolve by name, so the session must have
  // run [[GraftFunctions.ensureRegistered]] first. Every operator satisfies
  // it by loading tables through graft.Tables (which registers on first
  // touch), and spark.sql.extensions=graft.plans.GraftExtensions covers
  // sessions built by GraftSession; a vanilla SparkSession composing these
  // kernels over its own frames must call ensureRegistered itself.

  /** 31-bit shingle hash: first 8 hex digits of md5, mod P. */
  def hash31(s: Column): Column =
    call_function(GraftFunctions.Md5PrefixName, s, lit(31))

  /** 60-bit token hash: first 15 hex digits of md5. */
  def hash60(s: Column): Column =
    call_function(GraftFunctions.Md5PrefixName, s, lit(60))

  /** Second independent 60-bit hash: md5 hex digits 16-30 — the other half
    * of the same digest, so a k=2 Bloom filter costs ONE md5 per key. */
  def hash60b(s: Column): Column =
    call_function(GraftFunctions.Md5PrefixName, s, lit(61))

  /** Word n-gram shingles of a token array (n=3). Empty for short docs. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array())

  // NOTE: MinHash signatures are computed in graft.operators.Dedup as a
  // 32-way min-aggregate over exploded shingle hashes — higher-order array
  // lambdas evaluate interpreted (outside codegen) and measured ~100× slower.

  /** Float array → double array (exact element-wise widening cast). */
  def vecDouble(c: Column): Column = c.cast("array<double>")

  /** L2 norm of a double-array column (left-to-right fold). */
  def vecNorm(e: Column): Column = sqrt(dot(e, e))

  /** Dot product of two double-array columns — the native codegen'd
    * [[graft.functions.DotProduct]] expression (same left-to-right fold as
    * the HOF formulation and the oracle, ~10× faster). Requires
    * [[GraftFunctions.ensureRegistered]] (done by graft.Tables). */
  def dot(a: Column, b: Column): Column = call_function(GraftFunctions.DotName, a, b)

  /** Cosine similarity of two float-array columns, computed in double with a
    * left-to-right fold (same accumulation order as the oracle).
    *
    * For pair-wise workloads prefer projecting `vecDouble` + `vecNorm` once
    * per vector and computing `dot(a,b) / (norm_a * norm_b)` — identical
    * math, but the norms are O(n) instead of O(n²). */
  def cosine(a: Column, b: Column): Column = {
    val da = vecDouble(a); val db = vecDouble(b)
    dot(da, db) / (vecNorm(da) * vecNorm(db))
  }

  /** Deterministic random-hyperplane weight for (plane p, dim j) — pure
    * integer arithmetic so Spark and DuckDB agree exactly. */
  def lshWeight(p: Column, j: Column): Column =
    (pmod(p * lit(1000003L) + j * lit(7919L), lit(2001L)) - lit(1000L)).cast("double") / lit(1000.0)

  /** 16-bit random-hyperplane LSH bucket of a (float or double) array
    * column — the native codegen'd [[graft.functions.LshBucket]] expression
    * (same per-plane left-to-right fold as the oracle SQL). */
  def lshBucket(vec: Column): Column =
    call_function(GraftFunctions.LshBucketName, vecDouble(vec))

  /** LSH bucket with an explicit plane count: 2^nPlanes buckets. The plane
    * count is THE blocking knob — at 100 TB pick b so n/2^b vectors fit a
    * block; on the test corpus small b keeps blocks populated. */
  def lshBucketN(vec: Column, nPlanes: Int): Column =
    call_function(GraftFunctions.LshBucketName, vecDouble(vec), lit(nPlanes))

  /** Nearest-centroid cell of a double-array vector against an
    * `array<array<double>>` centroid matrix — the native codegen'd
    * [[graft.functions.NearestCell]] expression (rounded-cosine argmax,
    * ties to the lower cell). Map-side: zero shuffle per assignment. */
  def nearestCell(vec: Column, cents: Column): Column =
    call_function(GraftFunctions.NearestCellName, vec, cents)

  /** Squared-L2 argmin variant — the product-quantization codebook
    * assignment (direction-insensitive distance, rounded at 6, ties to the
    * lower cell). */
  def nearestCellL2(vec: Column, cents: Column): Column =
    call_function(GraftFunctions.NearestCellName, vec, cents, lit(true))

  // ---- Oracle SQL fragments (DuckDB), built from the same constants ----

  /** DuckDB: 31-bit shingle hash of column expr `e`. */
  def sqlHash31(e: String): String =
    s"(cast(concat('0x', substr(md5($e), 1, 8)) AS bigint) % $P)"

  /** DuckDB: 60-bit token hash of column expr `e`. */
  def sqlHash60(e: String): String =
    s"cast(concat('0x', substr(md5($e), 1, 15)) AS bigint)"

  /** DuckDB: the second 60-bit hash (md5 hex digits 16-30). */
  def sqlHash60b(e: String): String =
    s"cast(concat('0x', substr(md5($e), 16, 15)) AS bigint)"

  /** Membership test of string column `s` against a k=2 Bloom filter whose
    * bit words ride along as a LITERAL array (62 bits per word, dense by
    * word index — the layout graft.operators.Dedup builds). A pure column
    * expression: the filter is embedded in the plan, so probing needs no
    * join and no state — usable as-is in a streaming projection. */
  def bloomContains(s: Column, words: Seq[Long], mBits: Int): Column = {
    val w = typedLit(words)
    def bitSet(h: Column): Column = {
      val p = pmod(h, lit(mBits.toLong))
      // p < 2^17, so the double quotient truncates to the exact word index
      val word = element_at(w, (p / lit(62)).cast("int") + 1)
      word.bitwiseAND(shiftLeftVar(pmod(p, lit(62L)))) =!= 0L
    }
    bitSet(hash60(s)) && bitSet(hash60b(s))
  }

  /** shiftleft(1L, n) for a COLUMN bit count (the Scala-API shiftleft only
    * takes a literal): 2^n via double pow — exact for 0 ≤ n ≤ 62. */
  private def shiftLeftVar(n: Column): Column =
    pow(lit(2.0), n.cast("double")).cast("long")

  /** DuckDB VALUES list of the MinHash permutation constants. */
  def sqlPermValues: String =
    (0 until NumPerms).map(i => s"(${i}, ${permA(i)}, ${permB(i)})").mkString(", ")

  /** DuckDB: random-hyperplane LSH bucket of double-array expr `e` with
    * nPlanes planes — same integer weights + left-to-right folds as
    * [[lshBucketN]] / graft.functions.LshBucket.compute. */
  def sqlLshBucket(e: String, nPlanes: Int): String =
    sqlLshBucketExpr(e, nPlanes.toString)

  /** [[sqlLshBucket]] with the plane count as an arbitrary SQL scalar
    * expression (e.g. a subquery) — the adaptive form `knn_join` sizes
    * its blocking with. */
  def sqlLshBucketExpr(e: String, planesExpr: String): String =
    s"""list_sum(list_transform(range(0, $planesExpr), p ->
       |      CASE WHEN list_sum(list_transform(range(0, 64), j ->
       |        $e[j+1] * ((((p*1000003 + j*7919) % 2001) - 1000) / 1000.0))) > 0
       |      THEN cast(1 AS bigint) << p ELSE 0 END))""".stripMargin
}
