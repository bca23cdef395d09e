package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The declarative formulation — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is correct but evaluates through interpreted higher-order lambdas (Spark
  * does not codegen HOFs), which measured ~10× slower on the pair-scoring hot
  * path. This expression generates a tight primitive loop inside whole-stage
  * codegen instead. Accumulation is a left-to-right double fold — bit-for-bit
  * the same result as the HOF form and the DuckDB oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket of an `array<double>` vector: bit p of the
  * result is the sign of the projection onto deterministic hyperplane p,
  * with weight(p, j) = ((p·1000003 + j·7919) mod 2001 − 1000)/1000 — pure
  * integer arithmetic shared bit-for-bit with the DuckDB oracle
  * (graft.functions.Kernels.lshWeight). Native + codegen'd so bucketing a
  * vector is one tight loop instead of nested interpreted lambdas.
  */
case class LshBucket(child: Expression, nPlanes: Int = 16)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshBucket.compute(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBucket.compute($c, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucket {
  /** Static entry point shared by interpreted eval and generated code.
    * Left-to-right fold per plane — same accumulation as the oracle SQL. */
  def compute(vec: ArrayData, nPlanes: Int): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var j = 0
      while (j < n) {
        val w = ((p * 1000003L + j * 7919L) % 2001L - 1000L) / 1000.0
        proj += vec.getDouble(j) * w
        j += 1
      }
      if (proj > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

/** Map-side IVF coarse-quantizer assignment: nearest centroid of an
  * `array<double>` vector against an `array<array<double>>` centroid matrix
  * (cell = outer index), by cosine similarity rounded to 6 digits with ties
  * broken toward the LOWER cell id — exactly the `ccos desc, cell asc`
  * row_number ordering the long-format formulation used, so the DuckDB
  * oracle (which still computes the assignment relationally) reproduces the
  * result bit-for-bit.
  *
  * Scale rationale: the relational form (posexplode → broadcast-join on dim
  * → groupBy(vec, cell) → rank) shuffles |vecs|×|cells| partial dot products
  * to compute what is a per-row argmin. This expression computes it inside
  * whole-stage codegen with ZERO exchange on the corpus side; the centroid
  * matrix arrives via a one-row broadcast join (nCells×dims doubles — KBs at
  * 16 cells, still MBs at the √n cells a 100 TB corpus would use).
  *
  * Numerics match the relational form: dot and norms are left-to-right
  * double folds; ccos = round6(dot / (vnorm · cnorm)) with HALF_UP rounding
  * (Spark's `round`); NaN compares greatest (Spark's double ordering), so a
  * zero-norm input degrades identically to the row_number formulation.
  *
  * `l2 = true` switches the metric to squared-Euclidean ARGMIN (rounded at
  * 6 digits, ties to the lower cell) — the product-quantization assignment,
  * where direction-insensitive distance is the standard codebook metric.
  */
case class NearestCell(left: Expression, right: Expression, l2: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    NearestCell.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NearestCell.compute($a, $b, $l2)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCell {
  /** round half-up at 6 digits — Spark's `round(x, 6)` semantics, including
    * its `BigDecimal.valueOf` (shortest-decimal) path: rounding the exact
    * binary expansion instead would disagree on values like 0.5000005. */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, cents: ArrayData, l2: Boolean): Long = {
    val dims = vec.numElements()
    var vn = 0.0
    var j = 0
    while (j < dims) { val x = vec.getDouble(j); vn += x * x; j += 1 }
    val vnorm = math.sqrt(vn)
    val nCells = cents.numElements()
    var bestCell = 0L
    var bestScore = java.lang.Double.NEGATIVE_INFINITY
    var cell = 0
    while (cell < nCells) {
      val c = cents.getArray(cell)
      val n = math.min(dims, c.numElements())
      var score = 0.0
      if (l2) {
        // negated squared-Euclidean so the same argMAX loop serves both
        var d2 = 0.0
        var k = 0
        while (k < n) {
          val diff = vec.getDouble(k) - c.getDouble(k)
          d2 += diff * diff
          k += 1
        }
        score = -round6(d2)
      } else {
        var dot = 0.0
        var cn = 0.0
        var k = 0
        while (k < n) {
          val cv = c.getDouble(k)
          dot += vec.getDouble(k) * cv
          cn += cv * cv
          k += 1
        }
        score = round6(dot / (vnorm * math.sqrt(cn)))
      }
      // strictly-greater keeps the earlier (lower) cell on ties — the
      // `score desc, cell asc` row_number order; Double.compare ranks NaN
      // above every value, matching Spark's descending double sort.
      if (java.lang.Double.compare(score, bestScore) > 0) {
        bestScore = score
        bestCell = cell.toLong
      }
      cell += 1
    }
    bestCell
  }
}

/** 31-bit polynomial rolling hash over a string's code points:
  * acc = (acc * 131 + codepoint) mod (2^31 - 1), seed 0.
  *
  * A document-fingerprint kernel the DuckDB oracle reproduces exactly with
  * list_reduce over ord(); native + codegen'd here so fingerprinting a
  * 100 TB corpus stays a single tight map pass.
  */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val P = 2147483647L
  final val B = 131L

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * B + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** 60/31-bit md5-prefix hash of a string (or binary) column — the native
  * twin of the `conv(substring(md5(s), 1, n), 16, 10)` column composition in
  * [[Kernels]].
  *
  * The declarative form is correct but pays, PER ROW: a 32-char hex
  * UTF8String allocation out of Spark's `Md5` (commons-codec `md5Hex`), a
  * substring copy, and `conv`'s base-16 string parse through
  * `NumberConverter`. On the stride-1 ExactSubstr family that composition
  * runs once per CHARACTER of the corpus and dominated the bench profile.
  * This expression digests the UTF-8 bytes once and assembles the prefix
  * value with two shifts — bit-for-bit the same longs (the first 15 / next
  * 15 / first 8 hex digits are exactly the top nibbles of the digest), so
  * every downstream equality class, winnow minimum, and band key is
  * unchanged and the DuckDB oracle still reproduces it from `md5()` hex.
  *
  * `mode` selects which prefix: 60 = hex digits 1-15 (hash60), 61 = digits
  * 16-30 (hash60b), 31 = digits 1-8 mod 2^31-1 (hash31).
  */
case class Md5Prefix(child: Expression, mode: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got ${t.simpleString}")
  }

  private def isBinary = child.dataType == org.apache.spark.sql.types.BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (isBinary) Md5Prefix.compute(input.asInstanceOf[Array[Byte]], mode)
    else Md5Prefix.computeUtf8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isBinary)
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix.compute($c, $mode)")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix.computeUtf8($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {
  final val P = 2147483647L // 2^31-1, the Kernels.hash31 modulus

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def computeUtf8(s: org.apache.spark.unsafe.types.UTF8String, mode: Int): Long =
    compute(s.getBytes, mode)

  /** Static entry point shared by interpreted eval and generated code.
    * hi = digest bytes 0-7 big-endian (hex digits 1-16), lo = bytes 8-15
    * (digits 17-32); the three prefixes are pure shifts off those. */
  def compute(bytes: Array[Byte], mode: Int): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(bytes)
    var hi = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xFFL); i += 1 }
    mode match {
      case 60 => hi >>> 4 // hex digits 1-15
      case 61 => // hex digits 16-30: low nibble of hi ++ top 56 bits of lo
        var lo = 0L
        i = 8
        while (i < 16) { lo = (lo << 8) | (d(i) & 0xFFL); i += 1 }
        ((hi & 0xFL) << 56) | (lo >>> 8)
      case 31 => (hi >>> 32) % P // hex digits 1-8, mod 2^31-1
      case m => throw new IllegalArgumentException(s"md5_prefix mode $m")
    }
  }
}

/** Registration of graft's native SQL functions.
  *
  * Deployments attach them via
  * `spark.sql.extensions=graft.plans.GraftExtensions`; library code calls
  * [[GraftFunctions.ensureRegistered]] so ad-hoc sessions work too
  * (idempotent).
  */
object GraftFunctions {
  val DotName = "graft_dot"
  val RollingHashName = "graft_rolling_hash"
  val LshBucketName = "graft_lsh_bucket"
  val NearestCellName = "graft_nearest_cell"
  val Md5PrefixName = "graft_md5_prefix"

  /** One builder per function, shared by BOTH registration paths
    * (GraftExtensions injection and ensureRegistered) — a divergent builder
    * in one path silently drops arguments for every caller of that session. */
  val dotBuilder: Seq[Expression] => Expression =
    exprs => DotProduct(exprs.head, exprs(1))
  val rollingHashBuilder: Seq[Expression] => Expression =
    exprs => RollingHash(exprs.head)
  /** A config argument that must be a foldable literal of the expected
    * type, checked BEFORE eval — a column reference or wrong-typed literal
    * raises a clean AnalysisException naming the function and its
    * signature, instead of a ClassCastException/NPE out of the resolver. */
  private def foldableArg[T](fn: String, signature: String,
      exprs: Seq[Expression], i: Int)(pf: PartialFunction[Any, T]): T = {
    val e = exprs(i)
    val v = if (e.foldable) e.eval() else null
    pf.applyOrElse(v, (_: Any) =>
      throw new org.apache.spark.sql.AnalysisException("_LEGACY_ERROR_TEMP_3100",
        Map("message" -> (s"$fn: argument ${i + 1} must be a foldable " +
          s"literal — expected signature $signature, got ${e.sql}")), None))
  }

  /** Optional 2nd arg: plane count (foldable int literal); bucket count
    * 2^planes is the blocking parameter tuned to corpus size. */
  val lshBucketBuilder: Seq[Expression] => Expression =
    exprs =>
      if (exprs.size >= 2)
        LshBucket(exprs.head,
          foldableArg[Int](LshBucketName, s"$LshBucketName(vec, nPlanes: int)",
            exprs, 1) { case n: Number => n.intValue() })
      else LshBucket(exprs.head)
  /** Optional 3rd arg: metric — boolean foldable, true = squared-L2 argmin
    * (product-quantization codebooks), default false = cosine argmax. */
  val nearestCellBuilder: Seq[Expression] => Expression =
    exprs =>
      if (exprs.size >= 3)
        NearestCell(exprs.head, exprs(1),
          foldableArg[Boolean](NearestCellName,
            s"$NearestCellName(vec, centroids, l2: boolean)", exprs, 2) {
            case b: Boolean => b
          })
      else NearestCell(exprs.head, exprs(1))
  /** 2nd arg: prefix mode (60 / 61 / 31) — foldable int literal. */
  val md5PrefixBuilder: Seq[Expression] => Expression =
    exprs => Md5Prefix(exprs.head,
      foldableArg[Int](Md5PrefixName, s"$Md5PrefixName(s, mode: int)",
        exprs, 1) { case n: Number => n.intValue() })

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(DotName))) {
      registry.registerFunction(FunctionIdentifier(DotName),
        new ExpressionInfo(classOf[DotProduct].getName, DotName), dotBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(RollingHashName))) {
      registry.registerFunction(FunctionIdentifier(RollingHashName),
        new ExpressionInfo(classOf[RollingHash].getName, RollingHashName),
        rollingHashBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(LshBucketName))) {
      registry.registerFunction(FunctionIdentifier(LshBucketName),
        new ExpressionInfo(classOf[LshBucket].getName, LshBucketName),
        lshBucketBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(NearestCellName))) {
      registry.registerFunction(FunctionIdentifier(NearestCellName),
        new ExpressionInfo(classOf[NearestCell].getName, NearestCellName),
        nearestCellBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(Md5PrefixName))) {
      registry.registerFunction(FunctionIdentifier(Md5PrefixName),
        new ExpressionInfo(classOf[Md5Prefix].getName, Md5PrefixName),
        md5PrefixBuilder)
    }
  }
}
