package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the NearestCell argmin/argmax kernel against an
  * independent sort-based reference (the `score desc, cell asc` row_number
  * ordering the expression replaced), across both metrics, including
  * duplicate-centroid ties and degenerate zero vectors. */
object NearestCellProps extends Properties("NearestCell") {

  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Reference: score every cell, then SORT by (score desc, cell asc) with
    * Spark's double ordering (NaN greatest) and take the head — a different
    * selection path than the expression's single-pass argmax. */
  private def ref(vec: Array[Double], cents: Array[Array[Double]], l2: Boolean): Long = {
    val vnorm = math.sqrt(vec.map(x => x * x).sum)
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val n = math.min(vec.length, c.length)
      val s =
        if (l2) -round6((0 until n).map(j => (vec(j) - c(j)) * (vec(j) - c(j))).sum)
        else round6((0 until n).map(j => vec(j) * c(j)).sum /
          (vnorm * math.sqrt(c.map(x => x * x).sum)))
      (s, i)
    }
    scored.sortWith { (a, b) =>
      val cmp = java.lang.Double.compare(a._1, b._1)
      if (cmp != 0) cmp > 0 else a._2 < b._2
    }.head._2.toLong
  }

  private def arr(v: Array[Double]) = new GenericArrayData(v)
  private def mat(m: Array[Array[Double]]) =
    new GenericArrayData(m.map(arr(_): AnyRef))

  private val value: Gen[Double] = Gen.chooseNum(-10.0, 10.0)
  private val caseGen: Gen[(Array[Double], Array[Array[Double]])] = for {
    dims <- Gen.choose(1, 8)
    cells <- Gen.choose(1, 6)
    vec <- Gen.listOfN(dims, value)
    cents <- Gen.listOfN(cells, Gen.listOfN(dims, value))
    // sometimes overwrite a row with a copy of another → exact ties
    dupFrom <- Gen.choose(0, cells - 1)
    dupTo <- Gen.choose(0, cells - 1)
    dup <- Gen.oneOf(true, false)
  } yield {
    val m = cents.map(_.toArray).toArray
    if (dup) m(dupTo) = m(dupFrom).clone()
    (vec.toArray, m)
  }

  property("cosine argmax matches the sort-based row_number reference") =
    forAll(caseGen) { case (v, m) =>
      NearestCell.compute(arr(v), mat(m), false) == ref(v, m, l2 = false)
    }

  property("l2 argmin matches the sort-based row_number reference") =
    forAll(caseGen) { case (v, m) =>
      NearestCell.compute(arr(v), mat(m), true) == ref(v, m, l2 = true)
    }

  property("appending a duplicate of the winning centroid never steals the win") =
    forAll(caseGen, Gen.oneOf(true, false)) { case ((v, m), l2) =>
      val win = NearestCell.compute(arr(v), mat(m), l2)
      val extended = m :+ m(win.toInt).clone()
      NearestCell.compute(arr(v), mat(extended), l2) == win
    }
}
