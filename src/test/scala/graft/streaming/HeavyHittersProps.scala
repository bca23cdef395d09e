package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the Misra–Gries update kernel: the classical
  * guarantees must hold for ARBITRARY streams and budgets, not just the
  * events corpus the integration spec uses — including adversarial shapes
  * (skewed Zipf-ish draws, constant streams, all-distinct streams). */
object HeavyHittersProps extends Properties("MisraGries") {

  private val genK = Gen.choose(1, 12)

  /** Streams drawn from a small id universe so collisions (the interesting
    * case) are common; length up to a few hundred. */
  private val genStream: Gen[List[Long]] =
    Gen.sized { _ =>
      for {
        universe <- Gen.choose(1, 30)
        len <- Gen.choose(0, 300)
        xs <- Gen.listOfN(len, Gen.choose(0L, universe.toLong - 1))
      } yield xs
    }

  property("state never exceeds the k-counter budget") =
    forAll(genStream, genK) { (xs, k) =>
      val states = xs.scanLeft(Map.empty[Long, Long])(StreamOps.mgUpdate(_, k, _))
      states.forall(_.size <= k)
    }

  property("every item with true count > n/(k+1) is tracked") =
    forAll(genStream, genK) { (xs, k) =>
      val fin = xs.foldLeft(Map.empty[Long, Long])(StreamOps.mgUpdate(_, k, _))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val err = xs.size.toLong / (k + 1)
      truth.forall { case (u, c) => c <= err || fin.contains(u) }
    }

  property("every counter is a lower bound within n/(k+1) of the true count") =
    forAll(genStream, genK) { (xs, k) =>
      val fin = xs.foldLeft(Map.empty[Long, Long])(StreamOps.mgUpdate(_, k, _))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val err = xs.size.toLong / (k + 1)
      fin.forall { case (u, lb) =>
        val c = truth.getOrElse(u, 0L)
        lb <= c && c - lb <= err
      }
    }

  property("counters are positive and a constant stream is counted exactly") =
    forAll(genK, Gen.choose(1, 200)) { (k, n) =>
      val fin = List.fill(n)(7L).foldLeft(Map.empty[Long, Long])(StreamOps.mgUpdate(_, k, _))
      fin == Map(7L -> n.toLong)
    }
}
