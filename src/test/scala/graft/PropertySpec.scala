package graft

import graft.stats.ContingencyMath
import graft.cluster.KMeansSearch
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.3): pure-math properties run
  * under ScalaCheck; DataFrame-level invariants are covered by the
  * deterministic specs (one Spark job per generated case would dominate
  * test time for no extra coverage).
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property and fail the suite if it does not pass. */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit = {
    val prop = Prop.forAll(gen) { a => body(a); true }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(for { a <- g1; b <- g2 } yield (a, b)) { case (a, b) => body(a, b) }


  private val tableGen: Gen[Array[Array[Double]]] = for {
    r <- Gen.choose(2, 6)
    c <- Gen.choose(2, 6)
    cells <- Gen.listOfN(r * c, Gen.choose(1, 500))
  } yield cells.map(_.toDouble).toArray.grouped(c).toArray

  test("chi2: p in [0,1], stat >= 0, expected preserves margins") {
    forAll(tableGen) { obs =>
      val res = ContingencyMath.chiSquare(obs, yates = false)
      assert(res.p >= 0.0 && res.p <= 1.0)
      assert(res.stat >= 0.0)
      val exp = res.expected
      // expected row/col sums equal observed margins (within fp tolerance)
      obs.indices.foreach { i =>
        assert(math.abs(exp(i).sum - obs(i).sum) < 1e-6 * obs(i).sum + 1e-9)
      }
      obs.head.indices.foreach { j =>
        val eo = obs.map(_(j)).sum
        assert(math.abs(exp.map(_(j)).sum - eo) < 1e-6 * eo + 1e-9)
      }
    }
  }

  test("yates correction never increases the statistic") {
    forAll(tableGen) { obs =>
      val plain = ContingencyMath.chiSquare(obs, yates = false)
      val yates = ContingencyMath.chiSquare(obs, yates = true)
      assert(yates.stat <= plain.stat + 1e-9)
    }
  }

  test("adjusted residuals of a 2-row table are antisymmetric across rows") {
    forAll(for {
      c <- Gen.choose(2, 6)
      cells <- Gen.listOfN(2 * c, Gen.choose(1, 500))
    } yield cells.map(_.toDouble).toArray.grouped(c).toArray) { obs =>
      val z = ContingencyMath.adjustedResiduals(obs)
      z.head.indices.foreach { j =>
        assert(math.abs(z(0)(j) + z(1)(j)) < 1e-6)
      }
    }
  }

  private val labelingGen: Gen[(Array[Int], Array[Int])] = for {
    n <- Gen.choose(4, 60)
    ka <- Gen.choose(1, 4)
    kb <- Gen.choose(1, 4)
    a <- Gen.listOfN(n, Gen.choose(0, ka))
    b <- Gen.listOfN(n, Gen.choose(0, kb))
  } yield (a.toArray, b.toArray)

  private def contingency(a: Array[Int], b: Array[Int]): Array[Array[Long]] = {
    val ka = a.max + 1; val kb = b.max + 1
    val m = Array.ofDim[Long](ka, kb)
    a.indices.foreach(i => m(a(i))(b(i)) += 1)
    m
  }

  test("ARI: identical labelings score 1; ARI is symmetric; ARI <= 1") {
    forAll(labelingGen) { case (a, b) =>
      assert(ContingencyMath.adjustedRandIndex(contingency(a, a)) === 1.0)
      val ab = ContingencyMath.adjustedRandIndex(contingency(a, b))
      val ba = ContingencyMath.adjustedRandIndex(contingency(b, a))
      assert(math.abs(ab - ba) < 1e-9)
      assert(ab <= 1.0 + 1e-9)
    }
  }

  test("average rank: ranks sum to n(n+1)/2 and are permutation-equivariant") {
    forAll(Gen.nonEmptyListOf(Gen.choose(-100, 100).map(_.toDouble))) { vs =>
      val ranks = KMeansSearch.averageRank(vs, ascending = true)
      val n = vs.length
      assert(math.abs(ranks.sum - n * (n + 1) / 2.0) < 1e-6)
      // equal values share equal rank
      vs.zip(ranks).groupBy(_._1).values.foreach { grp =>
        assert(grp.map(_._2).distinct.size === 1)
      }
    }
  }

  test("cochran's Q: zero when all column sums equal and rows uniform") {
    // k treatments all with identical per-subject outcomes -> Q = 0
    forAll(Gen.choose(2, 5), Gen.choose(3, 40)) { (k, n) =>
      // every subject answered 1 on every treatment: C_j = n, R_i = k
      val (q, _, _) = ContingencyMath.cochransQ(
        Array.fill(k)(n.toDouble), rowSumSquares = n.toDouble * k * k)
      assert(math.abs(q) < 1e-9)
    }
  }

  test("elbow always returns a k from the input") {
    forAll(for {
      n <- Gen.choose(2, 7)
      costs <- Gen.listOfN(n, Gen.choose(1.0, 1000.0))
    } yield (2 to (1 + n)).zip(costs)) { curve =>
      assert(curve.map(_._1).contains(KMeansSearch.elbowK(curve)))
    }
  }
}
