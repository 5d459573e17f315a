package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Golden-value tests for the driver-side contingency math (M20-M24, M17).
  * Goldens computed with an independent numpy implementation of the same
  * closed forms; p-value anchors use the textbook χ² 0.05 quantiles. */
class ContingencyMathSpec extends AnyFunSuite {

  private val obs = Array(Array(10.0, 20.0, 30.0), Array(6.0, 9.0, 17.0))

  test("expected frequencies = outer(rowTot, colTot)/n") {
    val e = ContingencyMath.expectedFreq(obs)
    assert(math.abs(e(0)(0) - 10.434782608695652) < 1e-12)
    assert(math.abs(e(1)(2) - 16.347826086956523) < 1e-12)
  }

  test("chi² without correction matches golden") {
    val r = ContingencyMath.chiSquare(obs, yates = false)
    assert(math.abs(r.stat - 0.27157465150403504) < 1e-12)
    assert(r.dof === 2)
    assert(r.p > 0.85 && r.p < 0.90) // stat tiny -> p large
  }

  test("chi² p-value anchors at the 0.05 quantiles") {
    // P(chi2_1 >= 3.8414588206941245) = 0.05, P(chi2_2 >= 5.991464547107981) = 0.05
    val r1 = ContingencyMath.chiSquare(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), yates = false) // just for struct
    assert(r1.dof === 1)
    val p1 = ContingencyMath.chiSquare(obs, yates = false)
    assert(p1.p >= 0 && p1.p <= 1)
    val dist = new org.apache.commons.math3.distribution.ChiSquaredDistribution(1)
    assert(math.abs((1 - dist.cumulativeProbability(3.8414588206941245)) - 0.05) < 1e-10)
  }

  test("Yates correction applied when any cell <= 5") {
    val obs2 = Array(Array(3.0, 12.0), Array(14.0, 7.0))
    assert(ContingencyMath.needsYates(obs2))
    assert(!ContingencyMath.needsYates(obs))
    val r = ContingencyMath.chiSquare(obs2, yates = true)
    assert(math.abs(r.stat - 5.8880141530296335) < 1e-12)
    assert(r.dof === 1)
  }

  test("Yates requested but dof > 1: statistic stays UNcorrected (scipy parity)") {
    // scipy.stats.chi2_contingency(correction=True) only corrects 2x2 tables;
    // for this 2x3 small-cell table it returns the plain Pearson statistic.
    val obs3 = Array(Array(3.0, 12.0, 5.0), Array(14.0, 7.0, 2.0))
    assert(ContingencyMath.needsYates(obs3))
    val r = ContingencyMath.chiSquare(obs3, yates = true)
    assert(r.dof === 2)
    assert(r.yatesApplied) // requested flag still reported as metadata
    assert(math.abs(r.stat - 9.556364055919852) < 1e-12) // uncorrected Pearson
    // and NOT the would-be corrected value
    assert(math.abs(r.stat - 6.981029700209604) > 1.0)
  }

  test("adjusted residuals match golden and are antisymmetric for 2 rows") {
    val z = ContingencyMath.adjustedResiduals(obs)
    assert(math.abs(z(0)(0) - (-0.2510940971310061)) < 1e-12)
    assert(math.abs(z(0)(1) - 0.5121226989905664) < 1e-12)
    assert(math.abs(z(1)(2) - 0.2855876112297991) < 1e-12)
  }

  test("posthoc directions: neu when residuals are small, pos/neg when planted") {
    assert(ContingencyMath.posthocDirections(obs).flatten.forall(_ == "neu"))
    val planted = Array(Array(100.0, 10.0), Array(10.0, 100.0))
    val dirs = ContingencyMath.posthocDirections(planted)
    assert(dirs(0)(0) == "pos" && dirs(0)(1) == "neg")
    assert(dirs(1)(0) == "neg" && dirs(1)(1) == "pos")
  }

  test("adjusted Rand index matches golden") {
    // labelings a=[0,0,1,1,2,2,0,1], b=[1,1,0,0,2,2,1,2] -> contingency:
    val cont = Array(
      Array(0L, 3L, 0L), // a=0: b=1 three times
      Array(2L, 0L, 1L), // a=1: b=0 twice, b=2 once
      Array(0L, 0L, 2L)) // a=2: b=2 twice
    assert(math.abs(ContingencyMath.adjustedRandIndex(cont) - 0.6190476190476191) < 1e-12)
    // identical labelings -> 1
    val ident = Array(Array(4L, 0L), Array(0L, 4L))
    assert(ContingencyMath.adjustedRandIndex(ident) === 1.0)
  }

  test("Cochran's Q matches golden") {
    // 8 subjects x 3 treatments; C=[6,5,3], sum R_i^2 = 32
    val (q, dof, i2) = ContingencyMath.cochransQ(Array(6.0, 5.0, 3.0), 32.0)
    assert(math.abs(q - 2.8) < 1e-12)
    assert(dof === 2)
    assert(math.abs(i2 - (2.8 - 2) / 2.8 * 100) < 1e-12)
  }

  test("bonferroni z critical value is sane (2x3 table)") {
    val z = ContingencyMath.bonferroniZCrit(2, 3)
    assert(z > 2.6 && z < 2.7) // alpha/6 two-sided ~ 2.6383
  }
}
