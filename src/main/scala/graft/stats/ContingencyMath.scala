package graft.stats

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, NormalDistribution}

/** Driver-side contingency-table statistics (SURVEY.md §2.8 M20-M23, M17, M24).
  *
  * Design note (scale): these operate on already-aggregated crosstab
  * matrices — at most (categories × clusters) ≈ 50×9 cells regardless of
  * input row count. The distributed part is the single tall-aggregate
  * crosstab job in [[graft.inference.CrosstabJob]]; shipping these few
  * hundred doubles through Spark would be pure overhead, so the matrix
  * math runs on the driver (reference semantics:
  * src/kraken/app/inference/chisquared_tester.py:295-564).
  */
object ContingencyMath {

  /** χ² test result. */
  final case class ChiSqResult(stat: Double, p: Double, dof: Int,
      expected: Array[Array[Double]], yatesApplied: Boolean)

  private def chiSqP(stat: Double, dof: Int): Double =
    if (dof <= 0) 1.0
    else 1.0 - new ChiSquaredDistribution(dof.toDouble).cumulativeProbability(stat)

  /** Expected frequencies under independence: e_ij = rowTot_i · colTot_j / n
    * (reference: scipy expected_freq, chisquared_tester.py:295-329). */
  def expectedFreq(obs: Array[Array[Double]]): Array[Array[Double]] = {
    val rowTot = obs.map(_.sum)
    val colTot = obs.transpose.map(_.sum)
    val n = rowTot.sum
    rowTot.map(r => colTot.map(c => r * c / n))
  }

  /** Pearson χ² on an r×c observed-counts matrix. `yates` requests the
    * continuity correction (reference requests it when any observed cell ≤ 5 —
    * chisquared_tester.py:251-256, 331-379), but the correction is only
    * APPLIED when dof == 1, matching scipy.stats.chi2_contingency
    * (correction=True corrects solely 2×2 tables); the flag is still
    * reported as metadata. Errors/degenerate tables return (stat=0, p=1)
    * like the reference's error fallback. */
  def chiSquare(obs: Array[Array[Double]], yates: Boolean): ChiSqResult = {
    val exp = expectedFreq(obs)
    val dof = (obs.length - 1) * (obs.head.length - 1)
    if (dof <= 0 || exp.exists(_.exists(_ == 0.0)))
      return ChiSqResult(0.0, 1.0, math.max(dof, 0), exp, yates)
    val applyYates = yates && dof == 1
    var stat = 0.0
    var i = 0
    while (i < obs.length) {
      var j = 0
      while (j < obs(i).length) {
        val d0 = math.abs(obs(i)(j) - exp(i)(j))
        val d = if (applyYates) math.max(0.0, d0 - 0.5) else d0
        stat += d * d / exp(i)(j)
        j += 1
      }
      i += 1
    }
    ChiSqResult(stat, chiSqP(stat, dof), dof, exp, yates)
  }

  /** Whether the reference would apply Yates: any observed cell ≤ 5. */
  def needsYates(obs: Array[Array[Double]]): Boolean =
    obs.exists(_.exists(_ <= 5.0))

  /** Adjusted (standardized) residuals:
    * z_ij = (o−e) / sqrt(e·(1−rowTot_i/n)·(1−colTot_j/n))
    * (reference: chisquared_tester.py:419-473). */
  def adjustedResiduals(obs: Array[Array[Double]]): Array[Array[Double]] = {
    val exp = expectedFreq(obs)
    val rowTot = obs.map(_.sum)
    val colTot = obs.transpose.map(_.sum)
    val n = rowTot.sum
    Array.tabulate(obs.length, obs.head.length) { (i, j) =>
      val denom = math.sqrt(exp(i)(j) * (1 - rowTot(i) / n) * (1 - colTot(j) / n))
      if (denom == 0.0) 0.0 else (obs(i)(j) - exp(i)(j)) / denom
    }
  }

  /** Post-hoc per-cell test with Bonferroni correction
    * (chisquared_tester.py:475-564): per-cell p from z² ~ χ²₁, significant
    * iff |z| ≥ 1.96 AND p ≤ α/(r·c); direction 'pos'/'neg'/'neu'.
    * The residual is rounded to 3 decimals BEFORE squaring and comparing,
    * as the reference does (adjusted_residual returns round(z, 3); Python's
    * round is half-even on the binary value → BigDecimal HALF_EVEN here). */
  def posthocDirections(obs: Array[Array[Double]], alpha: Double = 0.05)
      : Array[Array[String]] = {
    val z = adjustedResiduals(obs)
    val cells = obs.length * obs.head.length
    val alphaAdj = alpha / cells
    z.map(_.map { zij0 =>
      // exact-binary constructor (not valueOf): Python rounds the true
      // binary value, not its shortest decimal representation
      val zij = new java.math.BigDecimal(zij0)
        .setScale(3, java.math.RoundingMode.HALF_EVEN).doubleValue()
      val p = chiSqP(zij * zij, 1)
      if (math.abs(zij) >= 1.96 && p <= alphaAdj) (if (zij > 0) "pos" else "neg")
      else "neu"
    })
  }

  /** Two-sided z critical value for the Bonferroni-adjusted alpha of an
    * r×c table — used to inline significance thresholds into oracle SQL. */
  def bonferroniZCrit(rows: Int, cols: Int, alpha: Double = 0.05): Double =
    new NormalDistribution().inverseCumulativeProbability(
      1.0 - alpha / (rows * cols) / 2.0)

  /** Adjusted Rand index from a contingency matrix of two labelings
    * (reference: sklearn adjusted_rand_score, metrics.py:268,301-306).
    * Pair-counting closed form on the k_a × k_b table. */
  def adjustedRandIndex(cont: Array[Array[Long]]): Double = {
    def c2(x: Long): Double = x.toDouble * (x - 1) / 2.0
    val sumIj = cont.iterator.flatten.map(c2).sum
    val a = cont.map(_.sum).map(c2).sum
    val b = cont.transpose.map(_.sum).map(c2).sum
    val n = cont.iterator.flatten.map(_.toDouble).sum
    val expected = a * b / c2(n.toLong)
    val maxIdx = (a + b) / 2.0
    if (maxIdx == expected) 1.0 else (sumIj - expected) / (maxIdx - expected)
  }

  /** Cochran's Q over k binary treatment columns (col sums `colSums`, per-row
    * sums of successes `rowSums`) and I² = (Q−df)/Q·100
    * (reference: statsmodels cochrans_q, metrics.py:578-633).
    * Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²), df = k−1. */
  def cochransQ(colSums: Array[Double], rowSumSquares: Double): (Double, Int, Double) = {
    val k = colSums.length
    val n = colSums.sum
    val denom = k * n - rowSumSquares
    val q = if (denom == 0.0) 0.0
      else (k - 1) * (k * colSums.map(c => c * c).sum - n * n) / denom
    val dof = k - 1
    val i2 = if (q == 0.0) 0.0 else (q - dof) / q * 100.0
    (q, dof, i2)
  }
}
