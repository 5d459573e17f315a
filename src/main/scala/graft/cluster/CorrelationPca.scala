package graft.cluster

/** Closed-form PCA over a 3-feature CORRELATION matrix — the
  * oracle-replayable parameterization of SURVEY.md M3 (PCA component count
  * at a cumulative explained-variance threshold, clustering.py's
  * PCA-then-cumsum selection): a 3×3 symmetric eigenproblem has an exact
  * trigonometric solution (the classic Smith 1961 / Cardano-for-symmetric
  * formula), so the ENTIRE eigensolve is deterministic scalar arithmetic
  * that DuckDB evaluates too — no cross-engine eigensolver needed.
  *
  * Cross-engine parity contract (the q_m3 oracle): both engines receive the
  * IDENTICAL rounded correlations (6 dp absorbs aggregation-order ulps) and
  * then evaluate the IDENTICAL IEEE expression sequence — every formula
  * below is written in the exact association order the SQL uses, with
  * sqrt/cos/acos the only non-correctly-rounded steps (libm vs StrictMath
  * differences are ≤ 1 ulp, orders of magnitude inside the 6-dp output
  * rounding). The correlation matrix has unit diagonal, which collapses the
  * general symmetric formula: q = trace/3 = 1, A − qI has zero diagonal,
  * p² = 2(c12² + c13² + c23²)/6 and det(B)/2 = b12·b13·b23.
  *
  * The general d-dimensional PCA path (MLlib SVD) remains
  * [[FeaturePipeline.pcaAtVariance]] — exercised by q_m9's 8-dim reduction
  * and its spec; this object certifies the component-selection semantics
  * end-to-end against DuckDB.
  */
object CorrelationPca {

  private val TwoPiOver3 = 2.0943951023931953

  /** Eigenvalues of [[1, c12, c13], [c12, 1, c23], [c13, c23, 1]] in
    * DESCENDING order. */
  def eigenvalues3(c12: Double, c13: Double, c23: Double): Seq[Double] = {
    val p1 = c12 * c12 + c13 * c13 + c23 * c23
    if (p1 == 0.0) return Seq(1.0, 1.0, 1.0) // already diagonal
    val p = math.sqrt(2.0 * p1 / 6.0)
    val b12 = c12 / p
    val b13 = c13 / p
    val b23 = c23 / p
    val r = math.min(1.0, math.max(-1.0, b12 * b13 * b23))
    val phi = math.acos(r) / 3.0
    val e1 = 1.0 + 2.0 * p * math.cos(phi)
    val e3 = 1.0 + 2.0 * p * math.cos(phi + TwoPiOver3)
    val e2 = 3.0 - e1 - e3
    // cos is decreasing on [0, π] and 0 ≤ phi ≤ π/3 ⇒ e1 ≥ e2 ≥ e3 already
    Seq(e1, e2, e3)
  }

  /** Smallest m with cumulative explained-variance ratio ≥ threshold; the
    * trace of a 3×3 correlation matrix is exactly 3, so ratios divide by
    * 3.0 (same cascade as the SQL CASE). */
  def componentsAtVariance(eigs: Seq[Double], threshold: Double): Int = {
    val cr1 = eigs(0) / 3.0
    val cr2 = (eigs(0) + eigs(1)) / 3.0
    if (cr1 >= threshold) 1 else if (cr2 >= threshold) 2 else 3
  }
}
