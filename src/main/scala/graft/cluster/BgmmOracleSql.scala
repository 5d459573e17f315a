package graft.cluster

/** DuckDB oracle generator for the SEEDED variational Bayesian GMM
  * ([[BayesianGmm.fit]] with `initCol`, tol = 0) at the oracle-replayable
  * parameterization: k = 3 components, d = 2 features, deterministic
  * one-hot init from `id % 3`, and exactly `iters` = 2 variational
  * iterations — the same seeded-deterministic-replay registration trick as
  * the m4/m5/m6 Lloyd oracles ([[LloydOracleSql]]) and the m10 LCA unroll
  * ([[LcaOracleSql]]), applied to the last stochastic fit on the board
  * (reference semantics clustering.py:906-984).
  *
  * Every M-step is unrolled WIDE (one row, columns per component):
  *
  *   stats:  responsibility-weighted moment sums Σr, Σr·x, Σr·x·x per
  *           component — the SQL mirror of the Spark side's treeAggregate;
  *   sticks: γ1 = 1 + N_k, γ2 = α₀ + Σ_{j>k} N_j, E[ln π] via the digamma
  *           telescope;
  *   Gaussian-Wishart: β, ν, m, W⁻¹ = W₀⁻¹ + N·S + (β₀N/β)(x̄−m₀)(x̄−m₀)ᵀ
  *           + reg·N·I, closed-form 2×2 inverse and log-determinant;
  *   E-step: ln ρ_nk = E-step constant − ½ν(x−m)ᵀW(x−m), logsumexp
  *           normalization — per (id, component) rows.
  *
  * The digamma function is NOT built into DuckDB, so the oracle expands the
  * exact recurrence + asymptotic series [[BayesianGmm.digamma]] computes:
  * the shift count is a closed-form CEIL, each recurrence term is
  * 1/(x+m) with integer m, and the series is the identical Horner nesting —
  * the float-op sequence matches the Scala implementation op for op.
  *
  * Bit-exactness contract (the LcaOracleSql risk profile): every scalar
  * expression replicates the Scala operation ORDER (left-associated sums,
  * the same recomputed subexpressions), so the only cross-engine
  * divergences are (a) float SUM accumulation order over the data — Spark's
  * treeAggregate vs DuckDB's sequential scan — and (b) libm vs
  * java.lang.Math ln/exp ulp differences. Both perturb at ~1e-13 relative
  * and are absorbed by the 4 dp output rounding unless an argmax lands on a
  * near-exact tie. */
object BgmmOracleSql {

  /** Expand ψ(x) for a column `nm`, given its precomputed shift count
    * column `s_nm`: ψ(x) = −Σ_{m<s} 1/(x+m) + ln(X) − 1/(2X) − series(X),
    * X = x + s. The expansion text mirrors [[BayesianGmm.digamma]]'s
    * op order exactly. */
  private def dg(nm: String): String = {
    val terms = (0 until 6).map(m =>
      s"(CASE WHEN $m < s_$nm THEN 1.0/($nm + $m) ELSE 0.0 END)")
      .mkString(" - ")
    val x = s"($nm + s_$nm)"
    s"(0.0 - $terms + LN($x) - 0.5*(1.0/$x) - " +
      s"((1.0/$x)*(1.0/$x))*(1.0/12.0 - ((1.0/$x)*(1.0/$x))*" +
      s"(1.0/120.0 - ((1.0/$x)*(1.0/$x))/252.0)))"
  }

  private val C = 0 until 3 // component index range (k = 3)

  /** Oracle SQL for `BayesianGmm.fit(df, "features", k = 3, maxIter = 2,
    * tol = 0, initCol)` over 2-d features with init label `id % 3`.
    *
    * @param tallSql CTE body producing (id BIGINT, x1 DOUBLE, x2 DOUBLE) —
    *                must reproduce the Spark-side projection exactly
    * @return SQL yielding (cluster, n, w, mu1, mu2) — observed clusters
    *         with sizes and the final model's stick-breaking weights and
    *         posterior means at 4 dp */
  def seeded2d(tallSql: String, iters: Int = 2,
      regCovar: Double = 1e-6): String = {
    // constants embedded exactly as the Scala side computes them
    // (Double.toString round-trips, DuckDB parses correctly rounded)
    val alpha0 = (1.0 / 3).toString               // weight concentration
    val dLn2 = (2 * math.log(2.0)).toString       // d·ln2, d = 2
    val lnNorm = ((2 / 2.0) * math.log(2.0 * math.Pi)).toString
    val reg = regCovar.toString
    val dgNames = C.flatMap(c =>
      Seq(s"g1_$c", s"g2_$c", s"g12_$c", s"nua_$c", s"nub_$c"))

    val sb = new StringBuilder
    sb ++= s"""WITH b AS ($tallSql),
      bs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
        SUM(x1) AS t1, SUM(x2) AS t2, SUM(x1*x1) AS t11, SUM(x1*x2) AS t12,
        SUM(x2*x1) AS t21, SUM(x2*x2) AS t22 FROM b),
      prior AS (SELECT nn, t1/nn AS m0_1, t2/nn AS m0_2,
        (t11/nn - (t1/nn)*(t1/nn)) + $reg AS w0i11,
        (t12/nn - (t1/nn)*(t2/nn)) + 0.0 AS w0i12,
        (t21/nn - (t2/nn)*(t1/nn)) + 0.0 AS w0i21,
        (t22/nn - (t2/nn)*(t2/nn)) + $reg AS w0i22 FROM bs),
      rs0 AS (SELECT id, x1, x2,
        ${C.map(c => s"CASE WHEN id % 3 = $c THEN 1.0 ELSE 0.0 END AS r$c")
          .mkString(",\n        ")} FROM b)"""

    for (t <- 0 to iters) {
      // ---- M-step t: moment stats -> posterior params ----
      sb ++= s""",
      s$t AS (SELECT
        ${C.map(c => s"""SUM(r$c) AS n_$c, SUM(r$c*x1) AS sx1_$c,
        SUM(r$c*x2) AS sx2_$c, SUM(r$c*x1*x1) AS sxx11_$c,
        SUM(r$c*x1*x2) AS sxx12_$c, SUM(r$c*x2*x1) AS sxx21_$c,
        SUM(r$c*x2*x2) AS sxx22_$c""").mkString(",\n        ")}
        FROM rs$t),
      a$t AS (SELECT s.*, pr.*,
        ${C.map(c => s"GREATEST(n_$c, 1.0E-12) AS nkc_$c").mkString(", ")},
        ${C.map(c => s"1.0 + n_$c AS g1_$c").mkString(", ")},
        $alpha0 + (n_2 + n_1) AS g2_0,
        $alpha0 + n_2 AS g2_1,
        $alpha0 + 0.0 AS g2_2,
        ${C.map(c => s"1.0 + n_$c AS beta_$c").mkString(", ")},
        ${C.map(c => s"2.0 + n_$c AS nu_$c").mkString(", ")}
        FROM s$t s, prior pr),
      bx$t AS (SELECT *,
        ${C.map(c => s"""sx1_$c/nkc_$c AS xbar1_$c, sx2_$c/nkc_$c AS xbar2_$c,
        (1.0*m0_1 + sx1_$c)/beta_$c AS m1_$c,
        (1.0*m0_2 + sx2_$c)/beta_$c AS m2_$c,
        g1_$c + g2_$c AS g12_$c,
        ((nu_$c + 1) - 1)/2.0 AS nua_$c,
        ((nu_$c + 1) - 2)/2.0 AS nub_$c""").mkString(",\n        ")}
        FROM a$t),
      dx$t AS (SELECT *,
        ${dgNames.map(nm =>
          s"GREATEST(CAST(CEIL(6.0 - $nm) AS INT), 0) AS s_$nm")
          .mkString(",\n        ")}
        FROM bx$t),
      dg$t AS (SELECT *,
        ${dgNames.map(nm => s"${dg(nm)} AS p_$nm").mkString(",\n        ")}
        FROM dx$t),
      p$t AS (SELECT *,
        (p_g1_0 - p_g12_0) + 0.0 AS logpi_0,
        (p_g1_1 - p_g12_1) + (p_g2_0 - p_g12_0) AS logpi_1,
        (p_g1_2 - p_g12_2) + ((p_g2_0 - p_g12_0) + (p_g2_1 - p_g12_1))
          AS logpi_2,
        ${C.map(c => s"""((w0i11 + (sxx11_$c - (nkc_$c*xbar1_$c)*xbar1_$c))
          + (((1.0*n_$c)/beta_$c)*(xbar1_$c - m0_1))*(xbar1_$c - m0_1))
          + ($reg*nkc_$c) AS a11_$c,
        ((w0i12 + (sxx12_$c - (nkc_$c*xbar1_$c)*xbar2_$c))
          + (((1.0*n_$c)/beta_$c)*(xbar1_$c - m0_1))*(xbar2_$c - m0_2))
          + 0.0 AS a12_$c,
        ((w0i21 + (sxx21_$c - (nkc_$c*xbar2_$c)*xbar1_$c))
          + (((1.0*n_$c)/beta_$c)*(xbar2_$c - m0_2))*(xbar1_$c - m0_1))
          + 0.0 AS a21_$c,
        ((w0i22 + (sxx22_$c - (nkc_$c*xbar2_$c)*xbar2_$c))
          + (((1.0*n_$c)/beta_$c)*(xbar2_$c - m0_2))*(xbar2_$c - m0_2))
          + ($reg*nkc_$c) AS a22_$c""").mkString(",\n        ")}
        FROM dg$t),
      q$t AS (SELECT *,
        ${C.map(c => s"a11_$c*a22_$c - a12_$c*a21_$c AS det_$c")
          .mkString(", ")}
        FROM p$t),
      w$t AS (SELECT *,
        ${C.map(c => s"""a22_$c/det_$c AS w11_$c, (-a12_$c)/det_$c AS w12_$c,
        (-a21_$c)/det_$c AS w21_$c, a11_$c/det_$c AS w22_$c,
        ((logpi_$c + 0.5*((($dLn2 - LN(ABS(det_$c))) + p_nua_$c) + p_nub_$c))
          - 2.0/(2.0*beta_$c)) - $lnNorm AS lpt_$c""")
          .mkString(",\n        ")}
        FROM q$t)"""

      // ---- E-step under M_t: log-densities per (row, component) ----
      val u = t + 1
      sb ++= s""",
      e$u AS (SELECT b.id, b.x1, b.x2, w.* FROM b, w$t w),
      l$u AS (SELECT *,
        ${C.map(c => s"""lpt_$c - 0.5*nu_$c*((x1 - m1_$c)*(w11_$c*(x1 - m1_$c)
          + w12_$c*(x2 - m2_$c)) + (x2 - m2_$c)*(w21_$c*(x1 - m1_$c)
          + w22_$c*(x2 - m2_$c))) AS lr_$c""").mkString(",\n        ")}
        FROM e$u)"""

      if (t < iters) {
        // normalized responsibilities feed the next iteration's stats
        sb ++= s""",
      mx$u AS (SELECT *, GREATEST(lr_0, lr_1, lr_2) AS mx FROM l$u),
      rs$u AS (SELECT id, x1, x2,
        ${C.map(c =>
          s"""EXP(lr_$c - mx)/((EXP(lr_0 - mx) + EXP(lr_1 - mx))
          + EXP(lr_2 - mx)) AS r$c""").mkString(",\n        ")}
        FROM mx$u)"""
      }
    }

    // final labels: strict-> argmax (first max wins, matching the Scala
    // label pass), plus the last M-step's stick weights for the output
    val lf = iters + 1
    sb ++= s""",
      lab AS (SELECT id,
        CASE WHEN lr_1 > lr_0 THEN CASE WHEN lr_2 > lr_1 THEN 2 ELSE 1 END
             ELSE CASE WHEN lr_2 > lr_0 THEN 2 ELSE 0 END END AS cluster
        FROM l$lf),
      st AS (SELECT *,
        ${C.map(c => s"g1_$c/(g1_$c + g2_$c) AS sm_$c").mkString(", ")}
        FROM w$iters),
      sw AS (SELECT *, sm_0*1.0 AS rw_0, sm_1*(1.0 - sm_0) AS rw_1,
        sm_2*((1.0 - sm_0)*(1.0 - sm_1)) AS rw_2 FROM st),
      sz AS (SELECT *, (rw_0 + rw_1) + rw_2 AS z FROM sw),
      params AS (${C.map(c =>
        s"SELECT $c AS cluster, rw_$c/z AS w, m1_$c AS mu1, m2_$c AS mu2 FROM sz")
        .mkString("\n        UNION ALL ")})
      SELECT l.cluster, COUNT(*) AS n, ROUND(p.w, 4) AS w,
             ROUND(p.mu1, 4) AS mu1, ROUND(p.mu2, 4) AS mu2
      FROM lab l JOIN params p USING (cluster)
      GROUP BY l.cluster, p.w, p.mu1, p.mu2
      ORDER BY cluster"""
    sb.toString
  }
}
