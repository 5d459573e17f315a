package graft.cluster

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Variational Bayesian Gaussian mixture with a DIRICHLET-PROCESS
  * weight-concentration prior — the reference's
  * `BayesianGaussianMixture(n_components, random_state=seed)` (sklearn
  * defaults: covariance_type='full', weight_concentration_prior_type=
  * 'dirichlet_process', clustering.py:906-918), replacing the plain-EM
  * approximation GmmSearch carried through round 4.
  *
  * The update equations are the standard truncated stick-breaking
  * variational Bayes (Bishop PRML §10.2 / Blei-Jordan 2006), the same family
  * sklearn implements:
  *
  *  - sticks: q(v_k) = Beta(γ1_k, γ2_k) with γ1_k = 1 + N_k,
  *    γ2_k = α₀ + Σ_{j>k} N_j and E[ln π_k] the digamma telescope — THIS is
  *    the weight-concentration update: components the data doesn't support
  *    get N_k → 0, their expected weight collapses geometrically, and an
  *    over-specified truncation level self-prunes (the signature DP
  *    behavior);
  *  - Gaussian-Wishart: β_k = β₀ + N_k, m_k = (β₀m₀ + N_k·x̄_k)/β_k,
  *    ν_k = ν₀ + N_k, W_k⁻¹ = W₀⁻¹ + N_k·S_k +
  *    (β₀N_k/β_k)(x̄_k−m₀)(x̄_k−m₀)ᵀ;
  *  - responsibilities: ln ρ_nk = E[ln π_k] + ½E[ln|Λ_k|] − d/(2β_k)
  *    − ½ν_k(x−m_k)ᵀW_k(x−m_k) − (d/2)ln 2π, row-normalized by logsumexp.
  *
  * Priors follow sklearn's data-driven defaults: α₀ = 1/k, β₀ = 1,
  * m₀ = mean(X), ν₀ = d, W₀⁻¹ = cov(X) + regCovar·I.
  *
  * Scale design: the model state is k·(d² + d + 4) driver-side doubles
  * (k ≤ 8, d ≤ 8 here); each iteration is ONE distributed pass — a
  * treeAggregate of the responsibility-weighted moment sums (k·(1 + d +
  * d(d+1)/2) doubles), the same sufficient-statistics shape MLlib's own
  * GaussianMixture aggregates — so iteration cost is a map over the data
  * plus an O(k·d²) driver update, independent of row count. The RDD is used
  * exactly as MLlib uses it: per-partition dense-arithmetic loops that a
  * Column expression tree cannot express without a 512-term codegen blowup
  * per component.
  *
  * Init mirrors sklearn's init_params='kmeans': one MLlib KMeans fit seeds
  * the responsibilities one-hot.
  */
object BayesianGmm {

  final case class BgmmModel(
      k: Int,
      weights: Array[Double],          // E[π] from the stick means, normalized
      means: Array[Array[Double]],     // m_k
      nk: Array[Double],               // soft counts N_k
      logLik: Double,                  // Σ_n logsumexp_k ln ρ_nk (sklearn score·n)
      converged: Boolean,
      iterations: Int)

  /** Recurrence-shifted asymptotic series. The shift count is computed
    * up-front (ceil form) and each recurrence term is 1/(x₀+m) with m an
    * exact integer — not the older sequential x += 1 walk — so the exact
    * float-op sequence can be replayed verbatim by the DuckDB oracle
    * ([[BgmmOracleSql]]); the two forms agree to ~1 ulp. */
  private[cluster] def digamma(x0: Double): Double = {
    val s = math.max(math.ceil(6.0 - x0).toInt, 0)
    var acc = 0.0
    var m = 0
    while (m < s) { acc -= 1.0 / (x0 + m); m += 1 }
    val x = x0 + s
    val inv = 1.0 / x
    val inv2 = inv * inv
    acc + math.log(x) - 0.5 * inv -
      inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
  }

  /** In-place LU with partial pivoting: returns (inverse, logdet) of a
    * small symmetric positive-definite matrix (d ≤ 8 here). */
  private[cluster] def invLogDet(a0: Array[Array[Double]])
      : (Array[Array[Double]], Double) = {
    val d = a0.length
    if (d == 2) {
      // closed-form adjugate for d = 2 — same arithmetic the DuckDB oracle
      // replays (LU pivoting is equivalent but not bit-replayable in SQL)
      val det = a0(0)(0) * a0(1)(1) - a0(0)(1) * a0(1)(0)
      require(det != 0.0, "singular matrix in BayesianGmm")
      val inv = Array(
        Array(a0(1)(1) / det, -a0(0)(1) / det),
        Array(-a0(1)(0) / det, a0(0)(0) / det))
      return (inv,
        math.log(math.abs(det)) + (if (det < 0) Double.NaN else 0.0))
    }
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val inv = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var logDet = 0.0
    var sign = 1.0
    var col = 0
    while (col < d) {
      var p = col
      var r = col + 1
      while (r < d) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      if (p != col) {
        val t = a(p); a(p) = a(col); a(col) = t
        val ti = inv(p); inv(p) = inv(col); inv(col) = ti
        sign = -sign
      }
      val piv = a(col)(col)
      require(piv != 0.0, "singular matrix in BayesianGmm")
      logDet += math.log(math.abs(piv))
      if (piv < 0) sign = -sign
      var j = 0
      while (j < d) { a(col)(j) /= piv; inv(col)(j) /= piv; j += 1 }
      r = 0
      while (r < d) {
        if (r != col && a(r)(col) != 0.0) {
          val f = a(r)(col)
          j = 0
          while (j < d) { a(r)(j) -= f * a(col)(j); inv(r)(j) -= f * inv(col)(j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    // SPD input ⇒ positive determinant; sign kept for safety of the log
    (inv, logDet + (if (sign < 0) Double.NaN else 0.0))
  }

  /** Per-component E-step constants, broadcast each iteration. */
  private final case class EStep(
      logPiTilde: Array[Double],       // E[ln π_k] + ½E[ln|Λ_k|] − d/(2β_k) − (d/2)ln2π
      nu: Array[Double],
      m: Array[Array[Double]],
      w: Array[Array[Array[Double]]])  // W_k (precision-scale matrix)

  private def logRho(e: EStep, x: Array[Double], k: Int): Double = {
    val d = x.length
    val m = e.m(k); val w = e.w(k)
    var quad = 0.0
    var i = 0
    while (i < d) {
      val di = x(i) - m(i)
      var j = 0
      var rowSum = 0.0
      while (j < d) { rowSum += w(i)(j) * (x(j) - m(j)); j += 1 }
      quad += di * rowSum
      i += 1
    }
    e.logPiTilde(k) - 0.5 * e.nu(k) * quad
  }

  /** @param initCol when set, an IntegerType column holding a 0..k-1 hard
    *                 init label per row — replaces the KMeans seeding with a
    *                 caller-deterministic one-hot init (the oracle-replay
    *                 parameterization, [[BgmmOracleSql]]); `seed` is then
    *                 unused. With tol = 0 the loop runs exactly `maxIter`
    *                 variational iterations — the seeded-unroll contract. */
  def fit(df: DataFrame, featuresCol: String, k: Int, seed: Long,
      maxIter: Int = 100, tol: Double = 1e-3, regCovar: Double = 1e-6,
      initCol: Option[String] = None)
      : (BgmmModel, DataFrame) = {
    import org.apache.spark.ml.linalg.Vector
    val spark = df.sparkSession
    val sel = initCol match {
      case Some(ic) => df.select(featuresCol, ic)
      case None => df.select(featuresCol)
    }
    val data: RDD[(Array[Double], Int)] = sel.rdd
      .map { r =>
        // fail with the CONTRACT, not an opaque NPE/AIOOBE deep in the
        // aggregate: initCol must be a non-null int in 0..k-1 per row
        val lbl =
          if (r.size <= 1) -1
          else {
            require(!r.isNullAt(1),
              s"initCol contains a null label (expected 0..${k - 1})")
            val v = r.getInt(1)
            require(v >= 0 && v < k,
              s"initCol label $v outside 0..${k - 1}")
            v
          }
        (r.getAs[Vector](0).toArray, lbl)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = data.count().toDouble
    val d = data.first()._1.length
    require(n > k, s"need more than k=$k rows")

    // sklearn data-driven priors: m0 = mean(X), W0^-1 = cov(X) + reg·I
    val (sumX, sumXX) = data.treeAggregate(
      (new Array[Double](d), Array.ofDim[Double](d, d)))(
      seqOp = { case ((s, ss), (x, _)) =>
        var i = 0
        while (i < d) {
          s(i) += x(i)
          var j = 0
          while (j < d) { ss(i)(j) += x(i) * x(j); j += 1 }
          i += 1
        }
        (s, ss)
      },
      combOp = { case ((s1, ss1), (s2, ss2)) =>
        var i = 0
        while (i < d) {
          s1(i) += s2(i)
          var j = 0
          while (j < d) { ss1(i)(j) += ss2(i)(j); j += 1 }
          i += 1
        }
        (s1, ss1)
      })
    val m0 = sumX.map(_ / n)
    val covX = Array.tabulate(d, d)((i, j) => sumXX(i)(j) / n - m0(i) * m0(j))
    val w0Inv = Array.tabulate(d, d)((i, j) =>
      covX(i)(j) + (if (i == j) regCovar else 0.0))
    val alpha0 = 1.0 / k
    val beta0 = 1.0
    val nu0 = d.toDouble

    // init_params='kmeans': one-hot responsibilities from an MLlib fit.
    // Computed eagerly on the DRIVER (a lazy val would be forced inside the
    // executor closure); empty — and never consulted — on the initCol path.
    val centers: Array[Array[Double]] =
      if (initCol.isDefined) Array.empty
      else new org.apache.spark.ml.clustering.KMeans().setK(k)
        .setSeed(seed).setFeaturesCol(featuresCol).setPredictionCol("__init")
        .fit(df).clusterCenters.map(_.toArray)
    def nearest(x: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        var s = 0.0; var i = 0
        while (i < d) { val t = x(i) - centers(c)(i); s += t * t; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    }

    // stats from hard init labels, then the variational loop refines softly
    def aggregate(estep: Option[EStep]): (Array[Double], Array[Array[Double]],
        Array[Array[Array[Double]]], Double) = {
      val bc = spark.sparkContext.broadcast(estep)
      val zero = (new Array[Double](k), Array.ofDim[Double](k, d),
        Array.ofDim[Double](k, d, d), 0.0)
      val (nk, sx, sxx, ll) = data.treeAggregate(zero)(
        seqOp = { case ((nk, sx, sxx, ll), (x, lbl)) =>
          val r = new Array[Double](k)
          var llRow = 0.0
          bc.value match {
            case None => r(if (lbl >= 0) lbl else nearest(x)) = 1.0
            case Some(e) =>
              var mx = Double.NegativeInfinity
              var c = 0
              while (c < k) { r(c) = logRho(e, x, c); if (r(c) > mx) mx = r(c); c += 1 }
              var z = 0.0
              c = 0
              while (c < k) { r(c) = math.exp(r(c) - mx); z += r(c); c += 1 }
              llRow = mx + math.log(z)
              c = 0
              while (c < k) { r(c) /= z; c += 1 }
          }
          var c = 0
          while (c < k) {
            val rc = r(c)
            if (rc > 0) {
              nk(c) += rc
              var i = 0
              while (i < d) {
                sx(c)(i) += rc * x(i)
                var j = 0
                while (j < d) { sxx(c)(i)(j) += rc * x(i) * x(j); j += 1 }
                i += 1
              }
            }
            c += 1
          }
          (nk, sx, sxx, ll + llRow)
        },
        combOp = { case ((n1, s1, ss1, l1), (n2, s2, ss2, l2)) =>
          var c = 0
          while (c < k) {
            n1(c) += n2(c)
            var i = 0
            while (i < d) {
              s1(c)(i) += s2(c)(i)
              var j = 0
              while (j < d) { ss1(c)(i)(j) += ss2(c)(i)(j); j += 1 }
              i += 1
            }
            c += 1
          }
          (n1, s1, ss1, l1 + l2)
        })
      bc.destroy()
      (nk, sx, sxx, ll)
    }

    // M-step: stats → posterior params → next E-step constants
    def mStep(nk: Array[Double], sx: Array[Array[Double]],
        sxx: Array[Array[Array[Double]]])
        : (EStep, Array[Double], Array[Array[Double]], Array[Double]) = {
      val tail = new Array[Double](k) // Σ_{j>k} N_j
      var acc = 0.0
      var c = k - 1
      while (c >= 0) { tail(c) = acc; acc += nk(c); c -= 1 }
      val g1 = Array.tabulate(k)(c => 1.0 + nk(c))
      val g2 = Array.tabulate(k)(c => alpha0 + tail(c))
      // E[ln π_k] stick telescope
      val logPi = new Array[Double](k)
      var cum = 0.0
      c = 0
      while (c < k) {
        logPi(c) = digamma(g1(c)) - digamma(g1(c) + g2(c)) + cum
        cum += digamma(g2(c)) - digamma(g1(c) + g2(c))
        c += 1
      }
      val beta = Array.tabulate(k)(c => beta0 + nk(c))
      val nu = Array.tabulate(k)(c => nu0 + nk(c))
      val m = Array.tabulate(k, d) { (c, i) =>
        (beta0 * m0(i) + sx(c)(i)) / beta(c)
      }
      val logPiTilde = new Array[Double](k)
      val w = new Array[Array[Array[Double]]](k)
      c = 0
      while (c < k) {
        val nkc = math.max(nk(c), 1e-12)
        val xbar = Array.tabulate(d)(i => sx(c)(i) / nkc)
        val wInv = Array.tabulate(d, d) { (i, j) =>
          val s = sxx(c)(i)(j) - nkc * xbar(i) * xbar(j) // N_k·S_k
          val dev = (beta0 * nk(c) / beta(c)) * (xbar(i) - m0(i)) * (xbar(j) - m0(j))
          w0Inv(i)(j) + s + dev + (if (i == j) regCovar * nkc else 0.0)
        }
        val (wc, logDetWInv) = invLogDet(wInv)
        w(c) = wc
        // E[ln|Λ|] = Σ ψ((ν+1−i)/2) + d ln2 + ln|W| ; ln|W| = −ln|W⁻¹|
        var eLogDet = d * math.log(2.0) - logDetWInv
        var i = 1
        while (i <= d) { eLogDet += digamma((nu(c) + 1 - i) / 2.0); i += 1 }
        logPiTilde(c) = logPi(c) + 0.5 * eLogDet - d / (2.0 * beta(c)) -
          (d / 2.0) * math.log(2.0 * math.Pi)
        c += 1
      }
      // expected mixture weights from the stick means, normalized
      val stickMean = Array.tabulate(k)(c => g1(c) / (g1(c) + g2(c)))
      val rawW = new Array[Double](k)
      var rem = 1.0
      c = 0
      while (c < k) { rawW(c) = stickMean(c) * rem; rem *= 1.0 - stickMean(c); c += 1 }
      val z = rawW.sum
      (EStep(logPiTilde, nu, m, w), nk, m, rawW.map(_ / z))
    }

    // loop: hard-init stats → M → (E+stats → M)* until the mean row
    // log-norm (sklearn's lower-bound proxy) moves < tol
    var (nk, sx, sxx, _) = aggregate(None)
    var state = mStep(nk, sx, sxx)
    var logLik = Double.NegativeInfinity
    var converged = false
    var iter = 0
    while (iter < maxIter && !converged) {
      val (nk1, sx1, sxx1, ll) = aggregate(Some(state._1))
      state = mStep(nk1, sx1, sxx1)
      nk = nk1
      converged = math.abs(ll / n - logLik / n) < tol
      logLik = ll
      iter += 1
    }

    // label pass: argmax_k ln ρ_nk appended to the caller's rows
    val e = state._1
    val bc = spark.sparkContext.broadcast(e)
    val fIdx = df.schema.fieldIndex(featuresCol)
    val outSchema = StructType(df.schema.fields :+
      StructField("cluster", IntegerType, nullable = false))
    val labeledRdd = df.rdd.map { row =>
      val x = row.getAs[Vector](fIdx).toArray
      var best = 0; var bestV = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val v = logRho(bc.value, x, c)
        if (v > bestV) { bestV = v; best = c }
        c += 1
      }
      Row.fromSeq(row.toSeq :+ best)
    }
    val labeled = spark.createDataFrame(labeledRdd, outSchema)
    data.unpersist(blocking = false)
    (BgmmModel(k, state._4, state._3, nk, logLik, converged, iter), labeled)
  }
}
