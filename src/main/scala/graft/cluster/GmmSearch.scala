package graft.cluster

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gaussian-mixture segmentation (SURVEY.md M9). The reference fits a
  * Dirichlet-process BayesianGaussianMixture (clustering.py:906-984); since
  * round 5 the fit IS the variational DP mixture ([[BayesianGmm]]: stick-
  * breaking weight-concentration prior, Gaussian-Wishart posteriors), and
  * the reference's surrounding semantics are mirrored exactly:
  *
  *  - free-parameter count uses EFFECTIVE components (distinct predicted
  *    labels), not requested k (get_n_parameters, clustering.py:923-937) —
  *    under the DP prior an over-specified k shrinks, so eff < k is the
  *    expected regime, not an edge case;
  *  - a degenerate fit (singular covariance / NaN bound — sklearn's
  *    ValueError) is retried once with reg_covar = 1e-5
  *    (clustering.py:911-917), the reference's exact retry;
  *  - fits whose smallest PREDICTED cluster holds <1% of rows are rejected
  *    (clustering.py:944-945 — pandas value_counts only ranges over labels
  *    that occur, so DP-pruned empty components do NOT reject a fit);
  *  - the winner maximizes the rank SUM over silhouette / Davies-Bouldin /
  *    Calinski-Harabasz / BIC / AIC with BIC rank weighted 1.3
  *    (rank_cluster_metrics, metrics.py:128-147), not BIC alone.
  */
object GmmSearch {

  final case class GmmFit(k: Int, seed: Long, logLik: Double, bic: Double,
      aic: Double, minShare: Double, accepted: Boolean, labeled: DataFrame,
      effectiveK: Int = 0, retried: Boolean = false,
      weights: Array[Double] = Array.empty)

  def fitOne(df: DataFrame, featuresCol: String, k: Int, seed: Long,
      minClusterShare: Double = 0.01): GmmFit = {
    var retried = false
    var res =
      try Some(BayesianGmm.fit(df, featuresCol, k, seed))
      catch { case _: IllegalArgumentException => None }
    if (res.isEmpty || res.get._1.logLik.isNaN || res.get._1.logLik.isInfinite) {
      // sklearn's except-ValueError path: one retry at reg_covar = 1e-5
      retried = true
      res = Some(BayesianGmm.fit(df, featuresCol, k, seed, regCovar = 1e-5))
    }
    val (model, labeled) = res.get
    val n = df.count()
    val shares = labeled.groupBy("cluster").count().collect()
      .map(_.getLong(1).toDouble / n)
    val minShare = if (shares.isEmpty) 0.0 else shares.min
    val d = df.select(featuresCol).head().getAs[Vector](0).size
    // free params from EFFECTIVE components (clusters actually predicted):
    // eff·d(d+1)/2 full covariances + eff·d means + eff−1 weights
    val eff = shares.length
    val p = (eff - 1) + eff * d + eff * d * (d + 1) / 2
    val ll = model.logLik
    GmmFit(k, seed, ll,
      bic = -2 * ll + p * math.log(n.toDouble),
      aic = -2 * ll + 2 * p,
      minShare = minShare,
      accepted = minShare >= minClusterShare,
      labeled = labeled, effectiveK = eff, retried = retried,
      weights = model.weights)
  }

  /** Grid over k × seeds; winner by the reference's weighted rank sum
    * (silhouette ↑, DB ↓, CH ↑, BIC ↓ ×1.3, AIC ↓) over accepted fits. */
  def search(df: DataFrame, featuresCol: String, ks: Range = 3 until 9,
      seeds: Seq[Long] = KMeansSearch.Seeds.take(3)): GmmFit = {
    val cached = df.cache()
    cached.count() // materialize before the concurrent fits
    // concurrent independent fits (graft.Par) — the reference's nested
    // joblib fan-out over n_classes × seeds (clustering.py:968-1001),
    // bounded instead of oversubscribed
    val fits = try {
      graft.Par.grid(for (k <- ks; s <- seeds) yield (k, s)) {
        case (k, s) => fitOne(cached, featuresCol, k, s)
      }
    } finally () // cache released after metric scoring below
    val accepted = fits.filter(_.accepted)
    val pool = if (accepted.nonEmpty) accepted else fits
    val sel =
      if (pool.size == 1) pool.head
      else {
        val evaluator = new org.apache.spark.ml.evaluation.ClusteringEvaluator()
          .setFeaturesCol(featuresCol).setPredictionCol("cluster")
          .setMetricName("silhouette")
        val withArr = (f: GmmFit) => f.labeled.withColumn("__arr",
          org.apache.spark.ml.functions.vector_to_array(col(featuresCol)))
        val scored = pool.map { f =>
          import graft.metrics.ClusterQuality
          (f, evaluator.evaluate(f.labeled),
            ClusterQuality.daviesBouldin(withArr(f), "__arr", "cluster"),
            ClusterQuality.calinskiHarabasz(withArr(f), "__arr", "cluster"))
        }
        import KMeansSearch.averageRank
        val silR = averageRank(scored.map(_._2), ascending = true)
        val dbR = averageRank(scored.map(_._3), ascending = false)
        val chR = averageRank(scored.map(_._4), ascending = true)
        val bicR = averageRank(pool.map(_.bic), ascending = false).map(_ * 1.3)
        val aicR = averageRank(pool.map(_.aic), ascending = false)
        val sums = pool.indices.map(i =>
          silR(i) + dbR(i) + chR(i) + bicR(i) + aicR(i))
        // reference: rank_sum idxmax, first on ties (pandas idxmax)
        pool(pool.indices.maxBy(i => (sums(i), -i)))
      }
    cached.unpersist(blocking = false)
    sel
  }
}
