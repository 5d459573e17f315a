package graft.cluster

import org.apache.spark.ml.clustering.GaussianMixture
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gaussian-mixture segmentation (SURVEY.md M9). The reference fits a
  * Dirichlet-process BayesianGaussianMixture (clustering.py:906-984); MLlib's
  * GaussianMixture is plain EM without the Dirichlet prior — documented
  * approximation (SURVEY §7.4): same labels-from-argmax-posterior surface,
  * BIC/AIC computed from the summary log-likelihood, and the reference's
  * "reject clusters under 1% of rows" guard (clustering.py:944).
  */
object GmmSearch {

  final case class GmmFit(k: Int, seed: Long, logLik: Double, bic: Double,
      aic: Double, minShare: Double, accepted: Boolean, labeled: DataFrame)

  def fitOne(df: DataFrame, featuresCol: String, k: Int, seed: Long,
      minClusterShare: Double = 0.01): GmmFit = {
    val model = new GaussianMixture().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster").fit(df)
    val labeled = model.transform(df)
    val n = df.count()
    val shares = labeled.groupBy("cluster").count().collect()
      .map(_.getLong(1).toDouble / n)
    val minShare = if (shares.isEmpty) 0.0 else shares.min
    val d = df.select(featuresCol).head().getAs[Vector](0).size
    // free params: k-1 weights + k*d means + k*d(d+1)/2 full covariances
    val p = (k - 1) + k * d + k * d * (d + 1) / 2
    val ll = model.summary.logLikelihood
    GmmFit(k, seed, ll,
      bic = -2 * ll + p * math.log(n.toDouble),
      aic = -2 * ll + 2 * p,
      minShare = minShare,
      accepted = shares.length == k && minShare >= minClusterShare,
      labeled = labeled)
  }

  /** Grid over k × seeds; best accepted fit by BIC (ascending). */
  def search(df: DataFrame, featuresCol: String, ks: Range = 3 until 9,
      seeds: Seq[Long] = KMeansSearch.Seeds.take(3)): GmmFit = {
    val cached = df.cache()
    cached.count() // materialize before the concurrent fits
    // concurrent independent fits (graft.Par) — the reference's nested
    // joblib fan-out over n_classes × seeds (clustering.py:968-1001),
    // bounded instead of oversubscribed
    val fits = graft.Par.grid(for (k <- ks; s <- seeds) yield (k, s)) {
      case (k, s) => fitOne(cached, featuresCol, k, s)
    }
    val accepted = fits.filter(_.accepted)
    (if (accepted.nonEmpty) accepted else fits).minBy(f => (f.bic, f.k, f.seed))
  }
}
