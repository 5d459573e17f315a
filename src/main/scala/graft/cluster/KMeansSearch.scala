package graft.cluster

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMeans seed/k grid search with the reference's selection machinery
  * (SURVEY.md M4, M7, M8, M13, balance filter; clustering.py:110-118,
  * 293-478, 682-696, 792-809).
  *
  * The grid itself is sequential MLlib fits (each fit is a distributed job;
  * at survey scale the fits are seconds — the reference's process-pool
  * fan-out becomes scheduler-level concurrency if ever needed). Selection
  * metrics are computed per candidate and the rank-sum argmax runs on the
  * tiny driver-side metric table with pandas average-rank semantics (W1).
  */
object KMeansSearch {

  /** The reference's fixed seed battery (clustering.py:116). */
  val Seeds: Seq[Long] = Seq(1L, 42L, 100L, 200L, 404L, 500L, 1000L, 123L, 321L, 78L)

  final case class Candidate(k: Int, seed: Long, cost: Double,
      silhouette: Double, balanced: Boolean, shares: Map[Int, Double])

  final case class Selection(k: Int, seed: Long, model: org.apache.spark.ml.clustering.KMeansModel,
      labeled: DataFrame, candidates: Seq[Candidate])

  /** Fit one KMeans; returns (model, labeled frame, inertia). */
  def fitOne(df: DataFrame, featuresCol: String, k: Int, seed: Long) = {
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol(featuresCol)
      .setPredictionCol("cluster").fit(df)
    (model, model.transform(df), model.summary.trainingCost)
  }

  /** Cluster share balance filter: every cluster share must lie strictly in
    * (minShare, maxShare) (clustering.py:117-118, 792-809). */
  def isBalanced(labeled: DataFrame, minShare: Double = 0.02,
      maxShare: Double = 0.55): (Boolean, Map[Int, Double]) = {
    val counts = labeled.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble)
    val n = counts.map(_._2).sum
    val shares = counts.map { case (c, cnt) => c -> cnt / n }.toMap
    (shares.values.forall(s => s > minShare && s < maxShare), shares)
  }

  /** Elbow point: k whose cost has maximum perpendicular distance to the
    * line between the first and last cost points (clustering.py:446-468).
    * Driver-side on a ≤6-point curve. */
  def elbowK(costs: Seq[(Int, Double)]): Int = {
    require(costs.size >= 2)
    val sorted = costs.sortBy(_._1)
    val (x1, y1) = (sorted.head._1.toDouble, sorted.head._2)
    val (x2, y2) = (sorted.last._1.toDouble, sorted.last._2)
    val denom = math.hypot(x2 - x1, y2 - y1)
    sorted.maxBy { case (k, c) =>
      math.abs((y2 - y1) * k - (x2 - x1) * c + x2 * y1 - y2 * x1) / denom
    }._1
  }

  /** Pandas-style average rank (ties share the mean of their positions) —
    * the reference ranks metric columns this way (metrics.py:127-146). */
  def averageRank(values: Seq[Double], ascending: Boolean): Seq[Double] = {
    val sorted = values.sorted
    val ord = if (ascending) sorted else sorted.reverse
    values.map { v =>
      val first = ord.indexOf(v)
      val count = ord.count(_ == v)
      (2 * first + count + 1) / 2.0
    }
  }

  /** Full search: grid over k × seeds, balance-filter, rank-sum select.
    * Rank criteria mirror the reference: silhouette desc, cost asc, with an
    * elbow bonus on the per-k cost curve (clustering.py:391-478). */
  def search(df: DataFrame, featuresCol: String, ks: Range = 3 until 9,
      seeds: Seq[Long] = Seeds.take(3), elbowBonus: Double = 1.0): Selection = {
    val cached = df.cache()
    cached.count() // materialize once before the concurrent fits race to it
    // concurrent independent Spark jobs (graft.Par) — the reference's
    // joblib per-seed fan-out (clustering.py:744-746); order-preserving,
    // so the rank-sum selection below is unchanged
    val fits = try {
      graft.Par.grid(for (k <- ks; seed <- seeds) yield (k, seed)) {
        case (k, seed) =>
          val (model, labeled, cost) = fitOne(cached, featuresCol, k, seed)
          val (ok, shares) = isBalanced(labeled)
          val sil = if (ok) new ClusteringEvaluator().setFeaturesCol(featuresCol)
            .setPredictionCol("cluster").setMetricName("silhouette")
            .evaluate(labeled) else -1.0
          (Candidate(k, seed, cost, sil, ok, shares), model, labeled)
      }
    } finally cached.unpersist(blocking = false)
    // every fit/metric action above has run; the grid cache is released and
    // the returned labeling is rebuilt over the CALLER's frame (a cheap
    // model.transform map) so no storage outlives the search
    val candidates = fits.map(_._1)
    val pool0 = fits.filter(_._1.balanced)
    val pool = if (pool0.nonEmpty) pool0 else fits
    val perKCost = pool.groupBy(_._1.k).view
      .mapValues(_.map(_._1.cost).min).toSeq.map(t => (t._1, t._2))
    val elbow = if (perKCost.size >= 2) elbowK(perKCost) else pool.head._1.k
    val silRank = averageRank(pool.map(_._1.silhouette), ascending = false)
    val costRank = averageRank(pool.map(_._1.cost), ascending = true)
    val scores = pool.indices.map { i =>
      -(silRank(i) + costRank(i)) + (if (pool(i)._1.k == elbow) elbowBonus else 0.0)
    }
    val bestIdx = pool.indices.maxBy(i => (scores(i), -pool(i)._1.k, -pool(i)._1.seed))
    val (best, model, _) = pool(bestIdx)
    Selection(best.k, best.seed, model, model.transform(df), candidates)
  }
}
