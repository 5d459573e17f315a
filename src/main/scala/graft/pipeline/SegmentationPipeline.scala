package graft.pipeline

import graft.cluster._
import graft.etl.Cleaning
import graft.inference.ChiSquaredInference
import graft.metrics.{ClusterQuality, ModelMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end segmentation run (SURVEY.md §3.1/§3.2 — the reference's
  * `do_segmentation_and_save_to_s3` + `Clusterings.run_all_segmentations`):
  * clean → per-algorithm segmentation battery → χ² deliver stats → business
  * metrics, one result bundle per algorithm.
  *
  * The reference fans algorithms out over joblib process pools; here each
  * algorithm is already a distributed Spark job, so the battery runs
  * sequentially (scheduler-level `Future` concurrency would be a config
  * knob, not a semantic change). The cleaned+encoded frame is cached once
  * and shared by every algorithm — the reference re-copies it per algorithm
  * (§4.2), which is the single biggest waste it has.
  */
object SegmentationPipeline {

  final case class Config(
      idCol: String,
      clusterCols: Seq[String],
      weightCol: Option[String] = None,
      alpha: Double = 0.05,
      ks: Range = 3 until 6,
      seeds: Seq[Long] = KMeansSearch.Seeds.take(2),
      rulesCol: Option[String] = None)

  final case class Result(
      algorithm: String,
      labeled: DataFrame,
      deliver: DataFrame,
      metrics: Map[String, Double])

  /** Business-metric bundle per labeled segmentation (metrics.py:814-911
    * field family). */
  def segmentMetrics(labeled: DataFrame, deliver: DataFrame,
      featuresCol: Option[String]): Map[String, Double] = {
    val counts = labeled.groupBy("cluster").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1).toDouble)
    val n = counts.map(_._2).sum
    val shares = counts.map(_._2 / n)
    val k = counts.length.toDouble
    val sil = featuresCol.map(f =>
      ModelMetrics.silhouette(labeled, f)).getOrElse(Double.NaN)
    val deliverRows = deliver.collect()
    val sigPerCluster = deliverRows.groupBy(_.getAs[String]("cluster"))
      .view.mapValues(_.length.toDouble).toMap
    // uniqueness (M27) on the deliver pairs
    val pairs = deliverRows.flatMap { r =>
      r.getAs[scala.collection.Seq[String]]("sig_more_category").toSeq.map(c =>
        (r.getAs[String]("cluster"), r.getAs[String]("variable"), c))
    }
    val uniq =
      if (pairs.isEmpty) 1.0
      else {
        val byCluster = pairs.groupBy(_._1)
        val us = byCluster.map { case (c, ps) =>
          val others = pairs.filter(_._1 != c).map(p => (p._2, p._3)).toSet
          val shared = ps.count(p => others.contains((p._2, p._3)))
          1.0 - shared.toDouble / ps.length
        }
        us.sum / us.size
      }
    Map(
      "n_clusters" -> k,
      "min_share" -> (if (shares.isEmpty) 0.0 else shares.min),
      "max_share" -> (if (shares.isEmpty) 0.0 else shares.max),
      "silhouette" -> sil,
      "n_significant" -> deliverRows.length.toDouble,
      "avg_significant_per_cluster" ->
        (if (sigPerCluster.isEmpty) 0.0 else sigPerCluster.values.sum / k),
      "uniqueness" -> uniq)
  }

  /** Run the battery over one cleaned survey frame. */
  def run(spark: SparkSession, raw: DataFrame, config: Config): Map[String, Result] = {
    val cleaned = Cleaning.cleanResponses(raw).cache()
    val variables = Cleaning.inferenceVariables(cleaned, "cluster")
      .filterNot(config.clusterCols.contains) // don't test the inputs on themselves

    def infer(labeled: DataFrame): DataFrame =
      ChiSquaredInference.deliverStats(spark, labeled,
        Cleaning.inferenceVariables(labeled, "cluster")
          .filter(labeled.columns.contains(_)).filterNot(_ == "features"),
        "cluster", config.weightCol, config.alpha)

    val results = scala.collection.mutable.Map[String, Result]()

    // kmeans + pca path (M1-M8)
    val (prepared, _) = FeaturePipeline.prepare(cleaned, config.clusterCols)
    val sel = KMeansSearch.search(prepared, "features", config.ks, config.seeds)
    val kmLabeled = sel.labeled
    val kmDeliver = infer(kmLabeled
      .drop("features", "__scaled").drop(config.clusterCols.map(c => s"${c}_enc"): _*))
    results += "kmeans" -> Result("kmeans", kmLabeled, kmDeliver,
      segmentMetrics(kmLabeled, kmDeliver, Some("features")) +
        ("chosen_k" -> sel.k.toDouble))

    // kmodes path (M5) over the raw categorical columns
    val (kmModel, kmodesLabeled) = KModes.fit(cleaned, config.clusterCols,
      k = config.ks.head)
    val kmodesDeliver = infer(kmodesLabeled)
    results += "kmodes" -> Result("kmodes", kmodesLabeled, kmodesDeliver,
      segmentMetrics(kmodesLabeled, kmodesDeliver, None) +
        ("cost" -> kmModel.cost))

    // rules-based path (M11)
    config.rulesCol.foreach { rc =>
      val seg = RulesBased.segment(cleaned, rc)
      val deliver = infer(seg.labeled)
      results += "rules_based" -> Result("rules_based", seg.labeled, deliver,
        segmentMetrics(seg.labeled, deliver, None))
    }

    // lca path (M10)
    val (lcaModel, lcaLabeled) = LatentClassEM.fit(cleaned, config.clusterCols,
      config.idCol, k = config.ks.head, maxIter = 10)
    val lcaDeliver = infer(lcaLabeled)
    results += "lca" -> Result("lca", lcaLabeled, lcaDeliver,
      segmentMetrics(lcaLabeled, lcaDeliver, None) + ("bic" -> lcaModel.bic))

    results.toMap
  }
}
