package graft.metrics

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.{ClusteringEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-level metrics (SURVEY.md M13, M16, M18/M19, M25, M26;
  * reference metrics.py). Each reduces distributed passes to small driver
  * aggregates; refits reuse MLlib estimators.
  */
object ModelMetrics {

  /** M13: silhouette via MLlib ClusteringEvaluator (squared-Euclidean;
    * documented approximation of sklearn's Euclidean default). */
  def silhouette(labeled: DataFrame, featuresCol: String,
      predictionCol: String = "cluster"): Double =
    new ClusteringEvaluator().setFeaturesCol(featuresCol)
      .setPredictionCol(predictionCol).setMetricName("silhouette")
      .evaluate(labeled)

  /** M16: random-baseline checker (metrics.py:149-174) — metric ratios of
    * the real clustering vs `nRuns` seeded random labelings of the same k. */
  def randomBaseline(labeled: DataFrame, featuresCol: String, k: Int,
      nRuns: Int = 3): Map[String, Double] = {
    val real = silhouette(labeled, featuresCol)
    val rand = (1 to nRuns).map { i =>
      val randomized = labeled.withColumn("cluster",
        pmod(hash(col(featuresCol).cast("string"), lit(i)), lit(k)).cast("int"))
      silhouette(randomized, featuresCol)
    }
    val randMean = rand.sum / rand.size
    Map("silhouette" -> real, "random_silhouette" -> randMean,
      "silhouette_ratio" -> (if (randMean == 0) 0.0 else real / randMean))
  }

  /** M18/M19: consistency check — deterministic 90/10 split by key-hash
    * (stable across runs, unlike randomSplit), refit on the 90%, ARI of the
    * refit labels vs the original on the common rows (metrics.py:234-308). */
  def modelConsistency(df: DataFrame, idCol: String, featuresCol: String,
      k: Int, seed: Long): Double = {
    val withBucket = df.withColumn("__b", pmod(hash(col(idCol)), lit(10)))
    val train = withBucket.filter(col("__b") =!= 0)
    val refit = new org.apache.spark.ml.clustering.KMeans().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster2")
      .fit(train)
    val relabeled = refit.transform(withBucket.drop("cluster2"))
    ClusterQuality.adjustedRand(relabeled, "cluster", "cluster2")
  }

  /** M19: label consistency — refit on a deterministic 90% split and score
    * ARI between refit labels and the ORIGINAL labels on the training rows
    * only (the reference's StratifiedShuffleSplit train-side comparison,
    * metrics.py:273-308; M18 scores the full frame instead). */
  def labelConsistency(df: DataFrame, idCol: String, featuresCol: String,
      k: Int, seed: Long): Double = {
    val withBucket = df.withColumn("__b", pmod(hash(col(idCol)), lit(10)))
    val train = withBucket.filter(col("__b") =!= 0)
    val refit = new org.apache.spark.ml.clustering.KMeans().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster2").fit(train)
    ClusterQuality.adjustedRand(refit.transform(train), "cluster", "cluster2")
  }

  /** M25: RandomForest signal loss — train RF to predict the cluster from
    * feature columns; report accuracy/F1/weighted precision/recall
    * (metrics.py:714-811). Under/over-sampling via `sampleBy` hooks. */
  def rfSignal(labeled: DataFrame, featuresCol: String,
      labelCol: String = "cluster", seed: Long = 42L): Map[String, Double] = {
    val data = labeled.withColumn("label", col(labelCol).cast("double"))
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), seed)
    val rf = new RandomForestClassifier().setFeaturesCol(featuresCol)
      .setLabelCol("label").setNumTrees(50).setSeed(seed).fit(train)
    val pred = rf.transform(test)
    def m(name: String) = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName(name)
      .evaluate(pred)
    Map("accuracy" -> m("accuracy"), "f1" -> m("f1"),
      "precision" -> m("weightedPrecision"), "recall" -> m("weightedRecall"))
  }

  /** Stratified under-sampling to the minority class size via sampleBy
    * (the reference's under-sampler; SMOTE is approximated by seeded
    * with-replacement over-sampling of minority classes — documented). */
  def undersample(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(labelCol).count().collect()
      .map(r => r.get(0) -> r.getLong(1))
    val minN = counts.map(_._2).min.toDouble
    val fractions = counts.map { case (k, n) => k -> math.min(1.0, minN / n) }.toMap
    df.stat.sampleBy(labelCol, fractions, seed)
  }

  def oversample(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(labelCol).count().collect()
      .map(r => r.get(0) -> r.getLong(1))
    val maxN = counts.map(_._2).max.toDouble
    counts.map { case (k, n) =>
      val part = df.filter(col(labelCol) === lit(k))
      if (n >= maxN) part
      else part.sample(withReplacement = true, maxN / n, seed)
    }.reduce(_ unionByName _)
  }

  /** M26: χ²-signal slicer (metrics.py:407-514) — iteratively keep filtering
    * rows by (variable == its current mode) while retention stays above a
    * decaying floor; returns the surviving filters and final retention. */
  def chiSqSlicer(df: DataFrame, variables: Seq[String],
      startFloor: Double = 0.25, floorDecay: Double = 0.01,
      minVars: Int = 6): (Seq[(String, String)], Double) = {
    val total = df.count().toDouble
    var current = df
    var kept = Seq.empty[(String, String)]
    var floor = startFloor
    var remaining = variables
    var continue = true
    while (continue && remaining.nonEmpty) {
      // mode of each remaining variable on the current slice — one tall agg
      val tall = current
        .select(remaining.map(c => col(c).cast("string").as(c)): _*)
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          remaining.map(col).toArray, "var", "value")
        .groupBy("var", "value").agg(count(lit(1)).as("n")).collect()
      val modes = tall.groupBy(_.getString(0)).map { case (v, rs) =>
        v -> rs.maxBy(r => (r.getLong(2), r.getString(1)))(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse)).getString(1)
      }
      // the candidate keeping the most rows (greedy, deterministic tie-break)
      val scored = remaining.map { v =>
        val mode = modes(v)
        val n = current.filter(col(v).cast("string") === mode).count()
        (v, mode, n)
      }.sortBy(t => (-t._3, t._1))
      val (v, mode, n) = scored.head
      if (n / total >= floor || kept.size < minVars) {
        current = current.filter(col(v).cast("string") === mode)
        kept :+= (v -> mode)
        remaining = remaining.filterNot(_ == v)
        floor = math.max(0.15, floor - floorDecay)
        continue = n > 0
      } else continue = false
    }
    (kept, current.count() / total)
  }

  /** M31: social presence — share of rows per cluster whose multi-choice
    * platform column mentions `platform` (metrics.py:364-404). */
  def socialPresence(df: DataFrame, clusterCol: String, mcCol: String,
      platform: String): DataFrame =
    df.groupBy(col(clusterCol).as("cluster"))
      .agg(round(avg(when(lower(col(mcCol)).contains(platform.toLowerCase), 1.0)
        .otherwise(0.0)), 6).as("presence"))

  /** M32: message reach = presence × signal per cluster (metrics.py:690-711). */
  def messageReach(presence: Map[String, Double], signal: Map[String, Double])
      : Map[String, Double] =
    presence.map { case (c, p) => c -> p * signal.getOrElse(c, 0.0) }
}
