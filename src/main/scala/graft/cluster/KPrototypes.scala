package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KPrototypes — mixed numeric+categorical clustering (SURVEY.md M6;
  * reference clustering.py:328-346, 480-511). Objective per cluster c:
  * Σ numeric squared Euclidean + γ · Σ categorical Hamming.
  *
  * Shares the Lloyd skeleton with [[KModes]]: numeric centroids update by
  * mean, categorical by mode, both from single tall aggregations; γ defaults
  * to half the mean numeric variance (the kprototypes library default).
  */
object KPrototypes {

  /** `fragileRounding` is set when any rounded numeric mean landed within
    * ~1 ulp of a half-way decimal boundary (|frac(x·10^s) − 0.5| < 1e-6):
    * at that point Spark's HALF_UP-on-decimal-repr and DuckDB's
    * round-on-binary-value can disagree, flip a centroid, and cascade into
    * different assignments — callers relying on the SQL replay
    * ([[LloydOracleSql.kprototypes]]) should treat such a fit as
    * not-oracle-safe for that dataset rather than trust luck. */
  final case class KProtoModel(numCols: Seq[String], catCols: Seq[String],
      numCentroids: Array[Array[Double]], catCentroids: Array[Array[String]],
      gamma: Double, cost: Double, iterations: Int,
      fragileRounding: Boolean = false)

  private def distTo(numCols: Seq[String], catCols: Seq[String],
      nc: Array[Double], cc: Array[String], gamma: Double): Column = {
    val numD = if (numCols.isEmpty) lit(0.0)
      else numCols.zip(nc).map { case (c, m) =>
        (col(c) - lit(m)) * (col(c) - lit(m))
      }.reduce(_ + _)
    val catD = if (catCols.isEmpty) lit(0.0)
      else catCols.zip(cc).map { case (c, v) =>
        when(col(c) <=> lit(v), 0.0).otherwise(1.0)
      }.reduce(_ + _)
    numD + lit(gamma) * catD
  }

  def assign(df: DataFrame, m: KProtoModel): DataFrame = {
    val dists = array(m.numCentroids.indices.map(i =>
      distTo(m.numCols, m.catCols, m.numCentroids(i), m.catCentroids(i), m.gamma)): _*)
    df.withColumn("__d", dists)
      .withColumn("cluster",
        (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .withColumn("__mind", array_min(col("__d")))
  }

  /** `numInitOpt` seeds the numeric centroids explicitly and
    * `roundCentroids` rounds each updated numeric mean to that many decimals
    * (HALF_UP) — the seeded-deterministic-replay knobs that let a DuckDB
    * oracle unroll the fit exactly ([[LloydOracleSql.kprototypes]]): seeded
    * means are plain literals in both engines, and rounding absorbs the
    * engines' float-summation-order difference in AVG. Defaults keep the
    * original behavior (quantile-spread init, unrounded means). */
  def fit(df: DataFrame, numCols: Seq[String], catCols: Seq[String], k: Int,
      maxIter: Int = 10, gammaOpt: Option[Double] = None,
      numInitOpt: Option[Array[Array[Double]]] = None,
      roundCentroids: Option[Int] = None)
      : (KProtoModel, DataFrame) = {
    val data = df.select(
      numCols.map(c => col(c).cast("double").as(c)) ++
      catCols.map(c => col(c).cast("string").as(c)) ++
      df.columns.filterNot(c => numCols.contains(c) || catCols.contains(c)).map(col): _*)
      .cache()

    val gamma = gammaOpt.getOrElse {
      if (numCols.isEmpty) 1.0
      else {
        val vars = data.select(numCols.map(c => variance(col(c)).as(c)): _*).head()
        0.5 * numCols.indices.map(vars.getDouble).sum / numCols.size
      }
    }

    // init: categorical part via Cao on the cat columns; numeric part =
    // per-chosen-pattern means (from the numeric means of rows matching the
    // pattern; falls back to global quantile spread when a pattern is rare).
    val catInit =
      if (catCols.nonEmpty) KModes.caoInit(data, catCols, k)
      else Array.fill(k)(Array.empty[String])
    val numInit: Array[Array[Double]] =
      if (numCols.isEmpty) Array.fill(k)(Array.empty[Double])
      else if (numInitOpt.isDefined) numInitOpt.get
      else {
        val qs = (1 to k).map(i => i.toDouble / (k + 1))
        val quantiles = data.stat.approxQuantile(numCols.toArray, qs.toArray, 0.001)
        Array.tabulate(k)(i => numCols.indices.map(j => quantiles(j)(i)).toArray)
      }

    var model = KProtoModel(numCols, catCols, numInit, catInit, gamma, 0.0, 0)
    var iter = 0
    var changed = true
    var fragile = false
    while (iter < maxIter && changed) {
      val assigned = assign(data, model)
      // numeric means per cluster — one aggregation
      val numNext: Array[Array[Double]] =
        if (numCols.isEmpty) model.numCentroids
        else {
          val rows = assigned.groupBy("cluster")
            .agg(numCols.map(c => avg(col(c)).as(c)).head,
              numCols.map(c => avg(col(c)).as(c)).tail: _*)
            .collect().map(r => r.getInt(0) ->
              numCols.indices.map(i => r.getDouble(i + 1)).toArray).toMap
          val raw = Array.tabulate(k)(c => rows.getOrElse(c, model.numCentroids(c)))
          roundCentroids match {
            case Some(s) =>
              val scale = math.pow(10, s)
              raw.foreach(_.foreach { x =>
                val f = x * scale - math.floor(x * scale)
                if (math.abs(f - 0.5) < 1e-6) fragile = true
              })
              raw.map(_.map(x => java.math.BigDecimal.valueOf(x)
                .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()))
            case None => raw
          }
        }
      // categorical modes per cluster — one tall aggregation
      val catNext: Array[Array[String]] =
        if (catCols.isEmpty) model.catCentroids
        else {
          val tall = assigned
            .unpivot(Array(col("cluster")), catCols.map(col).toArray, "var", "value")
            .groupBy("cluster", "var", "value").agg(count(lit(1)).as("n")).collect()
          val byCV = tall.groupBy(r => (r.getInt(0), r.getString(1)))
          Array.tabulate(k) { c =>
            catCols.zipWithIndex.map { case (v, j) =>
              byCV.get((c, v)).map(_.maxBy(r => (r.getLong(3), r.getString(2)))(
                Ordering.Tuple2(Ordering.Long, Ordering.String.reverse)).getString(2))
                .getOrElse(model.catCentroids(c)(j))
            }.toArray
          }
        }
      changed = !(numNext.zip(model.numCentroids).forall { case (a, b) =>
        a.zip(b).forall(t => math.abs(t._1 - t._2) < 1e-9) } &&
        catNext.zip(model.catCentroids).forall { case (a, b) => a.sameElements(b) })
      model = model.copy(numCentroids = numNext, catCentroids = catNext)
      iter += 1
    }
    val finalAssigned = assign(data, model)
    val cost = finalAssigned.agg(sum("__mind")).head().getDouble(0)
    (model.copy(cost = cost, iterations = iter, fragileRounding = fragile),
      finalAssigned.drop("__d", "__mind"))
  }
}
