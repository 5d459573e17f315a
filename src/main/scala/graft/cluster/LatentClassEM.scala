package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Latent Class Analysis — multinomial mixture fitted by EM (SURVEY.md M10;
  * the reference embeds R poLCA, lca.R:13-52, with k ∈ [3,8) selected by
  * min BIC). Replaces the R runtime with a Spark-native EM:
  *
  *  - data lives as a cached tall (id, var, value) frame;
  *  - E-step: join tall with the broadcast θ table, sum log-probs per
  *    (id, class), log-sum-exp softmax → responsibilities;
  *  - M-step: responsibilities joined back to tall, one weighted count
  *    aggregation → new θ (Laplace-smoothed);
  *  - all parameter tables are k × Σ|levels| rows — broadcast-size at any
  *    data scale; each iteration is two shuffles of the tall frame.
  *
  * Deterministic: θ initialized from a murmur3 hash of (var, value, class,
  * seed) — no RNG state, reproducible across runs and partitionings.
  */
object LatentClassEM {

  final case class LcaModel(k: Int, priors: Array[Double],
      theta: Map[(String, String, Int), Double], logLik: Double, bic: Double,
      nParams: Int, n: Long)

  private def initTheta(vars: Seq[(String, Seq[String])], k: Int, seed: Int)
      : Map[(String, String, Int), Double] =
    vars.flatMap { case (v, levels) =>
      (0 until k).flatMap { c =>
        val raw = levels.map { l =>
          val h = scala.util.hashing.MurmurHash3.productHash((v, l, c, seed))
          1.0 + (math.abs(h) % 1000) / 1000.0 // in [1, 2)
        }
        val z = raw.sum
        levels.zip(raw).map { case (l, r) => (v, l, c) -> r / z }
      }
    }.toMap

  /** Fit one k. `idCol` must uniquely key rows (e.g. alchemer_id). */
  def fit(df: DataFrame, cols: Seq[String], idCol: String, k: Int,
      maxIter: Int = 20, seed: Int = 42, smoothing: Double = 0.01)
      : (LcaModel, DataFrame) = {
    val (m, l, _) = fitReleasable(df, cols, idCol, k, maxIter, seed, smoothing)
    (m, l)
  }

  /** [[fit]] plus a release handle that unpersists the responsibility cache
    * backing the returned labeled frame — call it once the labeling has been
    * consumed (or discarded, as [[selectK]] does for non-winning k). */
  def fitReleasable(df: DataFrame, cols: Seq[String], idCol: String, k: Int,
      maxIter: Int = 20, seed: Int = 42, smoothing: Double = 0.01)
      : (LcaModel, DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._

    val tall = df
      .select(col(idCol).cast("long").as("id") +:
        cols.map(c => col(c).cast("string").as(c)): _*)
      .unpivot(Array(col("id")), cols.map(col).toArray, "var", "value")
      .cache()
    val n = df.count()
    val levels: Seq[(String, Seq[String])] = tall.groupBy("var", "value").count()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toSeq
      .sortBy(_._1).map(t => (t._1, t._2))

    var theta = initTheta(levels, k, seed)
    var priors = Array.fill(k)(1.0 / k)
    var logLik = Double.NegativeInfinity

    def thetaDf = spark.createDataFrame(theta.toSeq.map { case ((v, l, c), p) =>
      (v, l, c, math.log(p))
    }).toDF("var", "value", "class", "logp")

    var resp: DataFrame = null
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // E-step: per (id, class) joint log-prob, then normalized responsibility.
      val joint = tall.join(broadcast(thetaDf), Seq("var", "value"))
        .groupBy("id", "class").agg(sum("logp").as("ll"))
        .withColumn("ll", col("ll") + {
          val priorArr = array(priors.map(p => lit(math.log(p))): _*)
          element_at(priorArr, col("class") + 1)
        })
      val withMax = joint.withColumn("mx",
        max("ll").over(org.apache.spark.sql.expressions.Window.partitionBy("id")))
      val r = withMax
        .withColumn("e", exp(col("ll") - col("mx")))
        .withColumn("z", sum("e").over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")))
        .withColumn("r", col("e") / col("z"))
        .select("id", "class", "r", "mx", "z").cache()

      val ll = r.filter(col("class") === 0)
        .agg(sum(col("mx") + log(col("z")))).head().getDouble(0)

      // M-step: priors and θ from responsibility-weighted counts.
      priors = r.groupBy("class").agg(sum("r").as("s")).collect()
        .sortBy(_.getInt(0)).map(_.getDouble(1) / n)
      val counts = tall.join(r.select("id", "class", "r"), Seq("id"))
        .groupBy("var", "value", "class").agg(sum("r").as("w"))
        .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2)) -> x.getDouble(3))
        .toMap
      val levelCount = levels.toMap
      theta = levels.flatMap { case (v, ls) =>
        (0 until k).flatMap { c =>
          val tot = ls.map(l => counts.getOrElse((v, l, c), 0.0)).sum
          ls.map { l =>
            (v, l, c) -> (counts.getOrElse((v, l, c), 0.0) + smoothing) /
              (tot + smoothing * ls.size)
          }
        }
      }.toMap
      converged = math.abs(ll - logLik) < 1e-6 * math.max(1.0, math.abs(ll))
      logLik = ll
      if (resp != null) resp.unpersist()
      resp = r
      iter += 1
    }

    val nParams = (k - 1) + k * levels.map(_._2.size - 1).sum
    val bic = -2.0 * logLik + nParams * math.log(n.toDouble)
    // the tall frame only feeds the EM loop — release it before returning;
    // the final responsibilities stay cached (the labeled frame reads them)
    // until the caller invokes the release handle
    tall.unpersist(blocking = false)
    val labeled = resp
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("r").desc, col("class"))))
      .filter(col("rn") === 1)
      .select(col("id").as(idCol), col("class").as("cluster"))
    val respHandle = resp
    (LcaModel(k, priors, theta, logLik, bic, nParams, n),
      df.withColumn(idCol, col(idCol).cast("long")).join(labeled, idCol),
      () => respHandle.unpersist(blocking = false))
  }

  /** k-selection by min BIC over a range (lca.R:41-52 semantics). The
    * per-k EM runs are independent — concurrent Spark jobs (graft.Par),
    * matching the R side's doParallel fork over k (lca.R:10-16). */
  def selectK(df: DataFrame, cols: Seq[String], idCol: String,
      ks: Range = 3 until 8, maxIter: Int = 20): (LcaModel, DataFrame) = {
    val fits = graft.Par.grid(ks.toSeq)(k => fitReleasable(df, cols, idCol, k, maxIter))
    val best = fits.minBy(_._1.bic)
    fits.filter(_._1.k != best._1.k).foreach(_._3()) // drop losers' resp caches
    (best._1, best._2)
  }
}
