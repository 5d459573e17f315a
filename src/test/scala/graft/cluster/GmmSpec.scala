package graft.cluster

import graft.SparkSpecBase
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** BGMM-approximation semantics (reference clustering.py:906-984):
  * effective-component parameter counting, the <1% cluster rejection, and
  * weighted rank-sum selection. */
class GmmSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val blobs = (0 until 120).map { i =>
    val seg = i / 60
    (i.toLong, Array(seg * 10.0 + i % 8 * 0.1, seg * -6.0 + i % 5 * 0.1))
  }.toDF("id", "arr").withColumn("features", array_to_vector($"arr"))

  test("fitOne: accepted on balanced blobs, effective-component params") {
    val fit = GmmSearch.fitOne(blobs, "features", k = 2, seed = 42L)
    assert(fit.accepted)
    assert(fit.effectiveK === 2)
    assert(!fit.bic.isNaN && !fit.aic.isNaN)
    // full-covariance param count at eff=2, d=2: 1 + 4 + 6 = 11
    assert(math.abs((fit.aic - (-2 * fit.logLik)) / 2 - 11) < 1e-9)
    assert(fit.minShare >= 0.01)
  }

  test("search: rank-sum winner separates the planted blobs") {
    val fit = GmmSearch.search(blobs, "features", ks = 2 until 4,
      seeds = Seq(42L, 100L))
    val purity = fit.labeled.withColumn("seg", ($"id" / 60).cast("int"))
      .groupBy("seg", "cluster").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("seg")
          .orderBy(col("count").desc)))
      .filter($"rn" === 1).agg(sum("count")).head().getLong(0)
    assert(purity >= 110, s"GMM purity $purity/120")
    spark.catalog.clearCache()
  }
}
