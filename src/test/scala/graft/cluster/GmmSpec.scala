package graft.cluster

import graft.SparkSpecBase
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Variational DP-BGMM semantics (reference clustering.py:906-984, sklearn
  * BayesianGaussianMixture defaults): the Dirichlet-process
  * weight-concentration prior's component shrinkage, effective-component
  * parameter counting, the <1% cluster rejection, and weighted rank-sum
  * selection. */
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

  test("seeded init: deterministic one-hot column replaces KMeans, exact iters") {
    // the oracle-replay parameterization (BgmmOracleSql): init from a
    // caller column, tol = 0 runs exactly maxIter variational iterations
    val withInit = blobs.withColumn("init", pmod($"id", lit(3)).cast("int"))
    val (m1, l1) = BayesianGmm.fit(withInit, "features", k = 3, seed = 0L,
      maxIter = 2, tol = 0.0, initCol = Some("init"))
    val (m2, l2) = BayesianGmm.fit(withInit, "features", k = 3, seed = 99L,
      maxIter = 2, tol = 0.0, initCol = Some("init"))
    // seed is unused on the seeded path: same model up to treeAggregate
    // combine-order float noise (~1e-13, absorbed by the query's 4 dp)
    assert(m1.iterations === 2 && !m1.converged)
    m1.weights.zip(m2.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"weights diverge: $a vs $b") }
    assert(l1.select("id", "cluster").except(
      l2.select("id", "cluster")).count() === 0)
    // a round-robin init mixes both blobs into every component, and two
    // truncated iterations only PARTLY unmix them — assert real progress
    // at 2 iters and full recovery when the loop is allowed to run
    def purity(l: org.apache.spark.sql.DataFrame): Long =
      l.withColumn("seg", ($"id" / 60).cast("int"))
        .groupBy("seg", "cluster").count()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("seg")
            .orderBy(col("count").desc)))
        .filter($"rn" === 1).agg(sum("count")).head().getLong(0)
    assert(purity(l1) >= 80, s"seeded-BGMM 2-iter purity ${purity(l1)}/120")
    // NOTE deliberately no converged-recovery assertion: the round-robin
    // init is SYMMETRIC (each component starts as a copy of the corpus),
    // and under the DP prior's ordering bias the symmetric fixed point
    // legitimately collapses onto the first component as iterations grow.
    // The seeded path exists for bit-replayable oracle unrolls, not fit
    // quality — the KMeans-init path above covers recovery.
  }

  test("DP prior shrinks an over-specified truncation level") {
    // 3 well-separated planted blobs, truncation k = 8: the
    // weight-concentration update must starve the 5 unsupported
    // components — expected weights collapse and predicted labels use
    // only ~3 components (sklearn's signature DP behavior, absent from
    // the round-4 plain-EM approximation).
    val rng = new scala.util.Random(7)
    val blobs3 = (0 until 300).map { i =>
      val seg = i % 3
      (i.toLong, Array(
        Seq(-12.0, 0.0, 12.0)(seg) + rng.nextGaussian() * 0.8,
        Seq(5.0, -8.0, 9.0)(seg) + rng.nextGaussian() * 0.8))
    }.toDF("id", "arr").withColumn("features", array_to_vector($"arr"))
    val (model, labeled) = BayesianGmm.fit(blobs3, "features", k = 8, seed = 42L)
    val used = labeled.select("cluster").distinct().count()
    assert(used <= 4, s"DP shrinkage: expected <=4 used components, got $used")
    // weight mass concentrates on the supported components
    val top3 = model.weights.sorted.reverse.take(3).sum
    assert(top3 > 0.9, s"top-3 weight mass $top3 should exceed 0.9")
    // soft counts of pruned components are near zero
    val pruned = model.nk.sorted.take(model.k - 3)
    assert(pruned.forall(_ < 300 * 0.02),
      s"pruned components keep soft mass: ${pruned.mkString(",")}")
    // determinism: same seed, same labeling
    val (_, labeled2) = BayesianGmm.fit(blobs3, "features", k = 8, seed = 42L)
    assert(labeled.select("id", "cluster").except(
      labeled2.select("id", "cluster")).count() === 0)
  }
}
