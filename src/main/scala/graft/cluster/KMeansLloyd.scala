package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded 1-D Lloyd (KMeans) over an EXACT integer column — the
  * oracle-replayable parameterization of SURVEY.md M4+M7 (the k-grid with
  * elbow selection, clustering.py:391-478), the same
  * seeded-deterministic-replay family as [[KModes]]/[[KPrototypes]] at
  * maxIter = 2 ([[LloydOracleSql]]).
  *
  * Every quantity in the fit is exact integer arithmetic, so the DuckDB
  * replay is bit-for-bit with NO rounding tolerance anywhere (one step
  * beyond the kprototypes oracle's ROUND(AVG, 6) truce):
  *
  *  - inputs are non-negative integer units (cents / micro-units) in a
  *    LongType column;
  *  - distances are integer squares — |z − mu| ≤ ~6e7 keeps each term
  *    ≤ ~3.6e15, inside Long; per-fit total cost is summed in
  *    decimal(38,0) (DuckDB sums BIGINT into HUGEINT — both exact at any
  *    row count);
  *  - the mean update is the half-up integer division
  *    (2·Σz + n) / (2·n) — truncating Long division ≡ DuckDB's flooring
  *    `//` because all inputs are non-negative (precondition);
  *  - assignment ties take the lowest center index (array_position of the
  *    array min ≡ row_number ORDER BY dist, cid);
  *  - empty clusters keep their previous center;
  *  - the loop is `while (iter < maxIter && changed)` — at maxIter = 2 the
  *    final centers are cent2 if the first update moved anything else
  *    cent1, exactly the [[LloydOracleSql]] unroll contract.
  *
  * Scale shape: each iteration is one map + hash-aggregate job collecting k
  * rows; the assignment expression stays in whole-stage codegen (array of
  * integer squares over broadcast-literal centers — no UDF, no shuffle
  * beyond the k-row aggregate). The general seed/k MLlib grid with
  * silhouette rank-sum selection remains [[KMeansSearch]]; this object is
  * the exact-replay variant the q_m4 oracle certifies.
  */
object KMeansLloyd {

  final case class LloydFit(k: Int, centers: Seq[Long], iterations: Int,
      cost: BigInt, labeled: DataFrame)

  /** Adds `cluster` (argmin center, ties → lowest index) and `__dist` (the
    * winning squared distance) against literal centers. */
  def assign(df: DataFrame, zCol: String, centers: Seq[Long]): DataFrame = {
    val ds = array(centers.map(mu =>
      (col(zCol) - lit(mu)) * (col(zCol) - lit(mu))): _*)
    df.withColumn("__ds", ds)
      .withColumn("cluster",
        (array_position(col("__ds"), array_min(col("__ds"))) - 1).cast("int"))
      .withColumn("__dist", element_at(col("__ds"), col("cluster") + 1))
      .drop("__ds")
  }

  /** Lloyd loop from literal seed centers. `zCol` must hold non-negative
    * Longs (the integer-division mean update assumes it; 2·Σz must also fit
    * Long — ≤ ~7e7 rows per cluster at cents scale, far past survey SFs;
    * pre-aggregate or rescale above that). */
  def fit(df: DataFrame, zCol: String, init: Seq[Long], maxIter: Int = 2)
      : LloydFit = {
    var centers = init.toIndexedSeq
    var changed = true
    var iter = 0
    while (iter < maxIter && changed) {
      val stats = assign(df, zCol, centers).groupBy("cluster")
        .agg(sum(col(zCol)).as("s"), count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val next = centers.indices.map { c =>
        stats.get(c).map { case (s, n) => (2 * s + n) / (2 * n) }
          .getOrElse(centers(c))
      }
      changed = next != centers
      centers = next
      iter += 1
    }
    val labeled = assign(df, zCol, centers)
    val cost = labeled.agg(sum(col("__dist").cast("decimal(38,0)")))
      .head().getDecimal(0)
    LloydFit(centers.size, centers, iter, BigInt(cost.toBigInteger),
      labeled.drop("__dist"))
  }

  /** Elbow point with a sqrt (NOT hypot) denominator and a parenthesized
    * numerator — the exact association order the SQL replay uses
    * ([[LloydOracleSql.kmeansGrid]]); hypot rounds differently from
    * sqrt(dx² + dy²) and would desynchronize the two engines on near-ties.
    * Ties take the lowest k (maxBy keeps the first maximum in k order ≡
    * ORDER BY score DESC, k). */
  def elbowSqrt(costs: Seq[(Int, Double)]): Int = {
    require(costs.size >= 2)
    val sorted = costs.sortBy(_._1)
    val (x1, y1) = (sorted.head._1.toDouble, sorted.head._2)
    val (x2, y2) = (sorted.last._1.toDouble, sorted.last._2)
    val denom = math.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
    sorted.maxBy { case (k, c) =>
      math.abs(((y2 - y1) * k - (x2 - x1) * c) + (x2 * y1 - y2 * x1)) / denom
    }._1
  }

  /** Grid over per-k literal seed centers; selection is the elbow on the
    * exact integer costs (cast once to double on both engines). Returns the
    * chosen k and every fit (order preserved). */
  def gridSearch(df: DataFrame, zCol: String, inits: Seq[(Int, Seq[Long])],
      maxIter: Int = 2): (Int, Seq[(Int, LloydFit)]) = {
    val cached = df.cache()
    cached.count()
    val fits =
      try graft.Par.grid(inits) { case (k, init) =>
        k -> fit(cached, zCol, init, maxIter)
      }
      finally cached.unpersist(blocking = false)
    val chosen = elbowSqrt(fits.map { case (k, f) => k -> f.cost.toDouble })
    (chosen, fits)
  }
}
