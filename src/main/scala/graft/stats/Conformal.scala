package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk et al., "Algorithmic
  * Learning in a Random World" 2005; Lei et al., JASA 2018) — the
  * distribution-free way to put a FINITE-SAMPLE coverage guarantee on
  * any point predictor: with a calibration set of n residuals, the
  * interval prediction ± q̂ covers a fresh point with probability
  * ≥ 1−α when q̂ is the ⌈(n+1)(1−α)⌉-th smallest absolute residual.
  * No normality, no asymptotics — exchangeability only. The pipeline
  * use: error bars on per-group score predictors (the q_m42 grouped
  * OLS, quality regressors) that stay honest at any n, and a
  * principled "flag if outside the conformal band" anomaly gate.
  *
  * Pure integers end-to-end (NUMERIC_CONVENTION rule 1): the fitted
  * predictor here is the per-group FLOOR-mean of exact cents
  * ([[Agreement.floorDiv]] — acctbal goes negative, so truncating
  * `div` is banned), residuals are integer |x − mean|, the conformal
  * rank k = ⌈(n+1)(1−α)⌉ is a ceil-division, and q̂ is the residual
  * value at that nearest rank — an order statistic of integers. When
  * k > n (tiny groups where the guarantee needs the whole line), q̂ is
  * null: the honest "no finite bound at this α" answer, not the max.
  *
  * Scale shape (the [[Winsorize]] value-counts formulation): one
  * map-side groupBy(group) pass fits the means, one
  * groupBy(group, residual) pass builds residual counts; the rank
  * scan runs over DISTINCT residual values per group, never rows. */
object Conformal {

  /** Per-group conformal quantile over (group, integer value) rows with
    * the floor-mean predictor. `alphaPct`: miscoverage in percent
    * (10 → 90% intervals). Output: (grp, n, mean_floor, k, qhat) —
    * the interval for a fresh point in group g is
    * mean_floor ± qhat. */
  def conformalBand(rows: DataFrame, grpCol: String, valCol: String,
      alphaPct: Int = 10): DataFrame = {
    val base = rows.select(col(grpCol).as("__g"),
      col(valCol).cast("long").as("__v"))
    val means = base.groupBy("__g")
      .agg(sum("__v").as("__s"), count(lit(1)).as("n"))
      .select(col("__g"), col("n"),
        Agreement.floorDiv(col("__s"), col("n")).as("mean_floor"))
    val res = base.join(broadcast(means), Seq("__g"))
      .select(col("__g"), abs(col("__v") - col("mean_floor")).as("__r"))
      .groupBy("__g", "__r").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("__g").orderBy("__r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = res.withColumn("cum", sum("c").over(w))
    val keep = 100 - alphaPct
    cum.join(broadcast(means), Seq("__g"))
      .withColumn("k", expr(s"((n + 1) * $keep + 99) div 100"))
      .groupBy(col("__g").as("grp"), col("n"), col("mean_floor"),
        col("k"))
      .agg(min(when(col("cum") >= col("k"), col("__r"))).as("qhat"))
      .select("grp", "n", "mean_floor", "k", "qhat")
  }

  /** q_m60_conformal: 90% conformal bands on customer account balance
    * per nation around the per-nation floor-mean — the "is this
    * balance surprising for its nation" gate with a finite-sample
    * guarantee. Exact cents in, exact cents out. */
  private val mConf = Q(
    (s, d) => conformalBand(
      Tables.customer(s, d).select(col("c_nationkey"),
        Anova.cents(col("c_acctbal")).as("x")),
      "c_nationkey", "x")
      .withColumnRenamed("grp", "c_nationkey")
      .orderBy("c_nationkey"),
    Some("""WITH v AS (SELECT c_nationkey AS g,
                CAST(round(c_acctbal * 100) AS BIGINT) AS x
              FROM customer),
            m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                CAST((SUM(x) - ((SUM(x) % COUNT(*)) + COUNT(*))
                        % COUNT(*)) // COUNT(*) AS BIGINT) AS mean_floor
              FROM v GROUP BY g),
            r AS (SELECT v.g, abs(v.x - m.mean_floor) AS r
              FROM v JOIN m USING (g)),
            cnt AS (SELECT g, r, CAST(COUNT(*) AS BIGINT) AS c
              FROM r GROUP BY 1, 2),
            cum AS (SELECT g, r, c,
                CAST(SUM(c) OVER (PARTITION BY g ORDER BY r
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
              FROM cnt)
            SELECT m.g AS c_nationkey, m.n, m.mean_floor,
              ((m.n + 1) * 90 + 99) // 100 AS k,
              MIN(CASE WHEN cum.cum >= ((m.n + 1) * 90 + 99) // 100
                  THEN cum.r END) AS qhat
            FROM m JOIN cum ON cum.g = m.g
            GROUP BY 1, 2, 3, 4
            ORDER BY c_nationkey"""))

  val queries: Map[String, Q] = Map("q_m60_conformal" -> mConf)
}
