package graft.pipeline

import graft.{Q, Tables}
import graft.cluster.RulesBased
import graft.etl.Cleaning
import graft.inference.ChiSquaredInference
import graft.stats.StatsQueries
import org.apache.spark.sql.functions._

/** Survey-pipeline capstone: the reference's §3.2/§3.3 lifecycle — clean →
  * rules-based segmentation → crosstab → χ² + Bonferroni post-hoc →
  * deliver stats — as ONE registered dataflow, mirroring the
  * `tech_ww_techcomfort_rb_ord` debug path (chisquared_tester.py:1796-1802:
  * a rules-based ordinal "tech comfort" segmentation pushed straight
  * through the inference kernel).
  *
  * The raw frame is an orders-derived survey with every cleaning
  * convention live: an upper-case `_time` column (dropped), a `_numeric`
  * suffix (stripped), mixed-case headers (lowercased), planted nulls
  * (→ 'not selected', which the post-hoc then scrubs from significant
  * lists AFTER testing), and an `_id` column (excluded from inference).
  * Segmentation is the rules-based dense-rank encode (M11) on the
  * 3-level tech-comfort column; the χ² pass then tests every inference
  * variable — including the segmenting column itself, whose perfect
  * dependence is the debug path's sanity signal — against the segments.
  *
  * The oracle replays cleaning (the sentinel fill inlined as CASE),
  * dense-rank segmentation, and the entire deliver chain
  * ([[StatsQueries.deliverChainSql]]: Pearson stat, even-dof closed-form
  * p, Yates metadata, Bonferroni-thresholded adjusted residuals,
  * significant-category scrubbing, modal category, in-cluster
  * percentages) in one DuckDB WITH chain. */
object SurveyCuration {

  private val pSurvey = Q(
    (s, d) => {
      val raw = Tables.orders(s, d).select(
        col("o_orderkey").as("RESPONDENT_ID"),
        col("o_orderkey").cast("double").as("Session_time"),
        col("o_orderstatus").as("TechComfort_rb_ord"),
        col("o_orderpriority").as("Priority_Numeric"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null).cast("string"))
          .otherwise(when(col("o_totalprice") <= 100000, "low")
            .otherwise("high")).as("Spend_Band"),
        when(col("o_orderstatus") === "F", "legacy")
          .otherwise(when(col("o_totalprice") <= 150000, "value")
            .otherwise("premium")).as("Adoption"))
      val cleaned = Cleaning.cleanResponses(raw)
      val labeled = RulesBased.segment(cleaned, "techcomfort_rb_ord").labeled
      val vars = Cleaning.inferenceVariables(labeled, "cluster")
      StatsQueries.deliverChecked(
        ChiSquaredInference.deliverStats(s, labeled, vars, "cluster"))
    },
    Some("""WITH resp AS (SELECT o_orderkey AS id,
              o_orderstatus AS tech,
              o_orderpriority AS priority,
              CASE WHEN o_orderkey % 7 = 0 THEN 'not selected'
                   WHEN o_totalprice <= 100000 THEN 'low'
                   ELSE 'high' END AS spend_band,
              CASE WHEN o_orderstatus = 'F' THEN 'legacy'
                   WHEN o_totalprice <= 150000 THEN 'value'
                   ELSE 'premium' END AS adoption
            FROM orders),
          cl AS (SELECT *,
              CAST(dense_rank() OVER (ORDER BY tech) - 1 AS VARCHAR) AS cluster
            FROM resp),
          tall AS (
            SELECT 'techcomfort_rb_ord' AS variable, tech AS category, cluster FROM cl
            UNION ALL SELECT 'priority', priority, cluster FROM cl
            UNION ALL SELECT 'spend_band', spend_band, cluster FROM cl
            UNION ALL SELECT 'adoption', adoption, cluster FROM cl),
          """ + StatsQueries.deliverChainSql(weighted = false) + """
          SELECT * FROM deliver ORDER BY p_value, cluster, variable"""))

  val queries: Map[String, Q] = Map(
    "q_pipeline_survey" -> pSurvey)
}
