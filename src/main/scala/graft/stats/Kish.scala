package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kish effective sample size (Kish, "Survey Sampling", 1965) — THE
  * weighted-survey diagnostic next to the weighted aggregates (A3) and
  * weighted delivery (q_inf_deliver_weighted): a survey of n weighted
  * respondents carries the statistical information of only
  * ESS = (Σw)²/Σw² unweighted ones, and the design effect
  * deff = n·Σw²/(Σw)² = n/ESS is the variance-inflation factor every
  * margin-of-error on a weighted read-out must carry. The same formula
  * prices importance-weighted training mixtures: a corpus up-weighted
  * 10× on one slice has far fewer EFFECTIVE tokens than its row count
  * (the q_p15/q_p16 weighted samplers' information cost).
  *
  * Pure integers end-to-end (rule 1): weights are 2-dp fixed-point
  * lifted to exact cents (rule 4), Σw and Σw² accumulate in
  * decimal(38,0)/HUGEINT (rule 6), and ESS/deff are single integral
  * divisions of those exact sums — zero floats anywhere.
  *
  * Scale shape: ONE map-side-combined groupBy(group) pass; the
  * division runs on |groups| rows. */
object Kish {

  /** Per-group ESS and design effect over positive integer weights.
    * Output: (group, n, sum_w, ess_milli, deff_micro). */
  def effectiveSampleSize(rows: DataFrame, grpCol: String, wCol: String)
      : DataFrame = {
    val w = col(wCol).cast("decimal(38,0)")
    rows.groupBy(col(grpCol).as("group"))
      .agg(count(lit(1)).as("n"), sum(w).as("sw"),
        sum(w * w).as("sww"))
      .select(col("group"), col("n"),
        col("sw").cast("long").as("sum_w"),
        expr("cast((sw * sw * 1000) div sww as long)").as("ess_milli"),
        expr("""cast((cast(n as decimal(38,0)) * sww * 1000000)
                div (sw * sw) as long)""").as("deff_micro"))
  }

  /** q_m50_kish: customers' account balances as survey weights, ESS per
    * nation — the "how many customers is this weighted panel really
    * worth" read-out. Non-positive balances are excluded (weights must
    * be positive; TPC-H acctbal can be negative). */
  private val mKish = Q(
    (s, d) => effectiveSampleSize(
      Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_nationkey"), Anova.cents(col("c_acctbal")).as("w")),
      "c_nationkey", "w")
      .withColumnRenamed("group", "c_nationkey")
      .orderBy("c_nationkey"),
    Some("""WITH w AS (SELECT c_nationkey,
                CAST(round(c_acctbal * 100) AS BIGINT) AS w
              FROM customer WHERE c_acctbal > 0),
            agg AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(w) AS HUGEINT) AS sw,
                SUM(CAST(w AS HUGEINT) * w) AS sww
              FROM w GROUP BY 1)
            SELECT c_nationkey, n, CAST(sw AS BIGINT) AS sum_w,
              CAST((sw * sw * 1000) // sww AS BIGINT) AS ess_milli,
              CAST((CAST(n AS HUGEINT) * sww * 1000000) // (sw * sw)
                AS BIGINT) AS deff_micro
            FROM agg ORDER BY c_nationkey"""))

  val queries: Map[String, Q] = Map("q_m50_kish" -> mKish)
}
