package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped simple OLS — per-group trendlines (slope, intercept, R²)
  * from closed-form sufficient statistics: the monitoring primitive
  * behind "is this metric drifting per segment?" questions that a full
  * ML fit is overkill for, and the numeric-vs-numeric rung of the
  * dependence battery (χ² categorical×categorical, ANOVA
  * categorical×numeric, [[MutualInfo]] information-theoretic — this is
  * numeric×numeric).
  *
  * Scale shape: ONE map-side-combined aggregation computes the exact
  * integer sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) per group —
  * the entire data pass; the closed form then runs on k group rows.
  *
  * Cross-engine determinism: inputs are exact integer cents/indices so
  * the sufficient statistics are exact longs (order-free); the closed
  * form (n·Σxy − ΣxΣy over n·Σx² − Σx², etc.) is computed in doubles
  * from those exact integers with an identical expression tree in both
  * engines and FLOORED to micro-units. Zero x-variance (or y-variance
  * for R²) reports null instead of a 0-divide. Long headroom: Σxy caps
  * |x|·|y|·rows at ~9·10¹⁸ — beyond that widen the statistics to
  * decimal(38); the closed form is double either way. */
object GroupedOls {

  /** Per-group fit over (group, x, y) integer rows. Output: (grp, n,
    * slope_micro, intercept_micro, r2_micro). */
  def fit(rows: DataFrame, grpCol: String, xCol: String, yCol: String)
      : DataFrame = {
    val agg = rows.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum(col(xCol) * col(yCol)).as("sxy"),
        sum(col(xCol) * col(xCol)).as("sxx"),
        sum(col(yCol) * col(yCol)).as("syy"))
    val dn = col("n").cast("double")
    val dsx = col("sx").cast("double")
    val dsy = col("sy").cast("double")
    val cov = dn * col("sxy") - dsx * dsy
    val varx = dn * col("sxx") - dsx * dsx
    val vary = dn * col("syy") - dsy * dsy
    val slope = cov / varx
    val intercept = (dsy - slope * dsx) / dn
    agg.select(col("grp"), col("n"),
      when(varx > 0, floor(slope * lit(1e6)).cast("long"))
        .as("slope_micro"),
      when(varx > 0, floor(intercept * lit(1e6)).cast("long"))
        .as("intercept_micro"),
      when(varx > 0 && vary > 0,
        floor(cov * cov / (varx * vary) * lit(1e6)).cast("long"))
        .as("r2_micro"))
  }

  private val mOls = Q(
    (s, d) => {
      // whole currency units, not cents: Σy² in cents would overflow a
      // long at bench scale (1e14 per row × 2e5 rows/group); unit-scale
      // keeps every sufficient statistic within exact long range. A .5
      // integer boundary on 2-dp inputs is exactly representable, so
      // round-to-integer agrees across engines.
      val li = Tables.lineitem(s, d).select(
        concat(lit("price_vs_qty:"), col("l_returnflag")).as("g"),
        round(col("l_quantity")).cast("long").as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(concat(lit("value_vs_day:"), col("event_type")).as("g"),
          expr("unix_micros(ts) div 86400000000").as("x"),
          Anova.cents(col("value")).as("y"))
      fit(li.unionAll(ev), "g", "x", "y").orderBy("grp")
    },
    Some("""WITH rows0 AS (
              SELECT 'price_vs_qty:' || l_returnflag AS g,
                     CAST(round(l_quantity) AS BIGINT) AS x,
                     CAST(round(l_extendedprice) AS BIGINT) AS y
              FROM lineitem
              UNION ALL
              SELECT 'value_vs_day:' || event_type,
                     epoch_us(ts) // 86400000000,
                     CAST(round(value * 100) AS BIGINT)
              FROM events WHERE value IS NOT NULL),
            agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy
              FROM rows0 GROUP BY 1),
            f AS (SELECT g, n,
                CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
                CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS varx,
                CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vary,
                CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
                CAST(n AS DOUBLE) AS dn
              FROM agg)
            SELECT g AS grp, n,
              CASE WHEN varx > 0 THEN
                CAST(floor(cov / varx * 1000000.0) AS BIGINT)
              END AS slope_micro,
              CASE WHEN varx > 0 THEN
                CAST(floor((dsy - cov / varx * dsx) / dn * 1000000.0)
                  AS BIGINT)
              END AS intercept_micro,
              CASE WHEN varx > 0 AND vary > 0 THEN
                CAST(floor(cov * cov / (varx * vary) * 1000000.0)
                  AS BIGINT)
              END AS r2_micro
            FROM f ORDER BY grp"""))

  val queries: Map[String, Q] = Map("q_m42_grouped_ols" -> mOls)
}
