package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal-naive day-of-week decomposition with Hampel-style robust
  * outliers (seasonal-naive per Hyndman & Athanasopoulos, Forecasting:
  * Principles and Practice; Hampel identifier, JASA 1974) — the
  * volume-anomaly monitor the drift family lacks: CUSUM (q_e_cusum)
  * finds LEVEL changes and EWMA (q_e_ewma) sustained shifts, but both
  * alarm every Saturday on weekly-patterned traffic. Here each
  * series' day-of-week MEDIAN is the seasonal profile, residuals are
  * deviations FROM that profile, and a day is anomalous when its
  * residual exceeds 5× the series' median absolute residual — robust
  * to the outliers being hunted, by construction.
  *
  * Exactness (rule 1, zero floats): both medians ride the doubled
  * two-middle-order-statistics form ([[graft.stats.Levene]]'s med2 =
  * lo + hi), so residuals a = |2x − med2| = 2|r| and the 5×MAD rule
  * are pure integers. Because mad2 is the DOUBLED median of the
  * already-doubled residuals (mad2 = 4·MAD while a = 2·|r|), the
  * integer comparison is 2·a > 5·mad2 ⇔ |r| > 5·MAD — both sides
  * carry the factor-4 doubling. A zero-MAD series
  * (perfectly repeating profile) flags ANY nonzero residual — the
  * degenerate Hampel rule, documented.
  *
  * Scale shape: ONE map-side (series, day) aggregation (THE data
  * pass); both median passes run cumulative windows over
  * DISTINCT-VALUE cells keyed by (series, dow) / series; the output
  * grid is series × 7 rows. */
object Seasonal {

  /** Doubled median per key group over (keys..., v) — med2 = lo + hi. */
  private def med2(df: DataFrame, keys: Seq[String], vCol: String)
      : DataFrame = {
    val cells = df.groupBy(keys.map(col) :+ col(vCol).as("__v"): _*)
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy(keys.map(col): _*).agg(sum("c").as("nn"))
    val cum = cells.withColumn("cum", sum("c").over(
        Window.partitionBy(keys.map(col): _*).orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(tot, keys)
    val lo = cum.filter(col("cum") >= expr("(nn + 1) div 2"))
      .groupBy(keys.map(col): _*).agg(min("__v").as("lo"))
    val hi = cum.filter(col("cum") >= expr("nn div 2 + 1"))
      .groupBy(keys.map(col): _*).agg(min("__v").as("hi"))
    lo.join(hi, keys).select(
      keys.map(col) :+ (col("lo") + col("hi")).as("med2"): _*)
  }

  /** Per-(series, dow) profile + outlier counts over (serCol, tCol =
    * integer day, xCol ≥ 0) points. Output: (series, dow, n_days,
    * med2, n_outliers). */
  def dowProfile(points: DataFrame, serCol: String, tCol: String,
      xCol: String): DataFrame = {
    val base = points.select(col(serCol).as("series"),
        col(tCol).cast("long").as("t"), col(xCol).cast("long").as("x"))
      .withColumn("dow", pmod(col("t"), lit(7L)))
    val prof = med2(base, Seq("series", "dow"), "x")
    val resid = base.join(prof, Seq("series", "dow"))
      .withColumn("a", abs(col("x") * 2 - col("med2")))
    val mad = med2(resid.select(col("series"), col("a")),
      Seq("series"), "a").withColumnRenamed("med2", "mad2")
    resid.join(mad, Seq("series"))
      .withColumn("out",
        (col("a") * 2 > col("mad2") * 5) ||
          (col("mad2") === 0 && col("a") > 0))
      .groupBy("series", "dow")
      .agg(count(lit(1)).as("n_days"), max("med2").as("med2"),
        sum(when(col("out"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("series", "dow")
  }

  /** q_e_seasonal: the daily event-volume grid per type, decomposed
    * into its weekly profile — the seasonality-aware companion to
    * q_e_cusum/q_e_ewma on the same cells. */
  private val eSeasonal = Q(
    (s, d) => dowProfile(
      Tables.events(s, d)
        .groupBy(col("event_type").as("series"),
          expr("datediff(to_date(ts), date'1970-01-01')").as("t"))
        .agg(count(lit(1)).as("x")),
      "series", "t", "x"),
    Some("""WITH pts AS (SELECT event_type AS series,
                date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
            base AS (SELECT series, t, x,
                ((t % 7) + 7) % 7 AS dow FROM pts),
            c1 AS (SELECT series, dow, x AS v, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2, 3),
            t1 AS (SELECT series, dow, SUM(c) AS nn FROM c1 GROUP BY 1, 2),
            u1 AS (SELECT series, dow, v,
                SUM(c) OVER (PARTITION BY series, dow ORDER BY v) AS cum
              FROM c1),
            lo1 AS (SELECT u1.series, u1.dow, MIN(v) AS lo
              FROM u1 JOIN t1 ON u1.series = t1.series AND u1.dow = t1.dow
              WHERE cum >= (nn + 1) // 2 GROUP BY 1, 2),
            hi1 AS (SELECT u1.series, u1.dow, MIN(v) AS hi
              FROM u1 JOIN t1 ON u1.series = t1.series AND u1.dow = t1.dow
              WHERE cum >= nn // 2 + 1 GROUP BY 1, 2),
            prof AS (SELECT lo1.series, lo1.dow, lo + hi AS med2
              FROM lo1 JOIN hi1
                ON lo1.series = hi1.series AND lo1.dow = hi1.dow),
            resid AS (SELECT b.series, b.dow, b.x,
                abs(b.x * 2 - p.med2) AS a, p.med2
              FROM base b JOIN prof p
                ON b.series = p.series AND b.dow = p.dow),
            c2 AS (SELECT series, a AS v, CAST(COUNT(*) AS BIGINT) AS c
              FROM resid GROUP BY 1, 2),
            t2 AS (SELECT series, SUM(c) AS nn FROM c2 GROUP BY 1),
            u2 AS (SELECT series, v,
                SUM(c) OVER (PARTITION BY series ORDER BY v) AS cum
              FROM c2),
            lo2 AS (SELECT u2.series, MIN(v) AS lo
              FROM u2 JOIN t2 ON u2.series = t2.series
              WHERE cum >= (nn + 1) // 2 GROUP BY 1),
            hi2 AS (SELECT u2.series, MIN(v) AS hi
              FROM u2 JOIN t2 ON u2.series = t2.series
              WHERE cum >= nn // 2 + 1 GROUP BY 1),
            mad AS (SELECT lo2.series, lo + hi AS mad2
              FROM lo2 JOIN hi2 ON lo2.series = hi2.series)
            SELECT r.series, r.dow, CAST(COUNT(*) AS BIGINT) AS n_days,
              CAST(MAX(r.med2) AS BIGINT) AS med2,
              CAST(SUM(CASE WHEN r.a * 2 > m.mad2 * 5
                  OR (m.mad2 = 0 AND r.a > 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
            FROM resid r JOIN mad m ON r.series = m.series
            GROUP BY 1, 2
            ORDER BY 1, 2"""))

  val queries: Map[String, Q] = Map("q_e_seasonal" -> eSeasonal)
}
