package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variance-to-mean dispersion index per series (the Fisher index of
  * dispersion; Cox & Lewis, The Statistical Analysis of Series of
  * Events, 1966) — the one-number burstiness diagnostic behind the
  * monitoring family's choices: a Poisson arrival stream has index 1,
  * so an event-type whose daily counts disperse at 5× carries burst
  * structure (q_e_burst's windows will fire; mean-based alerts will
  * whipsaw) while ~1 says the volume is memoryless and a plain rate
  * threshold suffices. Also the standard overdispersion screen before
  * fitting anything Poisson-shaped.
  *
  * Exactness (rule 1, zero floats): with n daily counts, S = Σx and
  * Q = Σx², the sample variance-to-mean ratio clears to
  *   index_micro = ((n·Q − S²) · 1e6) div ((n−1) · S)
  * — decimal(38,0)/HUGEINT products, non-negative operands (counts),
  * one integral division. S = 0 or n ≤ 1 → null. The mean is emitted
  * alongside in milli (S·1000 div n).
  *
  * Scale shape: ONE map-side (series, day) aggregation, then a
  * per-series reduce over day cells; output is |series| rows. */
object Dispersion {

  /** Per-series dispersion over (serCol, tCol, xCol ≥ 0) points.
    * Output: (series, n_points, mean_milli, dispersion_micro). */
  def index(points: DataFrame, serCol: String, tCol: String,
      xCol: String): DataFrame =
    points.select(col(serCol).as("series"), col(xCol).cast("long").as("x"))
      .groupBy("series")
      .agg(count(lit(1)).as("n_points"),
        sum(col("x").cast("decimal(38,0)")).as("s"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("q"))
      .select(col("series"), col("n_points"),
        when(col("n_points") === 0, lit(null).cast("long"))
          .otherwise(expr("cast((s * 1000) div n_points as long)"))
          .as("mean_milli"),
        when(col("n_points") <= 1 || col("s") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """cast(((cast(n_points as decimal(38,0)) * q - s * s)
                 * 1000000) div ((n_points - 1) * s) as long)"""))
          .as("dispersion_micro"))
      .orderBy("series")

  /** q_e_dispersion: is each event type's daily volume Poisson-like or
    * bursty? The diagnostic that says whether q_e_burst's machinery is
    * even needed per stream. */
  private val eDispersion = Q(
    (s, d) => index(
      Tables.events(s, d)
        .groupBy(col("event_type").as("series"),
          expr("datediff(to_date(ts), date'1970-01-01')").as("t"))
        .agg(count(lit(1)).as("x")),
      "series", "t", "x"),
    Some("""WITH pts AS (SELECT event_type AS series,
                date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
            agg AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n_points,
                CAST(SUM(x) AS HUGEINT) AS s,
                SUM(CAST(x AS HUGEINT) * x) AS q
              FROM pts GROUP BY 1)
            SELECT series, n_points,
              CASE WHEN n_points = 0 THEN NULL
                ELSE CAST((s * 1000) // n_points AS BIGINT) END AS mean_milli,
              CASE WHEN n_points <= 1 OR s = 0 THEN NULL
                ELSE CAST(((CAST(n_points AS HUGEINT) * q - s * s) * 1000000)
                  // ((n_points - 1) * s) AS BIGINT) END AS dispersion_micro
            FROM agg ORDER BY series"""))

  val queries: Map[String, Q] = Map("q_e_dispersion" -> eDispersion)
}
