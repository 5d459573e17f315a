package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt double-exponential (level + trend) chart per series (Holt 1957,
  * reprinted IJF 2004) — the DRIFT-VELOCITY readout the EWMA chart
  * (q_e_ewma) cannot give: EWMA's single state lags any steady ramp by
  * a constant, alarming late or never; Holt carries an explicit trend
  * state, so a corpus whose daily volume is steadily accelerating
  * reports its per-day velocity directly, and the one-step forecast
  * (level + trend) stays centered on ramps.
  *
  * Exactness (rule 1, zero floats): α = β = 1/4 in milli fixed point —
  *   ℓ_t = fdiv(1000·x_t + 3·(ℓ + b), 4)
  *   b_t = fdiv((ℓ_t − ℓ) + 3·b, 4)
  * where fdiv is the sign-safe pmod FLOOR division (trend and level
  * deltas are legitimately negative — bare `div`/`//` truncation
  * semantics are not contractual; NUMERIC_CONVENTION rule on signed
  * division). Peak one-step forecast deviation |1000x − (ℓ + b)| and
  * its FIRST day ride the same fold. Spark replays the recursion as
  * `aggregate` over time-sorted cells, DuckDB as a recursive CTE
  * (NUMERIC_CONVENTION #9); single-point series have no forecast →
  * null peak.
  *
  * Scale shape: ONE map-side (series, day) aggregation; the fold runs
  * over bounded monitoring-grid cells collected per series. */
object Holt {

  /** Per-series Holt chart over (series, t, x ≥ 0) points. Output:
    * (series, t_points, level_milli, trend_milli, peak_dev_milli,
    * peak_t). */
  def chart(points: DataFrame, serCol: String, tCol: String,
      xCol: String): DataFrame =
    points.select(col(serCol).as("series"), col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"))
      .groupBy("series")
      .agg(count(lit(1)).as("t_points"),
        sort_array(collect_list(struct(col("t"), col("x")))).as("__l"))
      .withColumn("r", expr(
        """aggregate(__l,
             named_struct('l', cast(null as long), 'b', 0L,
               'peak', -1L, 'pt', -1L),
             (acc, s) -> case when acc.l is null
               then named_struct('l', s.x * 1000L, 'b', 0L,
                 'peak', -1L, 'pt', -1L)
               else named_struct(
                 'l', (s.x * 1000L + 3L * (acc.l + acc.b)
                   - pmod(s.x * 1000L + 3L * (acc.l + acc.b), 4L)) div 4L,
                 'b', (((s.x * 1000L + 3L * (acc.l + acc.b)
                     - pmod(s.x * 1000L + 3L * (acc.l + acc.b), 4L)) div 4L
                     - acc.l) + 3L * acc.b
                   - pmod(((s.x * 1000L + 3L * (acc.l + acc.b)
                     - pmod(s.x * 1000L + 3L * (acc.l + acc.b), 4L)) div 4L
                     - acc.l) + 3L * acc.b, 4L)) div 4L,
                 'peak', greatest(acc.peak,
                   abs(s.x * 1000L - (acc.l + acc.b))),
                 'pt', case when abs(s.x * 1000L - (acc.l + acc.b))
                     > acc.peak then s.t else acc.pt end)
               end)"""))
      .select(col("series"), col("t_points"),
        col("r.l").as("level_milli"), col("r.b").as("trend_milli"),
        when(col("r.peak") < 0, lit(null).cast("long"))
          .otherwise(col("r.peak")).as("peak_dev_milli"),
        when(col("r.pt") < 0, lit(null).cast("long"))
          .otherwise(col("r.pt")).as("peak_t"))
      .orderBy("series")

  /** q_e_holt: the daily event-volume grid per type under the
    * level+trend chart — per-day volume velocity next to q_e_ewma's
    * level-only smoothing on the same cells. */
  private val eHolt = Q(
    (s, d) => chart(
      Tables.events(s, d)
        .groupBy(col("event_type").as("series"),
          expr("datediff(to_date(ts), date'1970-01-01')").as("t"))
        .agg(count(lit(1)).as("x")),
      "series", "t", "x"),
    Some("""WITH RECURSIVE pts AS (SELECT event_type AS series,
                date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
            cells AS (SELECT series, t, x, row_number() OVER
                (PARTITION BY series ORDER BY t) AS idx FROM pts),
            np AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS tp
              FROM cells GROUP BY 1),
            walk AS (
              SELECT series, idx, t, x * 1000 AS l, CAST(0 AS BIGINT) AS b,
                CAST(NULL AS BIGINT) AS peak, CAST(NULL AS BIGINT) AS pt
              FROM cells WHERE idx = 1
              UNION ALL
              SELECT c.series, c.idx, c.t,
                (c.x * 1000 + 3 * (w.l + w.b)
                  - ((c.x * 1000 + 3 * (w.l + w.b)) % 4 + 4) % 4) // 4,
                ((((c.x * 1000 + 3 * (w.l + w.b)
                    - ((c.x * 1000 + 3 * (w.l + w.b)) % 4 + 4) % 4) // 4)
                    - w.l) + 3 * w.b
                  - (((((c.x * 1000 + 3 * (w.l + w.b)
                    - ((c.x * 1000 + 3 * (w.l + w.b)) % 4 + 4) % 4) // 4)
                    - w.l) + 3 * w.b) % 4 + 4) % 4) // 4,
                CASE WHEN w.peak IS NULL
                  THEN abs(c.x * 1000 - (w.l + w.b))
                  ELSE greatest(w.peak, abs(c.x * 1000 - (w.l + w.b))) END,
                CASE WHEN w.peak IS NULL
                    OR abs(c.x * 1000 - (w.l + w.b)) > w.peak
                  THEN c.t ELSE w.pt END
              FROM walk w JOIN cells c
                ON c.series = w.series AND c.idx = w.idx + 1)
            SELECT w.series, np.tp AS t_points,
              CAST(w.l AS BIGINT) AS level_milli,
              CAST(w.b AS BIGINT) AS trend_milli,
              w.peak AS peak_dev_milli, w.pt AS peak_t
            FROM walk w JOIN np ON w.series = np.series
            WHERE w.idx = np.tp
            ORDER BY w.series"""))

  val queries: Map[String, Q] = Map("q_e_holt" -> eHolt)
}
