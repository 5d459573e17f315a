package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EWMA control chart per series (Roberts, Technometrics 1959) — the
  * small-persistent-shift monitor between the drift family's two
  * extremes: CUSUM (q_e_cusum) localizes a single level change in
  * hindsight, Shewhart-style gates react only to large single-point
  * spikes; the exponentially-weighted moving average accumulates
  * small sustained deviations with O(1) state per series, which is
  * also why it is THE streaming-friendly monitor shape.
  *
  * Exactness (rule 1, zero floats): λ = 1/4 in milli fixed point —
  *   e_0 = 1000·x_0,   e_t = (3·e_{t−1} + 1000·x_t) div 4
  * (counts are non-negative, bare div safe), with the peak
  * one-step-ahead forecast deviation |1000·x_t − e_{t−1}| and its
  * FIRST argmax day tracked through the same fold. The recursion is a
  * SEQUENTIAL integer fold — Spark replays it as `aggregate` over the
  * time-sorted per-series cell array, DuckDB as a recursive CTE, and
  * because every step floors to integers the two replays are
  * bit-identical (the Bradley–Terry recursive-oracle precedent).
  *
  * Scale shape: ONE map-side-combined (series, day) aggregation — THE
  * data pass; the fold runs over series·days CELLS (a bounded
  * monitoring grid, never event rows), collected per series. */
object Ewma {

  /** Per-series EWMA chart over (series, t, x≥0) points. Output:
    * (series, t_points, ewma_milli, peak_dev_milli, peak_t) — the
    * final smoothed level, the largest forecast deviation and its
    * first day; single-point series have no forecast → null peak. */
  def chart(points: DataFrame, serCol: String, tCol: String,
      xCol: String): DataFrame =
    points.select(col(serCol).as("series"), col(tCol).cast("long").as("t"),
      col(xCol).cast("long").as("x"))
      .groupBy("series")
      .agg(count(lit(1)).as("t_points"),
        sort_array(collect_list(struct(col("t"), col("x")))).as("__l"))
      .withColumn("r", expr(
        """aggregate(__l,
             named_struct('e', -1L, 'peak', -1L, 'pt', -1L),
             (acc, s) -> case when acc.e < 0L
               then named_struct('e', s.x * 1000L,
                 'peak', -1L, 'pt', -1L)
               else named_struct(
                 'e', (3L * acc.e + s.x * 1000L) div 4L,
                 'peak', greatest(acc.peak, abs(s.x * 1000L - acc.e)),
                 'pt', case when abs(s.x * 1000L - acc.e) > acc.peak
                   then s.t else acc.pt end)
               end)"""))
      .select(col("series"), col("t_points"),
        col("r.e").as("ewma_milli"),
        when(col("r.peak") < 0, lit(null).cast("long"))
          .otherwise(col("r.peak")).as("peak_dev_milli"),
        when(col("r.pt") < 0, lit(null).cast("long"))
          .otherwise(col("r.pt")).as("peak_t"))
      .orderBy("series")

  /** q_e_ewma: the q_e_cusum daily volume grid re-read as a control
    * chart — final smoothed level per event type plus the day the
    * one-step forecast broke hardest. */
  private val eEwma = Q(
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
              SELECT series, idx, t, x * 1000 AS e,
                CAST(NULL AS BIGINT) AS peak, CAST(NULL AS BIGINT) AS pt
              FROM cells WHERE idx = 1
              UNION ALL
              SELECT c.series, c.idx, c.t,
                (3 * w.e + c.x * 1000) // 4,
                CASE WHEN w.peak IS NULL THEN abs(c.x * 1000 - w.e)
                  ELSE greatest(w.peak, abs(c.x * 1000 - w.e)) END,
                CASE WHEN w.peak IS NULL
                    OR abs(c.x * 1000 - w.e) > w.peak
                  THEN c.t ELSE w.pt END
              FROM walk w JOIN cells c
                ON c.series = w.series AND c.idx = w.idx + 1)
            SELECT w.series, np.tp AS t_points,
              CAST(w.e AS BIGINT) AS ewma_milli,
              w.peak AS peak_dev_milli, w.pt AS peak_t
            FROM walk w JOIN np ON w.series = np.series
            WHERE w.idx = np.tp
            ORDER BY w.series"""))

  val queries: Map[String, Q] = Map("q_e_ewma" -> eEwma)
}
