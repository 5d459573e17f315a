package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar resampling + forward fill — the pandas
  * `resample('D').last().ffill()` idiom (the reference pipeline's
  * time-indexed frames assume it) as a distributed plan. Turns an
  * irregular event stream into a dense per-key daily grid where missing
  * days carry the last observed value forward.
  *
  * Scale shape: everything is keyed by the entity — the per-day
  * collapse, the span, the grid join and the fill window all
  * hash-partition on (or by prefix of) the key, so no stage ever sees a
  * time-axis-global shuffle, and the dense grid is generated
  * DISTRIBUTED (per-key `sequence` + `explode`, map-side after the span
  * agg) rather than built on the driver and joined in. State per key is
  * its day span — bounded by calendar time, not event volume. The fill
  * itself is one `last(ignoreNulls)` running window per key — a single
  * sort within already-key-partitioned data.
  *
  * Cross-engine determinism: the per-day collapse picks the LATEST
  * event (`max_by` ts; event timestamps are unique in the fixture, and
  * a real feed would tie-break on event_id), and filled values are
  * carried VERBATIM — no float arithmetic anywhere, so doubles hash
  * bit-identically. */
object GapFill {

  /** Daily last-observation grid with forward fill. Output: one row per
    * key per calendar day in the key's observed span; `gap = 1` marks
    * days with no observation (value carried from the last observed
    * day). */
  def dailyForwardFill(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max_by(col(valCol), col(tsCol)).as("__v"))
    val span = daily.groupBy(keyCol)
      .agg(min("day").as("__d0"), max("day").as("__d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"),
        expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("__v"), ignoreNulls = true).over(
          Window.partitionBy(keyCol).orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value_ffill"),
        when(col("__v").isNull, lit(1L)).otherwise(lit(0L)).as("gap"))
  }

  private val eGapfill = Q(
    (s, d) => dailyForwardFill(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", "ts", "value")
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("value_ffill"), col("gap"))
      .orderBy("user_id", "day"),
    Some("""WITH e AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                     ts, value
              FROM events WHERE event_type = 'purchase'),
            daily AS (SELECT user_id, day, arg_max(value, ts) AS v
              FROM e GROUP BY 1, 2),
            span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
              FROM daily GROUP BY 1),
            grid AS (SELECT user_id,
                CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                  AS DATE) AS day
              FROM span),
            j AS (SELECT g.user_id, g.day, daily.v
              FROM grid g LEFT JOIN daily
                ON daily.user_id = g.user_id AND daily.day = g.day)
            SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
                   LAST_VALUE(v IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS value_ffill,
                   CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT)
                     AS gap
            FROM j ORDER BY user_id, day"""))

  val queries: Map[String, Q] = Map("q_e_gapfill" -> eGapfill)
}
