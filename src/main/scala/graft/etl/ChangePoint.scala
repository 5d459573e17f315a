package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point detection per series (Page, Biometrika 1954) —
  * the "WHEN did it move" companion to the drift family's "DID it
  * move" (q_m44_psi, q_m49_bh_fdr): over a daily metric series, the
  * cumulative deviation from the series mean peaks exactly at the
  * point the level shifts, so argmax |CUSUM| is the estimated change
  * day and the peak magnitude is the shift evidence.
  *
  * Pure integers (rule 1): with S_t = Σ_{i≤t} x_i and S = Σx over T
  * points, the mean-centered cumulative sum scaled by T is
  * `C_t = T·S_t − t·S` — exact integers, no mean materialized. The
  * change point is argmax (|C_t|, then smallest t) — a total order —
  * and the normalized peak `|C|·1e6 div (T·Σ|x − x̄|·…)` is skipped in
  * favor of the raw scaled peak plus the series totals, leaving
  * thresholding to the caller (magnitude units: metric·T).
  *
  * Scale shape: ONE map-side-combined (series, day) aggregation; the
  * cumulative window and argmax run over series·days CELLS (a
  * monitoring grid, never event rows). */
object ChangePoint {

  /** Per-series CUSUM peak over (series, t, x) points. Output:
    * (series, t_points, change_t, c_peak_scaled — signed T·S_t − t·S
    * at the peak, positive = level was HIGH before the change). */
  def cusumPeak(points: DataFrame, serCol: String, tCol: String,
      xCol: String): DataFrame = {
    val w = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = points.select(col(serCol).as("series"),
      col(tCol).cast("long").as("t"), col(xCol).cast("long").as("x"))
    val tot = base.groupBy("series")
      .agg(count(lit(1)).as("tp"), sum("x").as("sx"))
    val cum = base
      .withColumn("st", sum("x").over(w))
      .withColumn("idx", row_number().over(
        Window.partitionBy("series").orderBy("t")).cast("long"))
      .join(tot, Seq("series"))
      .withColumn("c",
        col("tp").cast("decimal(38,0)") * col("st")
          - col("idx").cast("decimal(38,0)") * col("sx"))
    // argmax (|c|, smallest t) as a lexicographic struct MAX
    cum.groupBy(col("series"), col("tp").as("t_points"))
      .agg(max(struct(abs(col("c")).as("a"), (-col("t")).as("nt"),
        col("c").as("cv"))).as("m"))
      .select(col("series"), col("t_points"),
        (-col("m.nt")).as("change_t"),
        col("m.cv").cast("long").as("c_peak_scaled"))
  }

  /** q_e_cusum: daily event-count series per event type — the change
    * day of each type's volume level. */
  private val eCusum = Q(
    (s, d) => cusumPeak(
      Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000L").as("day"))
        .agg(count(lit(1)).as("x")),
      "event_type", "day", "x")
      .withColumnRenamed("series", "event_type")
      .orderBy("event_type"),
    Some("""WITH pts AS (SELECT event_type AS series,
                epoch_us(ts) // 86400000000 AS t,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
            tot AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS tp,
                CAST(SUM(x) AS BIGINT) AS sx
              FROM pts GROUP BY 1),
            cum AS (SELECT pts.series, pts.t, tot.tp, tot.sx,
                CAST(SUM(x) OVER (PARTITION BY pts.series ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS st,
                CAST(row_number() OVER (PARTITION BY pts.series ORDER BY t)
                  AS BIGINT) AS idx
              FROM pts JOIN tot ON pts.series = tot.series),
            c AS (SELECT series, tp, t,
                CAST(tp AS HUGEINT) * st - CAST(idx AS HUGEINT) * sx AS c
              FROM cum),
            pk AS (SELECT series, tp, t, c, row_number() OVER
                (PARTITION BY series ORDER BY ABS(c) DESC, t) AS rn
              FROM c)
            SELECT series AS event_type, tp AS t_points,
                   t AS change_t, CAST(c AS BIGINT) AS c_peak_scaled
            FROM pk WHERE rn = 1 ORDER BY event_type"""))

  val queries: Map[String, Q] = Map("q_e_cusum" -> eCusum)
}
