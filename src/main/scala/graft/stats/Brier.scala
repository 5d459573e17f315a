package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Brier score with the Murphy decomposition (Brier, Monthly Weather
  * Review 1950; Murphy, J. Appl. Meteorology 1973) — the probability-
  * forecast audit the calibration TABLE (q_t_calibration) draws but
  * does not summarize: over discrete forecast values p_k,
  *   Brier = REL − RES + UNC
  * splits the mean squared forecast error into calibration error
  * (REL: forecasts off their realized rates — fixable by remapping),
  * resolution (RES: how much the forecasts separate outcomes — the
  * part a better model earns) and outcome entropy (UNC: the floor no
  * forecaster can beat). A gate whose REL dominates needs recalibration
  * (q_m61's isotonic PAV); one whose RES ≈ 0 is uninformative however
  * calibrated.
  *
  * Exactness: forecasts enter as integer MILLI values, so Brier's
  * numerator Σ(p − 1000y)² and UNC = pos·(n−pos)/n² are exact integer
  * divisions; REL and RES reduce over FORECAST-VALUE cells with
  * exact-integer cell statistics through identical float trees,
  * sequentially folded in forecast order and floored micro (the
  * [[MutualInfo]] convention — cells are few, terms exact-integer-fed).
  * The spec pins the Murphy identity to ≤ 2 micro of fold error.
  *
  * Scale shape: ONE map-side (forecast-value) cells pass over the
  * scored frame; totals attach as a broadcast 1-row frame; folds run
  * over ≤ |distinct forecasts| cells. */
object Brier {

  /** Decomposition over (pMilliCol: integer forecast in 0..1000,
    * yCol: boolean outcome) rows. Output one row:
    * (n, k_bins, brier_micro, rel_micro, res_micro, unc_micro). */
  def decompose(rows: DataFrame, pMilliCol: String, yCol: String)
      : DataFrame = {
    val cells = rows.select(col(pMilliCol).cast("long").as("p"),
        when(col(yCol), 1L).otherwise(0L).as("y"))
      .groupBy("p")
      .agg(count(lit(1)).as("nk"), sum("y").as("posk"),
        sum(expr("(p - 1000 * y) * (p - 1000 * y)")).as("sq"))
    val tot = cells.agg(sum("nk").as("n"), sum("posk").as("pos"),
      sum("sq").as("sqall"))
    cells.join(broadcast(tot))
      // REL term: n_k(p_k/1000 − pos_k/n_k)²; RES term:
      // n_k(pos_k/n_k − pos/n)² — exact-integer-fed identical trees
      .withColumn("relterm", expr(
        """cast((p * nk - 1000L * posk) as double)
           * (p * nk - 1000L * posk) / (1e6 * nk)"""))
      .withColumn("resterm", expr(
        """cast((posk * n - pos * nk) as double)
           * (posk * n - pos * nk) / (cast(n as double) * n * nk)"""))
      .groupBy("n", "pos", "sqall")
      .agg(count(lit(1)).as("k_bins"),
        collect_list(struct(col("p"), col("relterm").as("rl"),
          col("resterm").as("rs"))).as("__l"))
      .select(col("n"), col("k_bins"),
        expr("sqall div n").as("brier_micro"),
        floor(aggregate(
          transform(array_sort(col("__l")), s => s.getField("rl")),
          lit(0.0), (acc, x) => acc + x) / col("n") * lit(1e6))
          .cast("long").as("rel_micro"),
        floor(aggregate(
          transform(array_sort(col("__l")), s => s.getField("rs")),
          lit(0.0), (acc, x) => acc + x) / col("n") * lit(1e6))
          .cast("long").as("res_micro"),
        expr("(pos * (n - pos) * 1000000L) div (n * n)").as("unc_micro"))
  }

  /** q_m81_brier: a deterministic click-propensity forecast
    * (min(clicks,10)/10 per user) scored against realized purchase —
    * the summary over the same shape q_t_calibration tables. */
  private val mBrier = Q(
    (s, d) => decompose(
      Tables.events(s, d).groupBy("user_id")
        .agg(least(sum(when(col("event_type") === "click", 1L)
            .otherwise(0L)), lit(10L)).as("clicks"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            > 0).as("bought"))
        .select((col("clicks") * 100L).as("p_milli"), col("bought")),
      "p_milli", "bought"),
    Some("""WITH u AS (SELECT user_id,
                least(SUM(CASE WHEN event_type = 'click' THEN 1
                  ELSE 0 END), 10) * 100 AS p,
                CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) > 0 THEN 1 ELSE 0 END AS y
              FROM events GROUP BY 1),
            cells AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS nk,
                CAST(SUM(y) AS BIGINT) AS posk,
                CAST(SUM((p - 1000 * y) * (p - 1000 * y)) AS BIGINT) AS sq
              FROM u GROUP BY 1),
            tot AS (SELECT SUM(nk) AS n, SUM(posk) AS pos,
                SUM(sq) AS sqall FROM cells),
            terms AS (SELECT p, nk, posk, n, pos, sqall,
                CAST((p * nk - 1000 * posk) AS DOUBLE)
                  * (p * nk - 1000 * posk) / (1e6 * nk) AS rl,
                CAST((posk * n - pos * nk) AS DOUBLE)
                  * (posk * n - pos * nk)
                  / (CAST(n AS DOUBLE) * n * nk) AS rs
              FROM cells, tot)
            SELECT CAST(n AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS k_bins,
              CAST(ANY_VALUE(sqall) // n AS BIGINT) AS brier_micro,
              CAST(floor(list_reduce(list(rl ORDER BY p),
                (acc, x) -> acc + x) / n * 1e6) AS BIGINT) AS rel_micro,
              CAST(floor(list_reduce(list(rs ORDER BY p),
                (acc, x) -> acc + x) / n * 1e6) AS BIGINT) AS res_micro,
              CAST((ANY_VALUE(pos) * (n - ANY_VALUE(pos)) * 1000000)
                // (n * n) AS BIGINT) AS unc_micro
            FROM terms GROUP BY n"""))

  val queries: Map[String, Q] = Map("q_m81_brier" -> mBrier)
}
