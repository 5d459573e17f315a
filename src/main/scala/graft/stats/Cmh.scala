package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cochran–Mantel–Haenszel stratified 2×2 test (Mantel & Haenszel,
  * JNCI 1959; Cochran, Biometrics 1954) — the CORRECT pooled test the
  * Simpson guard (q_m85) says to use when it fires: instead of pooling
  * the rows (where allocation×stratum mix manufactures or destroys
  * effects), CMH pools the per-stratum EVIDENCE — each stratum's
  * observed-minus-expected for the (arm A, success) cell under its own
  * margins — and its variance, giving a confounder-adjusted common-
  * direction test. With per-stratum cells (x_a, n_a, x_b, n_b),
  * n = n_a+n_b, m1 = x_a+x_b:
  *   T = Σ_k (x_a·n − n_a·m1)/n
  *   V = Σ_k n_a·n_b·m1·(n−m1) / (n²(n−1))
  *   χ² = (max(|T| − ½, 0))² / V   (continuity correction, clamped —
  *   the q_m73 convention: |T| < ½ must not INFLATE the statistic)
  *
  * Cross-engine determinism (the [[MutualInfo]] convention): every
  * per-stratum numerator is an exact integer (decimal(38,0)/HUGEINT);
  * the two reductions over strata are SEQUENTIAL FOLDS in stratum
  * order of identical-tree doubles; χ² floors to micro. Strata with
  * n ≤ 1 or an empty arm contribute exactly zero to both sums (their
  * T numerator is 0 when an arm is empty; V's (n−1) guard nulls them
  * out explicitly). V = 0 → null. Direction = sign of the exact ΣT
  * numerator fold... T itself is emitted floored micro for effect
  * readout.
  *
  * Scale shape: ONE map-side (stratum × arm) cells pass; folds run
  * over |strata| cells. */
object Cmh {

  /** CMH test over (groupCol: boolean arm, stratumCol, successCol:
    * boolean) rows. Output one row:
    * (n_strata, t_micro, v_micro, chi2_cc_micro, direction). */
  def cmh(rows: DataFrame, groupCol: String, stratumCol: String,
      successCol: String): DataFrame = {
    val cells = rows.groupBy(col(stratumCol).cast("string").as("st"))
      .agg(
        sum(when(col(groupCol), 1L).otherwise(0L)).as("na"),
        sum(when(col(groupCol) && col(successCol), 1L).otherwise(0L))
          .as("xa"),
        sum(when(!col(groupCol), 1L).otherwise(0L)).as("nb"),
        sum(when(!col(groupCol) && col(successCol), 1L).otherwise(0L))
          .as("xb"))
      .withColumn("n", col("na") + col("nb"))
      .withColumn("m1", col("xa") + col("xb"))
      // exact integer numerators; the strata terms are identical trees
      .withColumn("tterm", expr(
        """case when n > 0 then
             cast(cast(xa as decimal(38,0)) * n
               - cast(na as decimal(38,0)) * m1 as double) / n
           else 0e0 end"""))
      .withColumn("vterm", expr(
        """case when n > 1 then
             cast(cast(na as decimal(38,0)) * nb * m1 * (n - m1) as double)
               / (cast(n as double) * n * (n - 1))
           else 0e0 end"""))
    cells.agg(count(lit(1)).as("n_strata"),
        collect_list(struct(col("st"), col("tterm").as("t"),
          col("vterm").as("v"))).as("__l"))
      .withColumn("tt",
        aggregate(transform(array_sort(col("__l")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("vv",
        aggregate(transform(array_sort(col("__l")), s => s.getField("v")),
          lit(0.0), (acc, x) => acc + x))
      .select(col("n_strata"),
        floor(col("tt") * lit(1e6)).cast("long").as("t_micro"),
        floor(col("vv") * lit(1e6)).cast("long").as("v_micro"),
        when(col("vv") > 0,
          floor(greatest(abs(col("tt")) - lit(0.5), lit(0.0))
            * greatest(abs(col("tt")) - lit(0.5), lit(0.0))
            / col("vv") * lit(1e6)).cast("long")).as("chi2_cc_micro"),
        when(col("tt") > 0, 1L).when(col("tt") < 0, -1L).otherwise(0L)
          .cast("long").as("direction"))
  }

  /** q_m88_cmh: the parity-arm purchase effect POOLED CORRECTLY across
    * the 6-hour day bands — the stratified companion q_m85's flip
    * guard hands off to. */
  private val mCmh = Q(
    (s, d) => cmh(
      Tables.events(s, d).select(
        (col("user_id") % 2 === 0).as("arm"),
        expr("hour(ts) div 6").cast("long").as("band"),
        (col("event_type") === "purchase").as("won")),
      "arm", "band", "won"),
    Some("""WITH rows0 AS (SELECT user_id % 2 = 0 AS arm,
                CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS band,
                event_type = 'purchase' AS won
              FROM events),
            cells AS (SELECT CAST(band AS VARCHAR) AS st,
                CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS na,
                CAST(SUM(CASE WHEN arm AND won THEN 1 ELSE 0 END)
                  AS BIGINT) AS xa,
                CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
                  AS nb,
                CAST(SUM(CASE WHEN NOT arm AND won THEN 1 ELSE 0 END)
                  AS BIGINT) AS xb
              FROM rows0 GROUP BY 1),
            terms AS (SELECT st, na, xa, nb, xb,
                na + nb AS n, xa + xb AS m1,
                CASE WHEN na + nb > 0 THEN
                  CAST(CAST(xa AS HUGEINT) * (na + nb)
                    - CAST(na AS HUGEINT) * (xa + xb) AS DOUBLE)
                    / (na + nb)
                ELSE 0e0 END AS t,
                CASE WHEN na + nb > 1 THEN
                  CAST(CAST(na AS HUGEINT) * nb * (xa + xb)
                    * ((na + nb) - (xa + xb)) AS DOUBLE)
                    / (CAST(na + nb AS DOUBLE) * (na + nb) * (na + nb - 1))
                ELSE 0e0 END AS v
              FROM cells),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                list_reduce(list(t ORDER BY st), (acc, x) -> acc + x) AS tt,
                list_reduce(list(v ORDER BY st), (acc, x) -> acc + x) AS vv
              FROM terms)
            SELECT n_strata,
              CAST(floor(tt * 1e6) AS BIGINT) AS t_micro,
              CAST(floor(vv * 1e6) AS BIGINT) AS v_micro,
              CASE WHEN vv > 0
                THEN CAST(floor(greatest(abs(tt) - 0.5, 0.0)
                  * greatest(abs(tt) - 0.5, 0.0) / vv
                  * 1e6) AS BIGINT) END AS chi2_cc_micro,
              CAST(CASE WHEN tt > 0 THEN 1 WHEN tt < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS direction
            FROM agg"""))

  val queries: Map[String, Q] = Map("q_m88_cmh" -> mCmh)
}
