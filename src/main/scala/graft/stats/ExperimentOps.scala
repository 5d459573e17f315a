package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-health operators — the checks that run AROUND a treatment
  * read-out:
  *
  * **Sample-ratio mismatch (SRM)** (Fabijan et al., KDD 2019): the
  * single most diagnostic experiment bug signal — if a 50/50 split
  * didn't produce ~50/50 units, the assignment or logging pipeline is
  * broken and every downstream metric is untrustworthy. One-dof χ²
  * against the intended ratio: for 1:1, χ² = (n_a−n_b)²/(n_a+n_b) —
  * pure integers, flagged against the 0.05 critical value 3.841459 as
  * an integer-literal compare.
  *
  * **Two-proportion power / sample size** (standard normal
  * approximation, e.g. Fleiss-Levin-Paik ch.2): n per arm =
  * (z_{α/2}+z_β)²·(p₁q₁+p₂q₂)/(p₂−p₁)² — the "how long must this run"
  * answer, seeded with the measured baseline rate and a relative MDE.
  * z constants are shared literals; the rest is one identical float
  * tree over exact integer counts, floored (rule 2).
  *
  * **mSPRT always-valid monitor** (Johari-Koomen-Pekelis-Walsh, KDD'17
  * "Peeking at A/B tests"): the sequential e-process that makes
  * CONTINUOUS monitoring legitimate — the mixture likelihood ratio
  * Λ = √(V/(V+τ²))·exp(Δ̂²τ²/(2V(V+τ²))) with V the (pooled) variance
  * of the running difference is a test martingale under H₀, so
  * p_t = min(1, 1/max_{s≤t}Λ_s) is valid at EVERY look — no peeking
  * penalty, unlike replaying q_m41's fixed-horizon z daily. Emitted
  * per day from cumulative exact counts; the same computation is the
  * streaming gate ([[graft.streaming.Streams]] twin, StreamsSpec).
  *
  * Determinism: every sufficient statistic is an exact integer; each
  * float read-out is ONE identical ÷/√/exp tree over those integers,
  * floored to micro — and Λ is additionally emitted in LOG space
  * (log_e_micro) so huge evidence never overflows the double. */
object ExperimentOps {

  /** One-row SRM check for an intended 1:1 split over unit rows
    * (armCol ∈ {a,b}). Output: (na, nb, chi2_micro, srm_flag). */
  def srmCheck(units: DataFrame, armCol: String): DataFrame =
    units.agg(
      sum(when(col(armCol) === "a", 1L).otherwise(0L)).as("na"),
      sum(when(col(armCol) === "b", 1L).otherwise(0L)).as("nb"))
      .select(col("na"), col("nb"),
        expr("""cast(((na - nb) * (na - nb) * 1000000)
                div (na + nb) as long)""").as("chi2_micro"))
      // 3.841459 = qchisq(0.95, df=1), the standard SRM alarm line
      .withColumn("srm_flag", col("chi2_micro") > 3841459L)

  /** Required n per arm to detect a relative lift `mdePctNum/100` on a
    * measured baseline (s successes / n trials) at α=0.05 two-sided,
    * power 80%. One row: (s, n, p1_micro, p2_micro, n_required). */
  def requiredN(s: Column, n: Column, mdePctNum: Int): Column = {
    val p1 = s.cast("double") / n.cast("double")
    val p2 = p1 * lit(1.0 + mdePctNum / 100.0)
    val z = lit(1.959964) + lit(0.841621) // z_{0.025} + z_{0.20}
    floor(z * z * (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)) /
      ((p2 - p1) * (p2 - p1)) + lit(1.0)).cast("long")
  }

  /** The mSPRT evidence columns from cumulative two-arm counts
    * (na, sa, nb, sb): pooled-variance normal mixture with prior
    * mass tauSq. Adds log_e_micro = floor(1e6·ln Λ) and
    * p_micro = floor(1e6·min(1, 1/Λ)) (pointwise — callers wanting the
    * running-max e-process take a cummax over log_e_micro, which is
    * exactly what the registered query and the streaming gate do). */
  def msprtColumns(df: DataFrame, tauSq: Double): DataFrame = {
    val na = col("na").cast("double")
    val nb = col("nb").cast("double")
    val pa = col("sa").cast("double") / na
    val pb = col("sb").cast("double") / nb
    val pPool = (col("sa") + col("sb")).cast("double") /
      (col("na") + col("nb")).cast("double")
    val v = pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb)
    val d = pa - pb
    val tau = lit(tauSq)
    // ln Λ = 0.5·ln(V/(V+τ²)) + Δ²τ²/(2V(V+τ²))
    val logE = lit(0.5) * log(v / (v + tau)) +
      d * d * tau / (lit(2.0) * v * (v + tau))
    df.withColumn("log_e_micro",
        when(col("na") > 0 && col("nb") > 0 && v > 0,
          floor(logE * lit(1e6)).cast("long")))
      .withColumn("p_micro",
        when(col("log_e_micro").isNull, lit(null).cast("long"))
          .when(col("log_e_micro") <= 0L, lit(1000000L))
          .otherwise(floor(exp(-col("log_e_micro").cast("double") /
            lit(1e6)) * lit(1e6)).cast("long")))
  }

  // ---- registered fixtures -------------------------------------------

  /** q_m65_srm: the parity assignment over event users — by
    * construction nearly balanced, the healthy baseline an alarm is
    * judged against. */
  private val mSrm = Q(
    (s, d) => srmCheck(
      Tables.events(s, d).select(col("user_id")).distinct()
        .select(when(col("user_id") % 2 === 0, "a").otherwise("b")
          .as("arm")),
      "arm"),
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
            c AS (SELECT
                CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS na,
                CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb
              FROM u)
            SELECT na, nb,
              ((na - nb) * (na - nb) * 1000000) // (na + nb)
                AS chi2_micro,
              ((na - nb) * (na - nb) * 1000000) // (na + nb) > 3841459
                AS srm_flag
            FROM c"""))

  /** q_m66_power: sample size to detect a +10% relative lift on the
    * measured purchase rate (purchase events / all events). */
  private val mPower = Q(
    (s, d) => Tables.events(s, d)
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("s"), count(lit(1)).as("n"))
      .select(col("s"), col("n"),
        expr("cast(s as decimal(38,0)) * 1000000 div n").cast("long")
          .as("p1_micro"),
        requiredN(col("s"), col("n"), 10).as("n_required")),
    Some("""WITH c AS (SELECT
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM events),
            f AS (SELECT s, n,
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS p1
              FROM c)
            SELECT s, n,
              CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT)
                AS p1_micro,
              CAST(FLOOR((1.959964 + 0.841621) * (1.959964 + 0.841621)
                * (p1 * (1.0 - p1)
                   + (p1 * 1.1) * (1.0 - p1 * 1.1))
                / ((p1 * 1.1 - p1) * (p1 * 1.1 - p1)) + 1.0)
                AS BIGINT) AS n_required
            FROM f"""))

  /** q_m67_msprt: the always-valid monitor replayed over the experiment
    * period day by day — cumulative per-arm trials (events) and
    * successes (purchases) by parity, the mSPRT evidence per day, and
    * the running-max e-process p. The "when could we have stopped"
    * read-out. */
  private val mMsprt = Q(
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("ts") >= to_timestamp(lit("2024-01-16 00:00:00")))
        .groupBy(datediff(to_date(col("ts")), lit("2024-01-16"))
          .cast("long").as("day"))
        .agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("ta"),
          sum(when(col("user_id") % 2 === 0 &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("xa"),
          sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L)).as("tb"),
          sum(when(col("user_id") % 2 =!= 0 &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("xb"))
      // global windows over the per-DAY frame: one row per calendar day
      // of the monitoring horizon (bounded; r16 window audit)
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily.select(col("day"),
        sum("ta").over(w).as("na"), sum("xa").over(w).as("sa"),
        sum("tb").over(w).as("nb"), sum("xb").over(w).as("sb"))
      msprtColumns(cum, tauSq = 0.0001)
        .withColumn("log_e_max_micro",
          max("log_e_micro").over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("p_valid_micro",
          when(col("log_e_max_micro").isNull, lit(null).cast("long"))
            .when(col("log_e_max_micro") <= 0L, lit(1000000L))
            .otherwise(floor(exp(-col("log_e_max_micro").cast("double") /
              lit(1e6)) * lit(1e6)).cast("long")))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT
                CAST(date_diff('day', DATE '2024-01-16', CAST(ts AS DATE))
                  AS BIGINT) AS day,
                CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ta,
                CAST(SUM(CASE WHEN user_id % 2 = 0
                  AND event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xa,
                CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tb,
                CAST(SUM(CASE WHEN user_id % 2 <> 0
                  AND event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS xb
              FROM events WHERE ts >= TIMESTAMP '2024-01-16'
              GROUP BY 1),
            cum AS (SELECT day,
                CAST(SUM(ta) OVER wd AS BIGINT) AS na,
                CAST(SUM(xa) OVER wd AS BIGINT) AS sa,
                CAST(SUM(tb) OVER wd AS BIGINT) AS nb,
                CAST(SUM(xb) OVER wd AS BIGINT) AS sb
              FROM daily
              WINDOW wd AS (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            ev AS (SELECT day, na, sa, nb, sb,
                CASE WHEN na > 0 AND nb > 0 AND
                    (CAST(sa + sb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1.0 - CAST(sa + sb AS DOUBLE)
                       / CAST(na + nb AS DOUBLE))
                    * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))
                    > 0
                  THEN CAST(FLOOR((
                    0.5 * ln(
                      ((CAST(sa + sb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                       * (1.0 - CAST(sa + sb AS DOUBLE)
                          / CAST(na + nb AS DOUBLE))
                       * (1.0 / CAST(na AS DOUBLE)
                          + 1.0 / CAST(nb AS DOUBLE)))
                      / (((CAST(sa + sb AS DOUBLE)
                           / CAST(na + nb AS DOUBLE))
                          * (1.0 - CAST(sa + sb AS DOUBLE)
                             / CAST(na + nb AS DOUBLE))
                          * (1.0 / CAST(na AS DOUBLE)
                             + 1.0 / CAST(nb AS DOUBLE))) + 0.0001))
                    + (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                      * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                         - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                      * 0.0001
                      / (2.0 * ((CAST(sa + sb AS DOUBLE)
                                 / CAST(na + nb AS DOUBLE))
                                * (1.0 - CAST(sa + sb AS DOUBLE)
                                   / CAST(na + nb AS DOUBLE))
                                * (1.0 / CAST(na AS DOUBLE)
                                   + 1.0 / CAST(nb AS DOUBLE)))
                           * (((CAST(sa + sb AS DOUBLE)
                                / CAST(na + nb AS DOUBLE))
                               * (1.0 - CAST(sa + sb AS DOUBLE)
                                  / CAST(na + nb AS DOUBLE))
                               * (1.0 / CAST(na AS DOUBLE)
                                  + 1.0 / CAST(nb AS DOUBLE)))
                              + 0.0001)))
                    * 1000000.0) AS BIGINT)
                END AS log_e_micro
              FROM cum),
            ev2 AS (SELECT *,
                CASE WHEN log_e_micro IS NULL THEN NULL
                  WHEN log_e_micro <= 0 THEN 1000000
                  ELSE CAST(FLOOR(exp(-CAST(log_e_micro AS DOUBLE)
                    / 1000000.0) * 1000000.0) AS BIGINT)
                END AS p_micro,
                MAX(log_e_micro) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS log_e_max_micro
              FROM ev)
            SELECT day, na, sa, nb, sb, log_e_micro, p_micro,
              log_e_max_micro,
              CASE WHEN log_e_max_micro IS NULL THEN NULL
                WHEN log_e_max_micro <= 0 THEN 1000000
                ELSE CAST(FLOOR(exp(-CAST(log_e_max_micro AS DOUBLE)
                  / 1000000.0) * 1000000.0) AS BIGINT)
              END AS p_valid_micro
            FROM ev2 ORDER BY day"""))

  val queries: Map[String, Q] = Map(
    "q_m65_srm" -> mSrm, "q_m66_power" -> mPower,
    "q_m67_msprt" -> mMsprt)
}
