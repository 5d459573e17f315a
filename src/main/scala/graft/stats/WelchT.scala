package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Welch's unequal-variance t-test + Cohen's d effect size (Welch,
  * Biometrika 1947; Cohen 1988) — the CONTINUOUS-metric A/B companion
  * to the engine's two-proportion z-test (q_m41_ab_test): revenue per
  * user, latency, tokens per document. Welch's form is the default
  * recommendation over Student's t because it does not assume equal
  * arm variances and loses nothing when they are equal.
  *
  * Cross-engine determinism (the [[Anova]] convention): values enter
  * as floor-cents integers, ONE map-side-combined aggregation produces
  * the six exact sufficient statistics (n, Σv, Σv² per arm — Σ's in
  * decimal(38,0)/HUGEINT, no overflow cap), and every downstream float
  * is an IDENTICAL expression tree over those exact inputs, floored to
  * integer micro-units. Emitted:
  *   t² = (m̄₁−m̄₂)² / (v₁/n₁ + v₂/n₂)            (t2_micro)
  *   Welch–Satterthwaite df                        (df_micro)
  *   Cohen's d = (m̄₁−m̄₂)/s_pooled                 (d_micro, signed)
  * Degenerate arms (n ≤ 1 or zero variance) null the undefined stats.
  *
  * Scale shape: one aggregation collapses the corpus to a single
  * 8-number row; everything after is a 1-row select. No join, no
  * window, no second pass. */
object WelchT {

  /** The shared Welch sufficient-statistics stage: one map-side pass →
    * (n1, n2, dd, a1, a2, w1, w2, md) — exact integers through the
    * CASE-guarded identical float trees. [[welch]] and [[tost]] both
    * tail it. */
  private[stats] def suffStats(rows: DataFrame, armCol: String,
      centsCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    rows.agg(
      sum(when(col(armCol), 1L).otherwise(0L)).as("n1"),
      sum(when(!col(armCol), 1L).otherwise(0L)).as("n2"),
      sum(when(col(armCol), col(centsCol).cast(d38)).otherwise(lit(0).cast(d38))).as("s1"),
      sum(when(!col(armCol), col(centsCol).cast(d38)).otherwise(lit(0).cast(d38))).as("s2"),
      sum(when(col(armCol), col(centsCol).cast(d38) * col(centsCol))
        .otherwise(lit(0).cast(d38))).as("q1"),
      sum(when(!col(armCol), col(centsCol).cast(d38) * col(centsCol))
        .otherwise(lit(0).cast(d38))).as("q2"))
      // exact-integer numerators first (decimal(38,0)), then the one
      // identical-tree float block shared verbatim with the oracle
      .selectExpr("n1", "n2",
        s"cast(n1 as $d38) * q1 - s1 * s1 as num1",
        s"cast(n2 as $d38) * q2 - s2 * s2 as num2",
        s"s1 * cast(n2 as $d38) - s2 * cast(n1 as $d38) as dd")
      // every ratio is CASE-guarded so a degenerate arm (n ≤ 1) nulls
      // downstream instead of tripping an ANSI divide-by-zero
      .selectExpr("n1", "n2", "dd",
        """case when n1 > 1 then
             cast(num1 as double) / (cast(n1 as double) * n1 * (n1 - 1)) end
           as a1""",
        """case when n2 > 1 then
             cast(num2 as double) / (cast(n2 as double) * n2 * (n2 - 1)) end
           as a2""",
        "case when n1 > 0 then cast(num1 as double) / n1 end as w1",
        "case when n2 > 0 then cast(num2 as double) / n2 end as w2",
        """case when n1 > 0 and n2 > 0 then
             cast(dd as double) / (cast(n1 as double) * n2) end as md""")
  }

  /** Welch t² / df / Cohen's d over (armCol: boolean — true = arm 1,
    * centsCol: integer metric). Output one row:
    * (n1, n2, t2_micro, df_micro, d_micro, direction). */
  def welch(rows: DataFrame, armCol: String, centsCol: String): DataFrame = {
    suffStats(rows, armCol, centsCol)
      // nested CASEs: the outer arm-size test guarantees every divisor
      // inside the inner branch is positive (vectorized engines do not
      // short-circuit AND, so one flat conjunction could still divide
      // by zero)
      .selectExpr("n1", "n2",
        """case when n1 > 1 and n2 > 1 then
             case when a1 + a2 > 0
               then cast(floor(md * md / (a1 + a2) * 1e6) as long) end
           end as t2_micro""",
        """case when n1 > 1 and n2 > 1 then
             case when a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1) > 0
               then cast(floor((a1 + a2) * (a1 + a2)
                 / (a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1)) * 1e6) as long)
             end
           end as df_micro""",
        """case when n1 > 0 and n2 > 0 and n1 + n2 > 2 then
             case when (w1 + w2) / (n1 + n2 - 2) > 0
               then cast(floor(md / sqrt((w1 + w2) / (n1 + n2 - 2)) * 1e6)
                 as long) end
           end as d_micro""",
        """cast(case when dd > 0 then 1 when dd < 0 then -1 else 0 end
           as long) as direction""")
  }

  /** q_m74_welch_t: purchase-event value (floor-cents) split by the
    * deterministic user-id parity arms — the continuous-metric A/B
    * readout next to q_m41's rate test on the same stream. */
  private val mWelch = Q(
    (s, d) => welch(
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select((col("user_id") % 2 === 0).as("arm"),
          floor(col("value") * 100).cast("long").as("cents")),
      "arm", "cents"),
    Some("""WITH rows0 AS (SELECT user_id % 2 = 0 AS arm,
                CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            agg AS (SELECT
                CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                SUM(CASE WHEN arm THEN CAST(cents AS HUGEINT) ELSE 0 END) AS s1,
                SUM(CASE WHEN NOT arm THEN CAST(cents AS HUGEINT) ELSE 0 END) AS s2,
                SUM(CASE WHEN arm THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS q1,
                SUM(CASE WHEN NOT arm THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS q2
              FROM rows0),
            ints AS (SELECT n1, n2,
                CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS num1,
                CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS num2,
                s1 * CAST(n2 AS HUGEINT) - s2 * CAST(n1 AS HUGEINT) AS dd
              FROM agg),
            dbl AS (SELECT n1, n2, dd,
                CASE WHEN n1 > 1 THEN CAST(num1 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) END AS a1,
                CASE WHEN n2 > 1 THEN CAST(num2 AS DOUBLE)
                  / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) END AS a2,
                CASE WHEN n1 > 0 THEN CAST(num1 AS DOUBLE) / n1 END AS w1,
                CASE WHEN n2 > 0 THEN CAST(num2 AS DOUBLE) / n2 END AS w2,
                CASE WHEN n1 > 0 AND n2 > 0 THEN CAST(dd AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * n2) END AS md
              FROM ints)
            SELECT n1, n2,
              CASE WHEN n1 > 1 AND n2 > 1 THEN
                CASE WHEN a1 + a2 > 0
                  THEN CAST(floor(md * md / (a1 + a2) * 1e6) AS BIGINT) END
                END AS t2_micro,
              CASE WHEN n1 > 1 AND n2 > 1 THEN
                CASE WHEN a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1) > 0
                  THEN CAST(floor((a1 + a2) * (a1 + a2)
                    / (a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1)) * 1e6)
                    AS BIGINT) END
                END AS df_micro,
              CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 2 THEN
                CASE WHEN (w1 + w2) / (n1 + n2 - 2) > 0
                  THEN CAST(floor(md / sqrt((w1 + w2) / (n1 + n2 - 2)) * 1e6)
                    AS BIGINT) END
                END AS d_micro,
              CAST(CASE WHEN dd > 0 THEN 1 WHEN dd < 0 THEN -1 ELSE 0 END
                AS BIGINT) AS direction
            FROM dbl"""))

  /** TOST equivalence test (Schuirmann, J. Pharmacokinet. Biopharm.
    * 1987) — the A/B question q_m74 CANNOT answer: a non-significant
    * difference is not evidence of sameness. TOST inverts the burden:
    * the arms are equivalent within ±δ only when BOTH one-sided tests
    * reject — (m̄₁−m̄₂) > −δ AND < +δ, each at the one-sided level.
    * The canonical launch gate for "this cheaper pipeline variant
    * changes nothing (within δ)".
    *
    * Same sufficient statistics as [[welch]]; the two statistics
    *   t_low = (md + δ)/se,   t_up = (md − δ)/se,  se = √(a1+a2)
    * are identical trees floored to micro, and the equivalence verdict
    * compares the FLOORED integers against the one-sided z₀.₀₅
    * critical value 1.644854 (normal approximation — arms here are
    * thousands of rows; the df is emitted for callers that want the
    * exact t quantile). Degenerate arms → null. */
  def tost(rows: DataFrame, armCol: String, centsCol: String,
      deltaCents: Long): DataFrame = {
    require(deltaCents > 0, "equivalence margin must be positive")
    suffStats(rows, armCol, centsCol)
      .selectExpr("n1", "n2",
        s"""case when n1 > 1 and n2 > 1 then
             case when a1 + a2 > 0 then cast(floor(
               (md + ${deltaCents}e0) / sqrt(a1 + a2) * 1e6) as long) end
           end as t_low_micro""",
        s"""case when n1 > 1 and n2 > 1 then
             case when a1 + a2 > 0 then cast(floor(
               (md - ${deltaCents}e0) / sqrt(a1 + a2) * 1e6) as long) end
           end as t_up_micro""",
        """case when n1 > 1 and n2 > 1 then
             case when a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1) > 0
               then cast(floor((a1 + a2) * (a1 + a2)
                 / (a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1)) * 1e6) as long)
             end
           end as df_micro""")
      .selectExpr("n1", "n2", "t_low_micro", "t_up_micro", "df_micro",
        """case when t_low_micro is null or t_up_micro is null then null
           else t_low_micro > 1644854L and t_up_micro < -1644854L
           end as equivalent""")
  }

  /** q_m84_tost: are the parity arms' purchase values EQUIVALENT
    * within ±1 currency unit (100 cents)? The sameness verdict next to
    * q_m74's difference test on the identical frame. */
  private val mTost = Q(
    (s, d) => tost(
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select((col("user_id") % 2 === 0).as("arm"),
          floor(col("value") * 100).cast("long").as("cents")),
      "arm", "cents", deltaCents = 100L),
    Some("""WITH rows0 AS (SELECT user_id % 2 = 0 AS arm,
                CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            agg AS (SELECT
                CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                SUM(CASE WHEN arm THEN CAST(cents AS HUGEINT) ELSE 0 END) AS s1,
                SUM(CASE WHEN NOT arm THEN CAST(cents AS HUGEINT) ELSE 0 END) AS s2,
                SUM(CASE WHEN arm THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS q1,
                SUM(CASE WHEN NOT arm THEN CAST(cents AS HUGEINT) * cents ELSE 0 END) AS q2
              FROM rows0),
            ints AS (SELECT n1, n2,
                CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS num1,
                CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS num2,
                s1 * CAST(n2 AS HUGEINT) - s2 * CAST(n1 AS HUGEINT) AS dd
              FROM agg),
            dbl AS (SELECT n1, n2,
                CASE WHEN n1 > 1 THEN CAST(num1 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) END AS a1,
                CASE WHEN n2 > 1 THEN CAST(num2 AS DOUBLE)
                  / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) END AS a2,
                CASE WHEN n1 > 0 AND n2 > 0 THEN CAST(dd AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * n2) END AS md
              FROM ints),
            ts AS (SELECT n1, n2,
              CASE WHEN n1 > 1 AND n2 > 1 THEN
                CASE WHEN a1 + a2 > 0 THEN CAST(floor(
                  (md + 100e0) / sqrt(a1 + a2) * 1e6) AS BIGINT) END
                END AS t_low_micro,
              CASE WHEN n1 > 1 AND n2 > 1 THEN
                CASE WHEN a1 + a2 > 0 THEN CAST(floor(
                  (md - 100e0) / sqrt(a1 + a2) * 1e6) AS BIGINT) END
                END AS t_up_micro,
              CASE WHEN n1 > 1 AND n2 > 1 THEN
                CASE WHEN a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1) > 0
                  THEN CAST(floor((a1 + a2) * (a1 + a2)
                    / (a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1)) * 1e6)
                    AS BIGINT) END
                END AS df_micro
              FROM dbl)
            SELECT n1, n2, t_low_micro, t_up_micro, df_micro,
              CASE WHEN t_low_micro IS NULL OR t_up_micro IS NULL THEN NULL
                ELSE t_low_micro > 1644854 AND t_up_micro < -1644854
                END AS equivalent
            FROM ts"""))

  val queries: Map[String, Q] = Map(
    "q_m74_welch_t" -> mWelch,
    "q_m84_tost" -> mTost)
}
