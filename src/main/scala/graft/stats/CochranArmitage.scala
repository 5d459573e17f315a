package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cochran–Armitage trend test (Cochran, Biometrics 1954; Armitage,
  * Biometrics 1955) — "does a binary rate TREND across ordered doses":
  * the one-dof test that beats the omnibus χ² (q_m20) exactly when the
  * alternative is monotone in an ordered factor (quality tier, size
  * bucket, hour band). With integer scores s_c per ordered group,
  * successes y_c of n_c, totals Y of N:
  *   T = Σ s_c (y_c − n_c·Y/N),  Var(T) = (Y/N)(1−Y/N)·(Σ n_c s_c² − (Σ n_c s_c)²/N)
  * and clearing denominators makes z² EXACTLY rational:
  *   T' = Σ s_c (y_c·N − n_c·Y) = N·T (integer)
  *   V₃ = Y·(N−Y)·(N·Σ n_c s_c² − (Σ n_c s_c)²) = N³·Var (integer)
  *   z² = T'²·N / V₃
  * — so unlike the z-family tests there is NO float anywhere: the
  * statistic is one pmod-free integral division of decimal(38,0)/
  * HUGEINT products (all non-negative), with the trend DIRECTION
  * reported as sign(T'). Degenerate inputs (all successes, no
  * successes, or a single effective dose level) have V₃ = 0 → null.
  *
  * Scale shape: ONE map-side-combined groupBy(dose) pass producing
  * (n_c, y_c); everything after runs on |doses| rows. */
object CochranArmitage {

  /** Trend z² over rows (doseCol: integer score, outcomeCol: boolean).
    * Output one row: (n, y, k_doses, t_num, z2_micro, direction)
    * with direction ∈ {-1, 0, 1} = sign of the trend. */
  def trendTest(rows: DataFrame, doseCol: String, outcomeCol: String)
      : DataFrame = {
    val cells = rows.groupBy(col(doseCol).cast("long").as("s"))
      .agg(count(lit(1)).as("nc"),
        sum(when(col(outcomeCol), 1L).otherwise(0L)).as("yc"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    cells.agg(
      sum("nc").as("n"), sum("yc").as("y"),
      count(lit(1)).as("k_doses"),
      sum(d38(col("s")) * col("yc")).as("sy"),
      sum(d38(col("s")) * col("nc")).as("sn"),
      sum(d38(col("s")) * col("s") * col("nc")).as("ssn"))
      .select(col("n"), col("y"), col("k_doses"),
        (col("sy") * col("n") - col("sn") * col("y")).as("t_num"),
        (d38(col("y")) * (col("n") - col("y")) *
          (col("n") * col("ssn") - col("sn") * col("sn"))).as("v3"))
      // z² computed while t_num/v3 are still decimal(38,0) — t_num²·n
      // exceeds long range at modest corpus sizes, and v3 itself does
      // (which is also why v3 is not an output column: its long
      // narrowing would null out). t_num narrows last; a narrowing
      // overflow there surfaces as null, never a wrong value.
      .select(col("n"), col("y"), col("k_doses"),
        col("t_num").cast("long").as("t_num"),
        when(col("v3") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """cast((t_num * t_num * n * 1000000) div v3 as long)"""))
          .as("z2_micro"),
        signum(col("t_num")).cast("long").as("direction"))
  }

  /** q_m72_cochran_armitage: does the purchase rate trend across the
    * day? Doses = 6-hour bands (0..3 in hour order), outcome =
    * event_type = 'purchase'. All-integer; the oracle replays the
    * cleared-denominator identity cell for cell. */
  private val mCa = Q(
    (s, d) => trendTest(
      Tables.events(s, d).select(
        expr("hour(ts) div 6").cast("long").as("dose"),
        (col("event_type") === "purchase").as("won")),
      "dose", "won"),
    Some("""WITH cells AS (SELECT
                CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS nc,
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                  ELSE 0 END) AS BIGINT) AS yc
              FROM events GROUP BY 1),
            agg AS (SELECT CAST(SUM(nc) AS HUGEINT) AS n,
                CAST(SUM(yc) AS HUGEINT) AS y,
                CAST(COUNT(*) AS BIGINT) AS k_doses,
                SUM(CAST(s AS HUGEINT) * yc) AS sy,
                SUM(CAST(s AS HUGEINT) * nc) AS sn,
                SUM(CAST(s AS HUGEINT) * s * nc) AS ssn
              FROM cells),
            f AS (SELECT n, y, k_doses,
                sy * n - sn * y AS t_num,
                y * (n - y) * (n * ssn - sn * sn) AS v3
              FROM agg)
            SELECT CAST(n AS BIGINT) AS n, CAST(y AS BIGINT) AS y,
              k_doses, CAST(t_num AS BIGINT) AS t_num,
              CASE WHEN v3 = 0 THEN NULL
                ELSE CAST((t_num * t_num * n * 1000000) // v3 AS BIGINT)
              END AS z2_micro,
              CAST(CASE WHEN t_num > 0 THEN 1 WHEN t_num < 0 THEN -1
                ELSE 0 END AS BIGINT) AS direction
            FROM f"""))

  val queries: Map[String, Q] = Map("q_m72_cochran_armitage" -> mCa)
}
