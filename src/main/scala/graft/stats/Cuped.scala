package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013 —
  * "Improving the Sensitivity of Online Controlled Experiments by
  * Utilizing Pre-Experiment Data") — the standard production companion
  * to the raw A/B read-out ([[TwoSample.twoProportion]]): regress the
  * experiment-period metric on the PRE-period metric of the same user
  * (θ = cov(x,y)/var(x), pooled across arms — assignment-independent,
  * so the adjustment is unbiased) and compare adjusted means
  * ȳ_a − θ(x̄_a − x̄). Heavy users stay heavy across periods, so the
  * adjustment removes the between-user variance component — typically
  * 30–60% tighter confidence at the same traffic, i.e. the same
  * experiment decided in half the time.
  *
  * Cross-engine determinism (pure integer, zero floats in the hashed
  * integers): per-event values lift to exact milli units by binary
  * `floor(v·1000)` (rule 2); every sufficient statistic (Σx, Σy, Σxy,
  * Σx², Σy² and the per-arm sums) is an exact integer in decimal(38,0)
  * / HUGEINT (rule 6). θ and the adjusted means are emitted as one
  * floor-division each of those integers — clearing denominators,
  * adjmean_arm = (Σy_a·den·n − num·(Σx_a·n − n_a·Σx)) / (n_a·den·n)
  * with num = nΣxy − ΣxΣy, den = nΣx² − (Σx)² — through the
  * [[Agreement]] pmod floor-div on BOTH sides (numerators can be
  * negative, and negative-operand `div`/`//` semantics are not
  * contractual across engines — DuckDB 1.x `//` measured TRUNCATING;
  * the oracle therefore spells the same pmod form). The one float
  * column, the diagnostic ρ² (the variance-reduction fraction), is an
  * identical literal tree of those exact integers in both engines,
  * floored to micro. Degenerate inputs (constant x or y) emit nulls.
  *
  * Magnitude headroom: the widest product Σy_a·den·n stays inside
  * decimal(38,0) while n·(max user milli-sum)² · n · Σy_a < 10³⁸ —
  * ~10⁹ users at these metric ranges; a breach surfaces as a null
  * (decimal overflow), never a wrong value.
  *
  * Scale shape: ONE map-side-combined groupBy(user) collapse is the
  * data pass; the sufficient statistics are ONE scalar reduce over
  * users (partial map-side, a row per partition over the wire); the
  * final arithmetic is a 1-row select. No join touches event rows. */
object Cuped {

  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** CUPED-adjusted two-arm comparison. `users`: one row per user with
    * integer metric columns `x` (pre-period) and `y` (experiment
    * period) and `variant` ∈ {a, b}. One output row. */
  def cupedAdjust(users: DataFrame, variantCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = d38(col(xCol))
    val y = d38(col(yCol))
    val agg = users.agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"),
      sum(when(col(variantCol) === "a", 1L).otherwise(0L)).as("na"),
      sum(when(col(variantCol) === "a", x).otherwise(lit(0))).as("sxa"),
      sum(when(col(variantCol) === "a", y).otherwise(lit(0))).as("sya"),
      sum(when(col(variantCol) === "b", 1L).otherwise(0L)).as("nb"),
      sum(when(col(variantCol) === "b", x).otherwise(lit(0))).as("sxb"),
      sum(when(col(variantCol) === "b", y).otherwise(lit(0))).as("syb"))
    val n = d38(col("n"))
    val num = n * col("sxy") - col("sx") * col("sy")
    val den = n * col("sxx") - col("sx") * col("sx")
    val deny = n * col("syy") - col("sy") * col("sy")
    def adjMean(sya: Column, sxa: Column, na: Column): Column =
      Agreement.floorDiv(
        sya * den * n - num * (sxa * n - na * col("sx")),
        na * den * n).cast("long")
    val rho2 = floor(num.cast("double") / den.cast("double")
      * num.cast("double") / deny.cast("double") * lit(1e6)).cast("long")
    agg.select(col("n"), col("na"), col("nb"),
      when(den > 0, Agreement.floorDiv(num * 1000000, den).cast("long"))
        .as("theta_micro"),
      when(den > 0 && col("na") > 0, adjMean(col("sya"), col("sxa"), d38(col("na"))))
        .as("adj_mean_a_milli"),
      when(den > 0 && col("nb") > 0, adjMean(col("syb"), col("sxb"), d38(col("nb"))))
        .as("adj_mean_b_milli"),
      when(den > 0 && col("na") > 0 && col("nb") > 0,
        adjMean(col("sya"), col("sxa"), d38(col("na")))
          - adjMean(col("syb"), col("sxb"), d38(col("nb"))))
        .as("diff_adj_milli"),
      when(col("na") > 0,
        Agreement.floorDiv(col("sya"), d38(col("na"))).cast("long"))
        .as("raw_mean_a_milli"),
      when(col("nb") > 0,
        Agreement.floorDiv(col("syb"), d38(col("nb"))).cast("long"))
        .as("raw_mean_b_milli"),
      when(den > 0 && deny > 0, rho2).as("rho2_micro"))
  }

  /** q_m48_cuped: per-user event value, pre-period = Jan 1–15 (the
    * first half of the data window), experiment period = Jan 16–30;
    * arms by user_id parity (the q_m41_ab_test assignment). Users keep
    * a 0 for an empty period (the standard CUPED imputation — dropping
    * them would bias the arm totals). */
  private val mCuped = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.groupBy("user_id").agg(
        sum(when(col("ts") < to_timestamp(lit("2024-01-16 00:00:00")),
          floor(col("value") * 1000).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= to_timestamp(lit("2024-01-16 00:00:00")),
          floor(col("value") * 1000).cast("long")).otherwise(0L)).as("y"))
        .withColumn("variant",
          when(col("user_id") % 2 === 0, "a").otherwise("b"))
      cupedAdjust(users, "variant", "x", "y")
    },
    Some("""WITH u AS (SELECT user_id,
                CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(FLOOR(value * 1000) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
                CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(FLOOR(value * 1000) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y,
                CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant
              FROM events GROUP BY 1),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                SUM(CAST(x AS HUGEINT) * y) AS sxy,
                SUM(CAST(x AS HUGEINT) * x) AS sxx,
                SUM(CAST(y AS HUGEINT) * y) AS syy,
                CAST(SUM(CASE WHEN variant = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS na,
                SUM(CASE WHEN variant = 'a' THEN CAST(x AS HUGEINT)
                  ELSE 0 END) AS sxa,
                SUM(CASE WHEN variant = 'a' THEN CAST(y AS HUGEINT)
                  ELSE 0 END) AS sya,
                CAST(SUM(CASE WHEN variant = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb,
                SUM(CASE WHEN variant = 'b' THEN CAST(x AS HUGEINT)
                  ELSE 0 END) AS sxb,
                SUM(CASE WHEN variant = 'b' THEN CAST(y AS HUGEINT)
                  ELSE 0 END) AS syb
              FROM u),
            fin AS (SELECT n, na, nb, sx, sy, sxa, sya, sxb, syb,
                CAST(n AS HUGEINT) * sxy - sx * sy AS num,
                CAST(n AS HUGEINT) * sxx - sx * sx AS den,
                CAST(n AS HUGEINT) * syy - sy * sy AS deny
              FROM agg),
            -- every sign-risky division goes through the pmod FLOOR
            -- form (a − pmod(a,b) is exactly divisible): DuckDB's //
            -- TRUNCATES toward zero on negatives (measured; the round-12
            -- sf0.1 sweep caught theta_micro −18671 vs Spark's floored
            -- −18672), so bare // is only safe on non-negative operands
            nums AS (SELECT *,
                num * 1000000 AS th_n,
                sya * den * n - num * (sxa * n - na * sx) AS a_n,
                CAST(na AS HUGEINT) * den * n AS a_d,
                syb * den * n - num * (sxb * n - nb * sx) AS b_n,
                CAST(nb AS HUGEINT) * den * n AS b_d
              FROM fin)
            SELECT n, na, nb,
              CASE WHEN den > 0
                THEN CAST((th_n - ((th_n % den) + den) % den) // den
                  AS BIGINT) END
                AS theta_micro,
              CASE WHEN den > 0 AND na > 0
                THEN CAST((a_n - ((a_n % a_d) + a_d) % a_d) // a_d
                  AS BIGINT) END
                AS adj_mean_a_milli,
              CASE WHEN den > 0 AND nb > 0
                THEN CAST((b_n - ((b_n % b_d) + b_d) % b_d) // b_d
                  AS BIGINT) END
                AS adj_mean_b_milli,
              CASE WHEN den > 0 AND na > 0 AND nb > 0
                THEN CAST((a_n - ((a_n % a_d) + a_d) % a_d) // a_d
                  - (b_n - ((b_n % b_d) + b_d) % b_d) // b_d AS BIGINT) END
                AS diff_adj_milli,
              CASE WHEN na > 0
                THEN CAST((sya - ((sya % CAST(na AS HUGEINT))
                    + CAST(na AS HUGEINT)) % CAST(na AS HUGEINT))
                  // CAST(na AS HUGEINT) AS BIGINT) END
                AS raw_mean_a_milli,
              CASE WHEN nb > 0
                THEN CAST((syb - ((syb % CAST(nb AS HUGEINT))
                    + CAST(nb AS HUGEINT)) % CAST(nb AS HUGEINT))
                  // CAST(nb AS HUGEINT) AS BIGINT) END
                AS raw_mean_b_milli,
              CASE WHEN den > 0 AND deny > 0
                THEN CAST(FLOOR(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                  * CAST(num AS DOUBLE) / CAST(deny AS DOUBLE)
                  * 1000000.0) AS BIGINT) END
                AS rho2_micro
            FROM nums"""))

  val queries: Map[String, Q] = Map("q_m48_cuped" -> mCuped)
}
