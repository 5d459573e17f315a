package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohen's kappa inter-rater agreement (Cohen 1960) — chance-corrected
  * agreement between two categorical raters over the same items:
  * `κ = (p_o − p_e) / (1 − p_e)`. The data-curation use: two KEEP/DROP
  * quality gates disagree somewhere — κ says whether their agreement
  * beats the base-rate coincidence their marginals already guarantee
  * (two gates that each keep 95% agree 90.5% by chance alone; raw
  * percent-agreement hides that). Distinct from ARI (q_m17_ari): kappa
  * scores raters over a SHARED label space cell-by-cell, ARI scores
  * partitions up to label permutation.
  *
  * Exact-rational arithmetic — clearing denominators turns kappa into
  * pure integers: with n items, D = Σ diagonal (agreements) and
  * RC = Σ_label row_l·col_l, `κ = (n·D − RC) / (n² − RC)`; the output
  * is that ratio in FLOOR-division micro. The numerator is the one
  * place the repo's `div`-convention needs care: κ < 0 is legitimate
  * (worse-than-chance agreement), and negative-operand `div`/`//`
  * semantics are not contractual across engines/versions (measured on
  * DuckDB 1.x: `//` truncates like Spark's `div`, though docs call it
  * floor) — so the division goes through an explicit pmod-based floor
  * div, which divides EXACTLY and is therefore identical in both
  * engines for any sign (NUMERIC_CONVENTION rule 1's documented
  * caveat made executable). Degenerate marginals (both raters constant, n² = RC)
  * yield null, not a 0-divide.
  *
  * Scale: ONE map-side-combined groupBy(raterA, raterB) contingency
  * pass is the data work; marginals and the kappa arithmetic run on
  * |labels|² cells. */
object Agreement {

  /** Floor division a/b for b > 0, any-sign a: a − pmod(a, b) is exactly
    * divisible by b, so the decimal(38,0) quotient is an exact integer —
    * floor semantics in both engines with no double-precision detour.
    * Long headroom of the kappa path: pe's n²·1e9 caps n at ~3·10⁶
    * items; widen the marginal products to decimal(38,0) beyond (the
    * Anova precedent). */
  private[graft] def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)"))
      .cast("long")

  /** One-row kappa summary: (n, sum_diag, sum_rc, po_micro, pe_nano,
    * kappa_micro). p_e is emitted in nano (denominator n²) so small
    * chance rates stay resolvable. */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String)
      : DataFrame = {
    val cells = df.groupBy(col(raterA).as("a"), col(raterB).as("b"))
      .agg(count(lit(1)).as("c"))
    val rows = cells.groupBy("a").agg(sum("c").as("ra"))
    val cols_ = cells.groupBy("b").agg(sum("c").as("cb"))
    val rc = rows.join(cols_, col("a") === col("b"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("sum_rc"))
    val base = cells.agg(
      sum("c").as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("sum_diag"))
    base.crossJoin(broadcast(rc))
      .select(col("n"), col("sum_diag"), col("sum_rc"),
        expr("sum_diag * 1000000L div n").as("po_micro"),
        expr("sum_rc * 1000000000L div (n * n)").as("pe_nano"),
        when(col("n") * col("n") === col("sum_rc"), lit(null).cast("long"))
          .otherwise(floorDiv(
            (col("n") * col("sum_diag") - col("sum_rc")) * lit(1000000L),
            col("n") * col("n") - col("sum_rc")))
          .as("kappa_micro"))
  }

  /** q_m45_kappa: agreement between two cheap document-quality gates —
    * rater A keeps docs with ≥ 200 chars, rater B keeps docs with ≥ 40
    * whitespace words. Both deterministic from the text, so the oracle
    * rebuilds raters, contingency, and the exact-rational kappa end to
    * end. */
  private val mKappa = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("rater_len",
          when(col("n_chars") >= 200, lit("keep")).otherwise(lit("drop")))
        .withColumn("rater_words",
          when(size(filter(split(col("text"), " "),
            t => t =!= lit(""))) >= 40, lit("keep")).otherwise(lit("drop")))
      cohenKappa(docs, "rater_len", "rater_words")
    },
    Some("""WITH r AS (SELECT
                CASE WHEN n_chars >= 200 THEN 'keep' ELSE 'drop' END AS a,
                CASE WHEN len(list_filter(string_split(text, ' '),
                       x -> x <> '')) >= 40
                     THEN 'keep' ELSE 'drop' END AS b
              FROM documents),
            cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
                      FROM r GROUP BY a, b),
            ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra
                   FROM cells GROUP BY a),
            cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb
                   FROM cells GROUP BY b),
            rc AS (SELECT CAST(COALESCE(SUM(ra.ra * cb.cb), 0) AS BIGINT)
                     AS sum_rc
                   FROM ra JOIN cb ON ra.a = cb.b),
            base AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                CAST(COALESCE(SUM(CASE WHEN a = b THEN c END), 0)
                  AS BIGINT) AS sum_diag
              FROM cells)
            SELECT n, sum_diag, sum_rc,
                sum_diag * 1000000 // n AS po_micro,
                sum_rc * 1000000000 // (n * n) AS pe_nano,
                -- pmod floor form: kappa < 0 is legitimate and bare //
                -- TRUNCATES toward zero on negatives (measured DuckDB 1.x)
                CASE WHEN n * n = sum_rc THEN NULL
                     ELSE ((n * sum_diag - sum_rc) * 1000000
                       - ((((n * sum_diag - sum_rc) * 1000000)
                           % (n * n - sum_rc)) + (n * n - sum_rc))
                         % (n * n - sum_rc))
                          // (n * n - sum_rc) END AS kappa_micro
            FROM base CROSS JOIN rc"""))

  val queries: Map[String, Q] = Map("q_m45_kappa" -> mKappa)
}
