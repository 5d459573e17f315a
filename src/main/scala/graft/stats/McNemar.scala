package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** McNemar's test for paired binary outcomes (McNemar, Psychometrika
  * 1947) — the PAIRED companion to the two-proportion z-test
  * (q_m41_ab_test): when two gates/classifiers are evaluated on the
  * SAME items, only the discordant pairs carry information, and the
  * unpaired z-test both wastes the pairing and miscounts its variance.
  * The canonical pipeline question it answers: "did swapping quality
  * gate A for gate B change which documents pass?" — e.g. comparing a
  * rule revision against the incumbent on one corpus snapshot.
  *
  * With discordant counts b = |A-only passes| and c = |B-only passes|,
  * the continuity-corrected statistic is
  *   χ²_cc = (max(|b − c| − 1, 0))² / (b + c),   df = 1
  * (Edwards 1948 correction; the max-clamp keeps b = c at exactly 0
  * instead of the spurious 1/(b+c)). Pure integers end to end: the
  * numerator is a long square, the output is one pmod-free integral
  * division of non-negative longs — no float ever exists (rule 1 of
  * NUMERIC_CONVENTION.md). b + c = 0 (no discordance at all) leaves the
  * statistic undefined → null.
  *
  * Scale shape: ONE map-side-combined aggregation over the paired
  * frame collapses the corpus to four concordance counters; everything
  * after is a 1-row select. No join, no window, no shuffle beyond the
  * single 4-counter reduce. */
object McNemar {

  /** McNemar χ² over paired boolean columns. Output one row:
    * (n, n10, n01, chi2_cc_micro, direction) where n10 = A-only
    * passes, n01 = B-only passes, direction = sign(n10 − n01)
    * (+1 → gate A passes more items than gate B). */
  def mcnemar(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.agg(
      count(lit(1)).as("n"),
      sum(when(col(aCol) && !col(bCol), 1L).otherwise(0L)).as("n10"),
      sum(when(!col(aCol) && col(bCol), 1L).otherwise(0L)).as("n01"))
      .select(col("n"), col("n10"), col("n01"),
        when(col("n10") + col("n01") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """greatest(abs(n10 - n01) - 1, 0L) * greatest(abs(n10 - n01) - 1, 0L)
               * 1000000L div (n10 + n01)"""))
          .as("chi2_cc_micro"),
        signum(col("n10") - col("n01")).cast("long").as("direction"))

  /** q_m73_mcnemar: two document-quality gates on the same corpus —
    * A: raw size (n_chars ≥ 500), B: whitespace-token count (≥ 80
    * spaces, the engine-identical `length − length(strip spaces)`
    * form). Both gates are pure string/compare expressions so the
    * paired frame replays bit-for-bit in the oracle. */
  private val mMcNemar = Q(
    (s, d) => mcnemar(
      Tables.documents(s, d).select(
        (col("n_chars") >= 500).as("ga"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          >= 80).as("gb")),
      "ga", "gb"),
    Some("""WITH pairs AS (SELECT
                n_chars >= 500 AS ga,
                length(text) - length(replace(text, ' ', '')) >= 80 AS gb
              FROM documents),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
                CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01
              FROM pairs)
            SELECT n, n10, n01,
              CASE WHEN n10 + n01 = 0 THEN NULL
                ELSE CAST(greatest(abs(n10 - n01) - 1, 0)
                  * greatest(abs(n10 - n01) - 1, 0)
                  * 1000000 // (n10 + n01) AS BIGINT) END AS chi2_cc_micro,
              CAST(CASE WHEN n10 > n01 THEN 1 WHEN n10 < n01 THEN -1
                ELSE 0 END AS BIGINT) AS direction
            FROM agg"""))

  /** Matthews correlation coefficient (Matthews, BBA 1975; the binary
    * φ coefficient) — the single-number binary-agreement strength the
    * McNemar DIFFERENCE test leaves unstated: with the 2×2 cells
    * (n11, n10, n01, n00),
    *   MCC = (n11·n00 − n10·n01) / √((n11+n10)(n11+n01)(n00+n10)(n00+n01))
    * robust where accuracy lies under class imbalance. MCC² is exactly
    * rational (signed, cleared by the marginal product); MCC itself is
    * ONE identical √ tree floored micro. A zero marginal → null. */
  def mcc(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.agg(
      count(lit(1)).as("n"),
      sum(when(col(aCol) && col(bCol), 1L).otherwise(0L)).as("n11"),
      sum(when(col(aCol) && !col(bCol), 1L).otherwise(0L)).as("n10"),
      sum(when(!col(aCol) && col(bCol), 1L).otherwise(0L)).as("n01"),
      sum(when(!col(aCol) && !col(bCol), 1L).otherwise(0L)).as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n11").cast("decimal(38,0)") * col("n00")
          - col("n10").cast("decimal(38,0)") * col("n01")).as("num"),
        ((col("n11") + col("n10")).cast("decimal(38,0)")
          * (col("n11") + col("n01")) * (col("n00") + col("n10"))
          * (col("n00") + col("n01"))).as("prod"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("prod") === 0, lit(null).cast("long"))
          .otherwise(floor(col("num").cast("double")
            / sqrt(col("prod").cast("double")) * lit(1e6)).cast("long"))
          .as("mcc_micro"),
        when(col("prod") === 0, lit(null).cast("long"))
          .otherwise(signum(col("num")).cast("long")
            * expr("cast((num * num * 1000000) div prod as long)"))
          .as("mcc2_micro"))

  /** q_m86_mcc: how strongly do the two q_m73 quality gates agree, as
    * a correlation — the magnitude next to McNemar's marginal-shift
    * decision on the identical paired frame. */
  private val mMcc = Q(
    (s, d) => mcc(
      Tables.documents(s, d).select(
        (col("n_chars") >= 500).as("ga"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          >= 80).as("gb")),
      "ga", "gb"),
    Some("""WITH pairs AS (SELECT
                n_chars >= 500 AS ga,
                length(text) - length(replace(text, ' ', '')) >= 80 AS gb
              FROM documents),
            agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11,
                CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
                CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
                CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
              FROM pairs),
            f AS (SELECT n, n11, n10, n01, n00,
                CAST(n11 AS HUGEINT) * n00
                  - CAST(n10 AS HUGEINT) * n01 AS num,
                CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                  * (n00 + n10) * (n00 + n01) AS prod
              FROM agg)
            SELECT n, n11, n10, n01, n00,
              CASE WHEN prod = 0 THEN NULL
                ELSE CAST(floor(CAST(num AS DOUBLE)
                  / sqrt(CAST(prod AS DOUBLE)) * 1e6) AS BIGINT)
                END AS mcc_micro,
              CASE WHEN prod = 0 THEN NULL
                ELSE CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                    ELSE 0 END
                  * ((num * num * 1000000) // prod) AS BIGINT)
                END AS mcc2_micro
            FROM f"""))

  val queries: Map[String, Q] = Map(
    "q_m73_mcnemar" -> mMcNemar,
    "q_m86_mcc" -> mMcc)
}
