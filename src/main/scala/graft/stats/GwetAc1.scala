package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gwet's AC1 chance-corrected agreement (Gwet, Br. J. Math. Stat.
  * Psychol. 2008) — the documented fix for the kappa paradox the
  * engine's q_m45/q_m55 inherit: when one category dominates (a
  * quality gate that passes 95% of documents), Cohen's kappa collapses
  * toward zero on ANY disagreement because its chance term is built
  * from the same skewed marginals. AC1's chance term uses the
  * probability a RANDOM rater pair agrees by luck on a random
  * category — (1/(K−1))·Σ π_k(1−π_k), π_k the pooled marginal — which
  * stays small under prevalence skew, so high observed agreement keeps
  * scoring high. Report kappa AND AC1; divergence between them IS the
  * prevalence diagnostic.
  *
  * Exactness (rule 1, zero floats): with diagonal g of n items, pooled
  * marginals m_k = row_k + col_k, K categories and
  *   P = Σ_k m_k·(2n − m_k),   D = 4n²(K−1),
  * clearing denominators gives AC1 = (g·D − n·P) / (n·(D − P)) — one
  * signed pmod floor-division of decimal(38,0)/HUGEINT products.
  * D = P (chance agreement saturates — single category) → null.
  *
  * Scale shape: ONE map-side (a, b) cells pass; marginals and the
  * statistic derive from the cells — the [[Agreement.cohenKappa]]
  * shape exactly. */
object GwetAc1 {

  /** AC1 over paired categorical columns. Output one row:
    * (n, k_cats, po_micro, pe_ac1_micro, ac1_micro). */
  def ac1(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val cells = df.groupBy(col(raterA).cast("string").as("a"),
        col(raterB).cast("string").as("b"))
      .agg(count(lit(1)).as("c"))
    val ra = cells.groupBy(col("a").as("cat")).agg(sum("c").as("ra"))
    val cb = cells.groupBy(col("b").as("cat")).agg(sum("c").as("cb"))
    val marg = ra.join(cb, Seq("cat"), "full")
      .select(col("cat"),
        (coalesce(col("ra"), lit(0L)) + coalesce(col("cb"), lit(0L)))
          .as("m"))
    val base = cells.agg(sum("c").as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("g"))
    // n enters marg's aggregate via a broadcast 1-row attach
    val pk = marg.join(broadcast(base))
      .groupBy("n", "g")
      .agg(count(lit(1)).as("k_cats"),
        sum(col("m").cast("decimal(38,0)")
          * (col("n") * 2 - col("m"))).as("p"))
    pk.select(col("n"), col("g"), col("k_cats"), col("p"),
        (col("n").cast("decimal(38,0)") * col("n") * 4
          * (col("k_cats") - 1)).as("d"))
      .select(col("n"), col("k_cats"),
        expr("(g * 1000000L) div n").as("po_micro"),
        when(col("d") === 0, lit(null).cast("long"))
          .otherwise(expr("cast((p * 1000000) div d as long)"))
          .as("pe_ac1_micro"),
        when(col("d") - col("p") === 0 || col("k_cats") < 2,
          lit(null).cast("long"))
          .otherwise(Agreement.floorDiv(
            (col("g").cast("decimal(38,0)") * col("d")
              - col("n").cast("decimal(38,0)") * col("p")) * 1000000L,
            col("n").cast("decimal(38,0)") * (col("d") - col("p"))))
          .as("ac1_micro"))
  }

  /** q_m87_gwet_ac1: the q_m73 gate pair re-scored with the
    * prevalence-robust chance correction — read next to q_m45's kappa;
    * a large AC1−kappa gap on the same pair IS the skew diagnostic. */
  private val mAc1 = Q(
    (s, d) => ac1(
      Tables.documents(s, d).select(
        (col("n_chars") >= 500).as("ga"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          >= 80).as("gb")),
      "ga", "gb"),
    Some("""WITH pairs AS (SELECT
                CAST(n_chars >= 500 AS VARCHAR) AS a,
                CAST(length(text) - length(replace(text, ' ', '')) >= 80
                  AS VARCHAR) AS b
              FROM documents),
            cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
              FROM pairs GROUP BY 1, 2),
            ra AS (SELECT a AS cat, SUM(c) AS ra FROM cells GROUP BY 1),
            cb AS (SELECT b AS cat, SUM(c) AS cb FROM cells GROUP BY 1),
            marg AS (SELECT COALESCE(ra.cat, cb.cat) AS cat,
                COALESCE(ra, 0) + COALESCE(cb, 0) AS m
              FROM ra FULL JOIN cb ON ra.cat = cb.cat),
            base AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                CAST(COALESCE(SUM(CASE WHEN a = b THEN c END), 0)
                  AS BIGINT) AS g
              FROM cells),
            pk AS (SELECT n, g, CAST(COUNT(*) AS BIGINT) AS k_cats,
                SUM(CAST(m AS HUGEINT) * (n * 2 - m)) AS p
              FROM marg, base GROUP BY n, g),
            f AS (SELECT n, g, k_cats, p,
                CAST(n AS HUGEINT) * n * 4 * (k_cats - 1) AS d
              FROM pk)
            SELECT n, k_cats,
              CAST((g * 1000000) // n AS BIGINT) AS po_micro,
              CASE WHEN d = 0 THEN NULL
                ELSE CAST((p * 1000000) // d AS BIGINT) END AS pe_ac1_micro,
              CASE WHEN d - p = 0 OR k_cats < 2 THEN NULL
                ELSE CAST((((CAST(g AS HUGEINT) * d - CAST(n AS HUGEINT) * p)
                    * 1000000)
                  - ((((CAST(g AS HUGEINT) * d - CAST(n AS HUGEINT) * p)
                      * 1000000) % (CAST(n AS HUGEINT) * (d - p))
                      + CAST(n AS HUGEINT) * (d - p))
                    % (CAST(n AS HUGEINT) * (d - p))))
                  // (CAST(n AS HUGEINT) * (d - p)) AS BIGINT)
                END AS ac1_micro
            FROM f"""))

  val queries: Map[String, Q] = Map("q_m87_gwet_ac1" -> mAc1)
}
