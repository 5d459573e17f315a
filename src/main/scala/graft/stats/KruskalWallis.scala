package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kruskal–Wallis H (JASA 1952) — the k-group extension of the
  * two-group Mann–Whitney rank test ([[TwoSample.mannWhitney]]) and the
  * rank-based sister of [[Anova]]: "did the DISTRIBUTION of this metric
  * shift across the k sources / languages / shards?", robust to the
  * heavy-tailed metrics (doc length, token counts, quality scores) that
  * break the normal-theory F. The per-variable read-out a corpus
  * monitor wants next to ANOVA's mean comparison.
  *
  * Arithmetic (exact-integer, the MWU machinery generalized): with
  * doubled average ranks every tie-averaged rank is an integer —
  * `2·cum_before + count_at_value + 1` summed per group gives the exact
  * doubled rank sum D_g. H = 3/(N(N+1))·Σ D_g²/n_g − 3(N+1); the
  * per-group quotient is floored to micro INSIDE the sum
  * (`t_g = 1e6·D_g² div (n_g·N·(N+1))`, non-negative integer division,
  * so Spark `div` ≡ DuckDB `//`), making the statistic a DEFINED
  * order-free integer decomposition: h_micro = 3·Σt_g − 3e6·(N+1),
  * within 3k micro of the real-valued H and bit-identical on any
  * engine — zero floats anywhere. The tie-corrected variant divides by
  * (1 − ΣT/(N³−N)) as one more integer floor-division (possibly
  * negative numerator → the [[Agreement]] pmod floor-div, matching
  * DuckDB's flooring `//` on any sign); all-tied variables emit null.
  *
  * Scale shape: the data pass is ONE map-side-combined
  * (variable, group, value) count; ranks, tie terms and the H
  * arithmetic run over DISTINCT VALUES per variable (the
  * [[TwoSample]] pattern — bounded by value cardinality, not rows;
  * quantize continuous metrics first). Cross-products run in
  * decimal(38,0) / HUGEINT (rule 6), so no corpus size silently wraps. */
object KruskalWallis {

  /** Per-variable Kruskal–Wallis over rows tagged (variable, group,
    * value). Output: (variable, n, k_groups, h_micro, t_tie, hc_micro). */
  def kruskalWallis(rows: DataFrame, varCol: String, grpCol: String,
      valCol: String): DataFrame = {
    val cnt = rows.groupBy(col(varCol).as("__var"), col(grpCol).as("__g"),
        col(valCol).as("__v"))
      .agg(count(lit(1)).as("c"))
    val vc = cnt.groupBy("__var", "__v").agg(sum("c").as("cv"))
    val w = Window.partitionBy("__var").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc.withColumn("cumx", sum("cv").over(w) - col("cv"))
    val d = cnt.join(cum, Seq("__var", "__v"))
      .groupBy("__var", "__g")
      .agg(sum(col("c").cast("decimal(38,0)")
          * (col("cumx") * 2 + col("cv") + 1)).as("d2r"),
        sum("c").as("ng"))
    val tot = vc.groupBy("__var").agg(sum("cv").as("n"),
      sum(col("cv").cast("decimal(38,0)") * col("cv") * col("cv")
        - col("cv")).as("tie"))
    val terms = d.join(tot, Seq("__var"))
      .withColumn("t",
        expr("""(cast(d2r as decimal(38,0)) * d2r * 1000000)
                div (cast(ng as decimal(38,0)) * n * (n + 1))"""))
    val agg = terms.groupBy("__var", "n", "tie")
      .agg(sum("t").as("st"), count(lit(1)).as("k_groups"))
    val nn = col("n").cast("decimal(38,0)") * col("n") * col("n") - col("n")
    val hm = (col("st") * 3
      - (col("n").cast("decimal(38,0)") + 1) * 3000000)
    agg.select(col("__var").as("variable"), col("n"), col("k_groups"),
      hm.cast("long").as("h_micro"),
      col("tie").cast("long").as("t_tie"),
      when(col("tie") < nn,
        Agreement.floorDiv(hm * nn, nn - col("tie")).cast("long"))
        .as("hc_micro"))
  }

  /** q_m47_kruskal: doc-length (n_chars) distribution shift across
    * languages WITHIN each source — 20 per-source tests, the grouped
    * monitoring shape (per-source KW next to q_m38_ks's pairwise KS). */
  private val mKruskal = Q(
    (s, d) => kruskalWallis(Tables.documents(s, d), "source", "lang",
        "n_chars")
      .orderBy("variable"),
    Some("""WITH cnt AS (SELECT source AS var, lang AS g, n_chars AS v,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2, 3),
            vc AS (SELECT var, v, CAST(SUM(c) AS BIGINT) AS cv
              FROM cnt GROUP BY 1, 2),
            cum AS (SELECT var, v, cv,
                CAST(SUM(cv) OVER (PARTITION BY var ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - cv AS cumx
              FROM vc),
            d AS (SELECT cnt.var, cnt.g,
                SUM(CAST(cnt.c AS HUGEINT)
                  * (cum.cumx * 2 + cum.cv + 1)) AS d2r,
                CAST(SUM(cnt.c) AS BIGINT) AS ng
              FROM cnt JOIN cum ON cnt.var = cum.var AND cnt.v = cum.v
              GROUP BY 1, 2),
            tot AS (SELECT var, CAST(SUM(cv) AS BIGINT) AS n,
                SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS tie
              FROM vc GROUP BY 1),
            terms AS (SELECT d.var,
                (CAST(d.d2r AS HUGEINT) * d.d2r * 1000000)
                  // (CAST(d.ng AS HUGEINT) * tot.n * (tot.n + 1)) AS t
              FROM d JOIN tot ON d.var = tot.var),
            agg AS (SELECT var, SUM(t) AS st,
                CAST(COUNT(*) AS BIGINT) AS k_groups
              FROM terms GROUP BY 1)
            SELECT agg.var AS variable, tot.n, agg.k_groups,
              CAST(3 * agg.st
                - 3000000 * (CAST(tot.n AS HUGEINT) + 1) AS BIGINT)
                AS h_micro,
              CAST(tot.tie AS BIGINT) AS t_tie,
              -- pmod floor form: the floored per-group terms can push
              -- h_micro slightly negative on uniform ranks, and bare //
              -- TRUNCATES toward zero on negatives (measured DuckDB 1.x)
              CASE WHEN tot.tie <
                  CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n
                THEN CAST((
                  ((3 * agg.st - 3000000 * (CAST(tot.n AS HUGEINT) + 1))
                    * (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n))
                  - ((((3 * agg.st
                        - 3000000 * (CAST(tot.n AS HUGEINT) + 1))
                       * (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n))
                      % (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n
                         - tot.tie)
                      + (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n
                         - tot.tie))
                     % (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n
                        - tot.tie)))
                  // (CAST(tot.n AS HUGEINT) * tot.n * tot.n - tot.n
                      - tot.tie) AS BIGINT)
              END AS hc_micro
            FROM agg JOIN tot ON agg.var = tot.var
            ORDER BY variable"""))

  val queries: Map[String, Q] = Map("q_m47_kruskal" -> mKruskal)
}
