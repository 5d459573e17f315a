package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Friedman rank test + Kendall's coefficient of concordance W
  * (Friedman, JASA 1937; Kendall & Babington Smith, Ann. Math. Stat.
  * 1939; tie correction per Conover, Practical Nonparametric
  * Statistics) — the rank-based REPEATED-MEASURES omnibus the engine's
  * family still lacked: Kruskal–Wallis (q_m47) compares independent
  * groups, Cochran's Q (q_m24) paired BINARY outcomes; Friedman
  * compares k treatments measured on the SAME n blocks with ordinal
  * scores ("do the k prompt variants systematically order within
  * user?"), and W = χ²/(n(k−1)) is its 0..1 concordance effect size.
  *
  * Exactness: within-block average ranks in DOUBLED units
  * (ρ = 2·rank + ties − 1, the [[Spearman]] trick) are exact integers,
  * and clearing denominators makes the tie-corrected statistic exactly
  * rational:
  *   A = Σ_j (R2_j − n(k+1))²   (R2_j = Σ_i ρ_ij)
  *   B = Σ_ij ρ² − n·k·(k+1)²
  *   χ² = (k−1)·A / B,   W = A / (n·B)
  * — zero floats anywhere (rule 1), decimal(38,0)/HUGEINT products,
  * non-negative divisions. B = 0 (every block fully tied) → null.
  * Incomplete blocks (missing treatments) are DROPPED, per the
  * complete-block design the test assumes.
  *
  * Scale shape: block-keyed rank windows (never a global window), one
  * map-side-combined per-treatment aggregation, and the n/k totals
  * attach as broadcast 1-row frames; everything after runs on k rows. */
object Friedman {

  /** Friedman χ² and Kendall's W over (blockCol, treatCol, scoreCol)
    * rows — at most one row per (block, treatment); blocks missing any
    * treatment are dropped. Output one row:
    * (n_blocks, k, chi2_micro, w_micro). */
  def friedman(rows: DataFrame, blockCol: String, treatCol: String,
      scoreCol: String): DataFrame = {
    val base = rows.select(col(blockCol).as("__b"), col(treatCol).as("__t"),
      col(scoreCol).cast("long").as("__s"))
    val k1 = base.agg(count_distinct(col("__t")).as("k"))
    val complete = base.groupBy("__b")
      .agg(count_distinct(col("__t")).as("__kt"))
      .join(broadcast(k1), col("__kt") === col("k"))
      .select("__b")
    val ranked = base.join(complete, Seq("__b"))
      .withColumn("__r", rank().over(
        Window.partitionBy("__b").orderBy("__s")))
      .withColumn("__c", count(lit(1)).over(
        Window.partitionBy("__b", "__s")))
      .withColumn("rho", col("__r") * 2 + col("__c") - 1)
    val nb = ranked.agg(
      count_distinct(col("__b")).as("n_blocks"),
      sum(col("rho").cast("decimal(38,0)") * col("rho")).as("sr2"))
    val perT = ranked.groupBy("__t")
      .agg(sum(col("rho").cast("decimal(38,0)")).as("r2j"))
    perT.join(broadcast(nb)).join(broadcast(k1))
      .select(col("n_blocks"), col("k"), col("sr2"),
        ((col("r2j") - col("n_blocks").cast("decimal(38,0)") * (col("k") + 1))
          * (col("r2j") - col("n_blocks").cast("decimal(38,0)") * (col("k") + 1)))
          .as("__a"))
      .groupBy("n_blocks", "k", "sr2")
      .agg(sum("__a").as("a"))
      .select(col("n_blocks"), col("k"),
        (col("sr2") - col("n_blocks").cast("decimal(38,0)") * col("k")
          * (col("k") + 1) * (col("k") + 1)).as("b"), col("a"))
      .select(col("n_blocks"), col("k"),
        when(col("b") === 0, lit(null).cast("long"))
          .otherwise(expr("cast(((k - 1) * a * 1000000) div b as long)"))
          .as("chi2_micro"),
        when(col("b") === 0, lit(null).cast("long"))
          .otherwise(expr("cast((a * 1000000) div (n_blocks * b) as long)"))
          .as("w_micro"))
  }

  /** q_m76_friedman: do market segments systematically order customer
    * balance WITHIN nation? Blocks = nations, treatments = segments,
    * score = per-cell floor-milli mean acctbal (sign-safe pmod floor —
    * balances can be negative). The within-nation ranking removes the
    * between-nation level q_m37 would pool in. */
  private val mFriedman = Q(
    (s, d) => {
      val cells = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("b"), col("c_mktsegment").as("t"))
        .agg(sum(Anova.cents(col("c_acctbal")) * 10).as("sm"),
          count(lit(1)).as("nc"))
        .select(col("b"), col("t"),
          Agreement.floorDiv(col("sm"), col("nc")).as("score"))
      friedman(cells, "b", "t", "score")
    },
    Some("""WITH cells AS (SELECT c_nationkey AS b, c_mktsegment AS t,
                CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT) * 10)
                  AS BIGINT) AS sm,
                CAST(COUNT(*) AS BIGINT) AS nc
              FROM customer GROUP BY 1, 2),
            scored AS (SELECT b, t,
                (sm - ((sm % nc) + nc) % nc) // nc AS score FROM cells),
            k1 AS (SELECT COUNT(DISTINCT t) AS k FROM scored),
            complete AS (SELECT b FROM scored GROUP BY b
              HAVING COUNT(DISTINCT t) = (SELECT k FROM k1)),
            ranked AS (SELECT s.b, s.t,
                2 * rank() OVER (PARTITION BY s.b ORDER BY s.score)
                  + COUNT(*) OVER (PARTITION BY s.b, s.score) - 1 AS rho
              FROM scored s JOIN complete c ON s.b = c.b),
            nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n_blocks,
                SUM(CAST(rho AS HUGEINT) * rho) AS sr2 FROM ranked),
            pert AS (SELECT t, CAST(SUM(rho) AS HUGEINT) AS r2j
              FROM ranked GROUP BY t),
            aa AS (SELECT SUM((r2j - CAST(n_blocks AS HUGEINT) * (k + 1))
                  * (r2j - CAST(n_blocks AS HUGEINT) * (k + 1))) AS a,
                ANY_VALUE(n_blocks) AS n_blocks, ANY_VALUE(k) AS k,
                ANY_VALUE(sr2) AS sr2
              FROM pert, nb, k1),
            fin AS (SELECT n_blocks, k, a,
                sr2 - CAST(n_blocks AS HUGEINT) * k * (k + 1) * (k + 1) AS b
              FROM aa)
            SELECT n_blocks, CAST(k AS BIGINT) AS k,
              CASE WHEN b = 0 THEN NULL
                ELSE CAST(((k - 1) * a * 1000000) // b AS BIGINT)
                END AS chi2_micro,
              CASE WHEN b = 0 THEN NULL
                ELSE CAST((a * 1000000) // (n_blocks * b) AS BIGINT)
                END AS w_micro
            FROM fin"""))

  val queries: Map[String, Q] = Map("q_m76_friedman" -> mFriedman)
}
