package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brown–Forsythe variance-homogeneity test (Brown & Forsythe, JASA
  * 1974; the median-centered robust form of Levene 1960) — the guard
  * in FRONT of the engine's one-way ANOVA (q_m37): the F-test's
  * equal-variance assumption is itself testable, as a one-way ANOVA on
  * absolute deviations from each group's MEDIAN. A significant
  * Brown–Forsythe F says "compare these groups with Welch (q_m74), not
  * the pooled F"; it is also a drift diagnostic in its own right
  * (spread change without a mean change — volatility drift).
  *
  * Exactness: group medians come from the value-counts formulation in
  * DOUBLED units (med2 = lo + hi, the two middle order statistics —
  * the [[Spearman]] doubled-rank trick), so the deviation
  * z = |2v − med2| is an exact integer and the entire test reduces to
  * [[Anova.oneWay]] on exact-integer inputs — the same pinned-fold /
  * floor-micro contract, no new float surface.
  *
  * Scale shape: one (variable, group, value) cells aggregation (THE
  * data pass), a cumulative window over DISTINCT-VALUE cells (never
  * rows) for the medians, one keyed join to re-attach med2 (groups are
  * few — broadcastable), then the ANOVA's single sufficient-statistics
  * pass. */
object Levene {

  /** Brown–Forsythe F per variable over (variable, group, integer
    * value) rows. Output: (variable, k, n, f_micro, eta2_micro) —
    * [[Anova.oneWay]] on z = |2v − med2|. */
  def brownForsythe(rows: DataFrame, varCol: String, groupCol: String,
      centsCol: String): DataFrame = {
    val base = rows.select(col(varCol).as("__var"),
      col(groupCol).as("__g"), col(centsCol).cast("long").as("__v"))
    val cells = base.groupBy("__var", "__g", "__v")
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy("__var", "__g").agg(sum("c").as("nn"))
    val cum = cells.withColumn("cum",
      sum("c").over(Window.partitionBy("__var", "__g").orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(tot, Seq("__var", "__g"))
    // the two middle order statistics: lo at ceil(n/2), hi at n/2 + 1
    // (equal for odd n) — both counts non-negative, bare div is safe
    val lo = cum.filter(col("cum") >= expr("(nn + 1) div 2"))
      .groupBy("__var", "__g").agg(min("__v").as("lo"))
    val hi = cum.filter(col("cum") >= expr("nn div 2 + 1"))
      .groupBy("__var", "__g").agg(min("__v").as("hi"))
    val med = lo.join(hi, Seq("__var", "__g"))
      .select(col("__var"), col("__g"), (col("lo") + col("hi")).as("med2"))
    val z = base.join(med, Seq("__var", "__g"))
      .select(col("__var"), col("__g"),
        abs(col("__v") * 2 - col("med2")).as("__z"))
    Anova.oneWay(z, "__var", "__g", "__z")
  }

  /** The ANOVA oracle tail (grp → terms → agg → fin → select) over a
    * `z(var, g, z)` CTE — shared shape with [[Anova]]'s oracle, kept
    * verbatim so both statistics replay the identical pinned fold. */
  private def anovaTailSql: String =
    """grp AS (SELECT var, g, COUNT(*) AS ng,
          CAST(SUM(z) AS HUGEINT) AS sg,
          SUM(CAST(z AS HUGEINT) * z) AS qg
        FROM z GROUP BY 1, 2),
      terms AS (SELECT var, g, ng, sg, qg,
          CAST(sg AS DOUBLE) * sg / ng AS term FROM grp),
      agg AS (SELECT var, COUNT(*) AS k,
          CAST(SUM(ng) AS BIGINT) AS n,
          SUM(sg) AS s, SUM(qg) AS q,
          list_reduce(list(term ORDER BY g), (acc, x) -> acc + x) AS t
        FROM terms GROUP BY 1),
      fin AS (SELECT var, k, n,
          t - CAST(s AS DOUBLE) * s / n AS ssb,
          CAST(q AS DOUBLE) - t AS ssw
        FROM agg)
      SELECT var AS variable, CAST(k AS BIGINT) AS k, n,
        CASE WHEN ssw > 0
          THEN CAST(floor(ssb / (k - 1) / (ssw / (n - k)) * 1e6) AS BIGINT)
          END AS f_micro,
        CASE WHEN ssb + ssw > 0
          THEN CAST(floor(ssb / (ssb + ssw) * 1e6) AS BIGINT)
          END AS eta2_micro
      FROM fin"""

  /** q_m75_levene: spread homogeneity for the same three variables
    * q_m37_anova tests for mean differences — the paired readout that
    * says whether q_m37's pooled F is trustworthy or q_m74's Welch
    * form is needed. */
  private val mLevene = Q(
    (s, d) => {
      val cust = Tables.customer(s, d)
      val rows = cust.select(lit("acctbal_by_mktsegment").as("v"),
          col("c_mktsegment").as("g"), Anova.cents(col("c_acctbal")).as("c"))
        .unionAll(cust.select(lit("acctbal_by_nation").as("v"),
          col("c_nationkey").cast("string").as("g"),
          Anova.cents(col("c_acctbal")).as("c")))
        .unionAll(Tables.lineitem(s, d)
          .select(lit("quantity_by_returnflag").as("v"),
            col("l_returnflag").as("g"), Anova.cents(col("l_quantity")).as("c")))
      brownForsythe(rows, "v", "g", "c").orderBy("variable")
    },
    Some(s"""WITH rows0 AS (
              SELECT 'acctbal_by_mktsegment' AS var, c_mktsegment AS g,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS v
              FROM customer
              UNION ALL
              SELECT 'acctbal_by_nation', CAST(c_nationkey AS VARCHAR),
                     CAST(round(c_acctbal * 100) AS BIGINT)
              FROM customer
              UNION ALL
              SELECT 'quantity_by_returnflag', l_returnflag,
                     CAST(round(l_quantity * 100) AS BIGINT)
              FROM lineitem),
            cells AS (SELECT var, g, v, CAST(COUNT(*) AS BIGINT) AS c
              FROM rows0 GROUP BY 1, 2, 3),
            tot AS (SELECT var, g, SUM(c) AS nn FROM cells GROUP BY 1, 2),
            cum AS (SELECT var, g, v,
                SUM(c) OVER (PARTITION BY var, g ORDER BY v) AS cum
              FROM cells),
            lo AS (SELECT c.var, c.g, MIN(v) AS lo
              FROM cum c JOIN tot t ON c.var = t.var AND c.g = t.g
              WHERE cum >= (nn + 1) // 2 GROUP BY 1, 2),
            hi AS (SELECT c.var, c.g, MIN(v) AS hi
              FROM cum c JOIN tot t ON c.var = t.var AND c.g = t.g
              WHERE cum >= nn // 2 + 1 GROUP BY 1, 2),
            med AS (SELECT lo.var, lo.g, lo + hi AS med2
              FROM lo JOIN hi ON lo.var = hi.var AND lo.g = hi.g),
            z AS (SELECT r.var, r.g, abs(r.v * 2 - m.med2) AS z
              FROM rows0 r JOIN med m ON r.var = m.var AND r.g = m.g),
            $anovaTailSql"""))

  val queries: Map[String, Q] = Map("q_m75_levene" -> mLevene)
}
