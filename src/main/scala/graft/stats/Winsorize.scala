package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped winsorization (percentile clipping) — the robust-mean
  * companion to the MAD outlier gate (q_a14): training-data metrics
  * (prices, token counts, quality scores) carry heavy tails, and the
  * standard fix before averaging is to clip at the p/(1−p) percentiles.
  * Emits per group the exact nearest-rank clip bounds, how many rows
  * each side clipped, and the winsorized mean.
  *
  * Scale shape — the value-counts formulation (shared with
  * [[TwoSample]]): the ONE data-scale pass is a map-side-combined
  * `groupBy(group, value)` count; the rank scan for the bounds runs
  * over DISTINCT VALUES per group (bounded by value cardinality for
  * quantized metrics — pre-bin continuous ones), and the winsorized
  * sum is Σ count·clip(value) over that same counts table — the raw
  * rows are never re-read, never re-sorted. This is the exact path; for
  * one-pass approximate bounds at extreme cardinality use the GK
  * sketch (q_sk_approx_quantiles) and keep the same clip algebra.
  *
  * Cross-engine determinism: nearest-rank bounds (lo = value at rank
  * ⌈p·n⌉, hi = at ⌈(1−p)·n⌉, ranks via ceil-division in integers) are
  * actual data values, so clipped values stay exact integers, sums are
  * order-free, and the mean is emitted in floor micro-units by integer
  * division — no float appears anywhere. */
object Winsorize {

  /** Per-group winsorized profile over (group, integer value) rows.
    * `pctLo`/`pctHi` are percentile numerators over 100 (5 → p5).
    * Output: (grp, n, lo, hi, n_low, n_high, wmean_micro). */
  def winsorize(rows: DataFrame, grpCol: String, valCol: String,
      pctLo: Int = 5, pctHi: Int = 95): DataFrame = {
    val cnt = rows.groupBy(col(grpCol).as("__g"), col(valCol).as("__v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cnt.withColumn("cum", sum("c").over(w))
    val tot = cnt.groupBy("__g").agg(sum("c").as("n"))
      .withColumn("klo", expr(s"(n * $pctLo + 99) div 100"))
      .withColumn("khi", expr(s"(n * $pctHi + 99) div 100"))
    val bounds = cum.join(broadcast(tot), Seq("__g"))
      .groupBy("__g", "n")
      .agg(min(when(col("cum") >= col("klo"), col("__v"))).as("lo"),
        min(when(col("cum") >= col("khi"), col("__v"))).as("hi"))
    cnt.join(broadcast(bounds), Seq("__g"))
      .withColumn("__clip", least(greatest(col("__v"), col("lo")), col("hi")))
      .groupBy(col("__g"), col("n"), col("lo"), col("hi"))
      .agg(
        sum(when(col("__v") < col("lo"), col("c")).otherwise(0L))
          .as("n_low"),
        sum(when(col("__v") > col("hi"), col("c")).otherwise(0L))
          .as("n_high"),
        sum(col("c") * col("__clip")).as("__wsum"))
      .select(col("__g").as("grp"), col("n"), col("lo"), col("hi"),
        col("n_low"), col("n_high"),
        expr("(__wsum * 1000000L) div n").as("wmean_micro"))
  }

  private val aWinsor = Q(
    (s, d) => winsorize(Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          Anova.cents(col("l_extendedprice")).as("x")),
      "g", "x").orderBy("grp"),
    Some("""WITH r0 AS (SELECT l_returnflag AS g,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS x
              FROM lineitem),
            cnt AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
              FROM r0 GROUP BY 1, 2),
            cum AS (SELECT g, x, c,
                CAST(SUM(c) OVER (PARTITION BY g ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
              FROM cnt),
            tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n,
                (CAST(SUM(c) AS BIGINT) * 5 + 99) // 100 AS klo,
                (CAST(SUM(c) AS BIGINT) * 95 + 99) // 100 AS khi
              FROM cnt GROUP BY 1),
            bounds AS (SELECT cum.g, tot.n,
                MIN(CASE WHEN cum.cum >= tot.klo THEN cum.x END) AS lo,
                MIN(CASE WHEN cum.cum >= tot.khi THEN cum.x END) AS hi
              FROM cum JOIN tot ON cum.g = tot.g
              GROUP BY 1, 2)
            SELECT cnt.g AS grp, b.n, b.lo, b.hi,
                CAST(SUM(CASE WHEN cnt.x < b.lo THEN cnt.c ELSE 0 END)
                  AS BIGINT) AS n_low,
                CAST(SUM(CASE WHEN cnt.x > b.hi THEN cnt.c ELSE 0 END)
                  AS BIGINT) AS n_high,
                CAST(SUM(cnt.c * least(greatest(cnt.x, b.lo), b.hi))
                  AS BIGINT) * 1000000 // b.n AS wmean_micro
            FROM cnt JOIN bounds b ON cnt.g = b.g
            GROUP BY 1, 2, 3, 4 ORDER BY grp"""))

  val queries: Map[String, Q] = Map("q_a19_winsorize" -> aWinsor)
}
