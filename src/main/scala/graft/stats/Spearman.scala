package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group Spearman rank correlation (Spearman 1904; tie handling
  * per Kendall, "Rank Correlation Methods") — the robust twin of the
  * Pearson correlation matrix (q_a13): Pearson asks "linear on the
  * VALUES", Spearman "monotone on the RANKS", so one heavy-tailed
  * metric (price, token count) cannot buy the whole coefficient. The
  * tie-correct definition is Pearson applied to average ranks — NOT
  * the 6Σd² shortcut, which is wrong under ties.
  *
  * Exactness: average ranks at ties are half-integers, so DOUBLED
  * ranks are exact integers (the MWU trick); every sufficient
  * statistic (n, Σx, Σy, Σxy, Σx², Σy² over doubled ranks) is an exact
  * integer in decimal(38,0)/HUGEINT, and ρ is ONE identical ÷/√ tree
  * over them, floored to micro (NUMERIC_CONVENTION rule 2 — the
  * SMD/MWU-z pattern). The doubling cancels between numerator and
  * denominator, so no rescaling enters. Degenerate marginals (either
  * metric constant in a group) emit null.
  *
  * Scale shape: ranks come from the value-counts formulation — one
  * map-side (group, value) counts pass PER METRIC, cumulative windows
  * over distinct values per group, and rank lookup back onto rows by a
  * keyed join. No global sort, no row-scale window. */
object Spearman {

  /** Doubled average rank per (group, value): 2·rank = 2·(# strictly
    * below) + (count of equals) + 1. */
  private def ranks2(rows: DataFrame, grpCol: String, valCol: String,
      out: String): DataFrame = {
    val cnt = rows.groupBy(col(grpCol).as("__g"), col(valCol).as("__v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnt.withColumn("cum", sum("c").over(w))
      .select(col("__g"), col("__v"),
        ((col("cum") - col("c")) * 2 + col("c") + 1).as(out))
  }

  /** Per-group Spearman rho between two integer metric columns over
    * (group, x, y) rows. Output: (grp, n, rho_micro). */
  def spearman(rows: DataFrame, grpCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = rows.select(col(grpCol).as("__g"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val rx = ranks2(base, "__g", "__x", "rx")
      .withColumnRenamed("__v", "__x")
    val ry = ranks2(base, "__g", "__y", "ry")
      .withColumnRenamed("__v", "__y")
    val ranked = base.join(rx, Seq("__g", "__x"))
      .join(ry, Seq("__g", "__y"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    val agg = ranked.groupBy(col("__g").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("rx"))).as("sx"), sum(d38(col("ry"))).as("sy"),
        sum(d38(col("rx")) * col("ry")).as("sxy"),
        sum(d38(col("rx")) * col("rx")).as("sxx"),
        sum(d38(col("ry")) * col("ry")).as("syy"))
    val n = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val cov = n * dd("sxy") - dd("sx") * dd("sy")
    val vx = n * dd("sxx") - dd("sx") * dd("sx")
    val vy = n * dd("syy") - dd("sy") * dd("sy")
    agg.select(col("grp"), col("n"),
      when(vx > 0 && vy > 0,
        floor(cov / sqrt(vx * vy) * lit(1e6)).cast("long"))
        .as("rho_micro"))
  }

  /** q_m71_spearman: per-source monotone association between document
    * length (n_chars) and lexical richness (distinct-token count) —
    * the "does longer mean richer HERE" diagnostic, immune to the
    * length tail that would dominate a Pearson read-out. */
  private val mSpearman = Q(
    (s, d) => spearman(
      Tables.documents(s, d).select(col("source"),
        col("n_chars").cast("long").as("x"),
        size(array_distinct(graft.text.TextOps.tokens(
          lower(col("text"))))).cast("long").as("y")),
      "source", "x", "y")
      .withColumnRenamed("grp", "source")
      .orderBy("source"),
    Some("""WITH base AS (SELECT source AS g,
                CAST(n_chars AS BIGINT) AS x,
                CAST(len(list_distinct(list_filter(
                  string_split(lower(text), ' '), t -> t <> '')))
                  AS BIGINT) AS y
              FROM documents),
            cx AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
            rx AS (SELECT g, x,
                (CAST(SUM(c) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) - c) * 2 + c + 1 AS rx
              FROM cx),
            cy AS (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
            ry AS (SELECT g, y,
                (CAST(SUM(c) OVER (PARTITION BY g ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) - c) * 2 + c + 1 AS ry
              FROM cy),
            ranked AS (SELECT base.g, rx.rx, ry.ry
              FROM base JOIN rx ON rx.g = base.g AND rx.x = base.x
              JOIN ry ON ry.g = base.g AND ry.y = base.y),
            agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(rx AS HUGEINT)) AS sx,
                SUM(CAST(ry AS HUGEINT)) AS sy,
                SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
                SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
                SUM(CAST(ry AS HUGEINT) * ry) AS syy
              FROM ranked GROUP BY 1)
            SELECT g AS source, n,
              CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN CAST(FLOOR(
                  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000.0) AS BIGINT)
              END AS rho_micro
            FROM agg ORDER BY source"""))

  val queries: Map[String, Q] = Map("q_m71_spearman" -> mSpearman)
}
