package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford first-digit conformance audit (Benford, Proc. Am. Phil.
  * Soc. 1938; Nigrini's MAD bands, J. Accountancy 1999) — the
  * data-forensics screen for numeric columns: naturally-grown
  * magnitudes (transaction amounts, populations, file sizes) follow
  * P(d) = log₁₀(1+1/d); fabricated, capped, defaulted or unit-mixed
  * data does not. A pipeline runs this over ingested fact columns to
  * flag synthetic/corrupted feeds before they reach training.
  *
  * Exactness: the first significant digit is a pure STRING operation
  * on the integer value (no float log10 — substr of the decimal
  * rendering, identical in both engines); counts are exact; the
  * Benford reference p_d = ln(1+1/d)/ln(10) and the two conformance
  * statistics (Nigrini's MAD = mean |c_d/n − p_d|, Pearson χ²) are
  * identical trees folded over the FIXED 9-digit grid in digit order
  * and floored micro ([[MutualInfo]] convention). Zero/negative values
  * are excluded by definition (no first significant digit).
  *
  * Scale shape: ONE map-side (variable, digit) counts pass; the
  * 9-digit grid materializes per variable (9k cells) so absent digits
  * still enter both statistics; folds run over 9 cells. */
object Benford {

  /** Conformance per variable over (varCol, integer valueCol) rows.
    * Output: (variable, n, mad_micro, chi2_micro). A variable with no
    * positive values has no first-significant-digit distribution at
    * all and is OMITTED from the output (the 9-digit grid derives
    * from the post-filter counts), not emitted as a null row. */
  def audit(rows: DataFrame, varCol: String, valueCol: String): DataFrame = {
    val pos = rows.select(col(varCol).as("__var"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__v") > 0)
      .withColumn("d", expr("cast(substr(cast(__v as string), 1, 1) as long)"))
    val cnt = pos.groupBy("__var", "d").agg(count(lit(1)).as("c"))
    val grid = cnt.select("__var").distinct()
      .select(col("__var"), explode(sequence(lit(1L), lit(9L))).as("d"))
      .join(cnt, Seq("__var", "d"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val tot = cnt.groupBy("__var").agg(sum("c").as("n"))
    grid.join(tot, Seq("__var"))
      .withColumn("p", expr("ln(1e0 + 1e0 / d) / ln(10e0)"))
      .withColumn("madterm", expr("abs(cast(c as double) / n - p)"))
      .withColumn("chiterm", expr(
        """(cast(c as double) - n * p) * (cast(c as double) - n * p)
           / (n * p)"""))
      .groupBy(col("__var"), col("n"))
      .agg(collect_list(struct(col("d"), col("madterm").as("ma"),
        col("chiterm").as("ch"))).as("__l"))
      .select(col("__var").as("variable"), col("n"),
        floor(aggregate(
          transform(array_sort(col("__l")), s => s.getField("ma")),
          lit(0.0), (acc, x) => acc + x) / lit(9.0) * lit(1e6))
          .cast("long").as("mad_micro"),
        floor(aggregate(
          transform(array_sort(col("__l")), s => s.getField("ch")),
          lit(0.0), (acc, x) => acc + x) * lit(1e6))
          .cast("long").as("chi2_micro"))
      .orderBy("variable")
  }

  /** q_m83_benford: do the money columns grow naturally? Benford
    * conformance of order totals, line extended prices, and positive
    * account balances (cents). */
  private def cents(c: Column) = round(c * 100).cast("long")

  private val mBenford = Q(
    (s, d) =>
      audit(
        Tables.orders(s, d).select(lit("o_totalprice").as("v"),
            cents(col("o_totalprice")).as("x"))
          .unionAll(Tables.lineitem(s, d).select(
            lit("l_extendedprice").as("v"), cents(col("l_extendedprice")).as("x")))
          .unionAll(Tables.customer(s, d).select(
            lit("c_acctbal").as("v"), cents(col("c_acctbal")).as("x"))),
        "v", "x"),
    Some("""WITH rows0 AS (
              SELECT 'o_totalprice' AS v,
                CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
              UNION ALL
              SELECT 'l_extendedprice',
                CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'c_acctbal',
                CAST(round(c_acctbal * 100) AS BIGINT) FROM customer),
            pos AS (SELECT v AS var,
                CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT) AS d
              FROM rows0 WHERE x > 0),
            cnt AS (SELECT var, d, CAST(COUNT(*) AS BIGINT) AS c
              FROM pos GROUP BY 1, 2),
            grid AS (SELECT g.var, g.d, COALESCE(cnt.c, 0) AS c
              FROM (SELECT var, unnest(range(1, 10)) AS d
                    FROM (SELECT DISTINCT var FROM cnt)) g
              LEFT JOIN cnt ON cnt.var = g.var AND cnt.d = g.d),
            tot AS (SELECT var, SUM(c) AS n FROM cnt GROUP BY 1),
            terms AS (SELECT grid.var, grid.d, grid.c, tot.n,
                ln(1e0 + 1e0 / grid.d) / ln(10e0) AS p
              FROM grid JOIN tot ON grid.var = tot.var),
            tv AS (SELECT var, d, n,
                abs(CAST(c AS DOUBLE) / n - p) AS ma,
                (CAST(c AS DOUBLE) - n * p) * (CAST(c AS DOUBLE) - n * p)
                  / (n * p) AS ch
              FROM terms)
            SELECT var AS variable, CAST(n AS BIGINT) AS n,
              CAST(floor(list_reduce(list(ma ORDER BY d),
                (acc, x) -> acc + x) / 9.0 * 1e6) AS BIGINT) AS mad_micro,
              CAST(floor(list_reduce(list(ch ORDER BY d),
                (acc, x) -> acc + x) * 1e6) AS BIGINT) AS chi2_micro
            FROM tv GROUP BY var, n
            ORDER BY variable"""))

  val queries: Map[String, Q] = Map("q_m83_benford" -> mBenford)
}
