package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration coefficient per group (Gini 1912, in the exact
  * rank-sum form) — the inequality read-out for corpus and revenue
  * monitoring: how concentrated is token mass across sources, revenue
  * across users, cluster mass across clusters? G = 0 is uniform, G → 1
  * is one-item-takes-all; a mixing pipeline watches it because a
  * training mix whose token mass is 0.9-Gini-concentrated in one
  * domain IS that domain, whatever the domain count says.
  *
  * Exact integers end-to-end (rule 1): with values sorted ascending,
  * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx). The doubled rank sum
  * decomposes over VALUE CELLS — a block of c copies of value v with
  * `cum` items below contributes v·(2·c·cum + c² + c) — invariant
  * under any ordering of equal values, so no tie-break enters the
  * statistic at all. One floor-division emits micro units; all
  * cross-products ride decimal(38,0)/HUGEINT (rule 6).
  *
  * Scale shape: ONE map-side-combined (group, value) count pass; the
  * rank-sum and cumulative windows run over DISTINCT-VALUE cells per
  * group (the KS pattern); the final arithmetic is one row per group. */
object Gini {

  /** Per-group Gini over non-negative integer values. Output:
    * (group, n, sum_v, gini_micro) — null gini when Σv = 0. */
  def gini(rows: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val cells = rows.groupBy(col(grpCol).as("group"),
        col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("group").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cum", sum("c").over(w) - col("c"))
    cum.groupBy("group").agg(
        sum("c").as("n"),
        sum(col("v").cast("decimal(38,0)") * col("c")).as("sv"),
        sum(col("v").cast("decimal(38,0)")
          * (col("c") * col("cum") * 2 + col("c") * col("c") + col("c")))
          .as("s2"))
      .select(col("group"), col("n"), col("sv").cast("long").as("sum_v"),
        when(col("sv") > 0, expr(
          """cast(((s2 - (cast(n as decimal(38,0)) + 1) * sv) * 1000000)
                 div (cast(n as decimal(38,0)) * sv) as long)"""))
          .as("gini_micro"))
  }

  /** q_m51_gini: revenue concentration — per event type, the Gini of
    * per-user total value (milli-lifted). */
  private val mGini = Q(
    (s, d) => gini(
      Tables.events(s, d).groupBy("event_type", "user_id")
        .agg(sum(floor(col("value") * 1000).cast("long")).as("v")),
      "event_type", "v")
      .withColumnRenamed("group", "event_type")
      .orderBy("event_type"),
    Some("""WITH u AS (SELECT event_type, user_id,
                CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                  AS v
              FROM events GROUP BY 1, 2),
            cells AS (SELECT event_type AS g, v,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM u GROUP BY 1, 2),
            cum AS (SELECT g, v, c,
                CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - c AS cum
              FROM cells),
            agg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n,
                SUM(CAST(v AS HUGEINT) * c) AS sv,
                SUM(CAST(v AS HUGEINT)
                  * (c * cum * 2 + c * c + c)) AS s2
              FROM cum GROUP BY 1)
            SELECT g AS event_type, n, CAST(sv AS BIGINT) AS sum_v,
              CASE WHEN sv > 0 THEN
                CAST(((s2 - (CAST(n AS HUGEINT) + 1) * sv) * 1000000)
                  // (CAST(n AS HUGEINT) * sv) AS BIGINT) END AS gini_micro
            FROM agg ORDER BY event_type"""))

  val queries: Map[String, Q] = Map("q_m51_gini" -> mGini)
}
