package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-level and panel-level treatment effects — what the
  * mean-based read-outs (q_m41, q_m48, q_m64) cannot see:
  *
  * **Quantile treatment effects** (Doksum, Ann.Stat. 1974; Koenker's
  * quantile-regression framing): QTE(p) = y_a(p) − y_b(p), the gap
  * between the arms' p-th quantiles. A treatment that moves the tail
  * but not the median (or vice versa) shows a flat mean diff and a
  * loud QTE profile — the standard "who exactly did this help"
  * read-out. Exact nearest-rank quantiles per arm (the
  * [[Winsorize]]/[[Conformal]] counts machinery), so each QTE is a
  * DIFFERENCE OF ACTUAL DATA VALUES — pure integers, no interpolation.
  *
  * **Difference-in-differences** (Card & Krueger, AER 1994, as the
  * canonical reference): with pre/post periods and arms a/b,
  * DiD = (ȳ_a,post − ȳ_a,pre) − (ȳ_b,post − ȳ_b,pre) — the parallel-
  * trends estimator that survives arm-level baseline gaps an SRM-clean
  * split can still carry. Computed EXACTLY: the four cell means share
  * the common denominator n₁n₂n₃n₄, so the estimate is ONE pmod
  * floor-division of cleared-denominator decimal(38,0) integers —
  * no per-cell rounding anywhere.
  *
  * Scale shape: QTE is one map-side (arm, value) counts pass + rank
  * scans over distinct values per arm; DiD is one map-side
  * (arm, period) cells pass + a 1-row select. Nothing re-reads rows. */
object TreatmentEffects {

  /** Nearest-rank quantile treatment effects over (arm ∈ {a,b}, integer
    * y) rows at the given percentiles. Output per percentile:
    * (pct, ya, yb, qte) — qte = ya − yb, all actual data values. */
  def quantileTreatmentEffects(rows: DataFrame, armCol: String,
      yCol: String, pcts: Seq[Int] = Seq(10, 25, 50, 75, 90))
      : DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles in [1, 100]")
    val spark = rows.sparkSession
    import spark.implicits._
    val cnt = rows.groupBy(col(armCol).as("__g"), col(yCol).as("__v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cnt.withColumn("cum", sum("c").over(w))
    val tot = cnt.groupBy("__g").agg(sum("c").as("n"))
    val ranks = cum.join(broadcast(tot), Seq("__g"))
      .crossJoin(broadcast(pcts.toDF("pct")))
      .withColumn("k", expr("(n * pct + 99) div 100"))
      .groupBy("__g", "pct")
      .agg(min(when(col("cum") >= col("k"), col("__v"))).as("q"))
    val a = ranks.filter(col("__g") === "a")
      .select(col("pct"), col("q").as("ya"))
    val b = ranks.filter(col("__g") === "b")
      .select(col("pct"), col("q").as("yb"))
    a.join(b, Seq("pct"))
      .select(col("pct").cast("long").as("pct"), col("ya"), col("yb"),
        (col("ya") - col("yb")).as("qte"))
  }

  /** Exact difference-in-differences over (arm ∈ {a,b}, period ∈
    * {pre, post}, integer y) rows. One row: the four cell sizes/sums
    * and did_micro — one floor-division of cleared-denominator
    * integers. Null when any cell is empty (no contrast exists). */
  def diffInDiff(rows: DataFrame, armCol: String, periodCol: String,
      yCol: String): DataFrame = {
    // ONE conditional aggregation — an empty cell must surface as a
    // zero count in the single output row (a filter+crossJoin assembly
    // would silently EMPTY the whole output instead)
    def isCell(g: String, p: String) =
      col(armCol) === g && col(periodCol) === p
    def n(g: String, p: String) =
      sum(when(isCell(g, p), 1L).otherwise(0L))
    def s(g: String, p: String) =
      coalesce(sum(when(isCell(g, p), col(yCol).cast("decimal(38,0)"))),
        lit(0).cast("decimal(38,0)"))
    val j = rows.agg(
      n("a", "post").as("n_ap"), s("a", "post").as("s_ap"),
      n("a", "pre").as("n_aq"), s("a", "pre").as("s_aq"),
      n("b", "post").as("n_bp"), s("b", "post").as("s_bp"),
      n("b", "pre").as("n_bq"), s("b", "pre").as("s_bq"))
    // common denominator n_ap·n_aq·n_bp·n_bq; numerator = Σ ±S·(other
    // three n's) — exact in decimal(38,0) up to ~10⁹-row cells
    val den = col("n_ap").cast("decimal(38,0)") * col("n_aq") *
      col("n_bp") * col("n_bq")
    val num =
      col("s_ap") * col("n_aq") * col("n_bp") * col("n_bq") -
      col("s_aq") * col("n_ap") * col("n_bp") * col("n_bq") -
      col("s_bp") * col("n_ap") * col("n_aq") * col("n_bq") +
      col("s_bq") * col("n_ap") * col("n_aq") * col("n_bp")
    j.select(col("n_ap"), col("n_aq"), col("n_bp"), col("n_bq"),
      when(col("n_ap") > 0 && col("n_aq") > 0 && col("n_bp") > 0 &&
        col("n_bq") > 0,
        Agreement.floorDiv(num * lit(1000000), den).cast("long"))
        .as("did_micro"))
  }

  // ---- fixtures: the q_m48 panel (per-user pre/post milli value) -----

  private def panel(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = Tables.events(s, d)
    ev.groupBy("user_id").agg(
      sum(when(col("ts") < to_timestamp(lit("2024-01-16 00:00:00")),
        floor(col("value") * 1000).cast("long")).otherwise(0L)).as("pre"),
      sum(when(col("ts") >= to_timestamp(lit("2024-01-16 00:00:00")),
        floor(col("value") * 1000).cast("long")).otherwise(0L)).as("post"))
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "a").otherwise("b"))
  }

  private val panelSql =
    """SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
           THEN CAST(FLOOR(value * 1000) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
           THEN CAST(FLOOR(value * 1000) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS post,
         CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm
       FROM events GROUP BY user_id"""

  /** q_m68_qte: experiment-period per-user value quantiles, arm a minus
    * arm b at the 10/25/50/75/90th percentiles. */
  private val mQte = Q(
    (s, d) => quantileTreatmentEffects(
      panel(s, d).select(col("arm"), col("post").as("y")), "arm", "y")
      .orderBy("pct"),
    Some(s"""WITH u AS ($panelSql),
            cnt AS (SELECT arm, post AS v, CAST(COUNT(*) AS BIGINT) AS c
              FROM u GROUP BY 1, 2),
            cum AS (SELECT arm, v, c,
                CAST(SUM(c) OVER (PARTITION BY arm ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
              FROM cnt),
            tot AS (SELECT arm, CAST(SUM(c) AS BIGINT) AS n
              FROM cnt GROUP BY 1),
            p(pct) AS (VALUES (10), (25), (50), (75), (90)),
            r AS (SELECT cum.arm, p.pct,
                MIN(CASE WHEN cum.cum >= (tot.n * p.pct + 99) // 100
                    THEN cum.v END) AS q
              FROM cum JOIN tot ON tot.arm = cum.arm CROSS JOIN p
              GROUP BY 1, 2)
            SELECT CAST(a.pct AS BIGINT) AS pct, a.q AS ya, b.q AS yb,
              a.q - b.q AS qte
            FROM (SELECT * FROM r WHERE arm = 'a') a
            JOIN (SELECT * FROM r WHERE arm = 'b') b ON a.pct = b.pct
            ORDER BY pct"""))

  /** q_m69_did: difference-in-differences of per-user milli value, pre
    * vs post Jan 16, arms by parity — the parallel-trends estimate next
    * to q_m48's CUPED adjustment. */
  private val mDid = Q(
    (s, d) => {
      val p = panel(s, d)
      val tall = p.select(col("arm"), lit("pre").as("period"),
          col("pre").as("y"))
        .unionByName(p.select(col("arm"), lit("post").as("period"),
          col("post").as("y")))
      diffInDiff(tall, "arm", "period", "y")
    },
    Some(s"""WITH u AS ($panelSql),
            tall AS (SELECT arm, 'pre' AS period, pre AS y FROM u
                     UNION ALL
                     SELECT arm, 'post', post FROM u),
            cells AS (SELECT arm, period, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(y AS HUGEINT)) AS s
              FROM tall GROUP BY 1, 2),
            w AS (SELECT
                COALESCE((SELECT n FROM cells
                  WHERE arm='a' AND period='post'), 0) AS n_ap,
                COALESCE((SELECT s FROM cells
                  WHERE arm='a' AND period='post'), 0) AS s_ap,
                COALESCE((SELECT n FROM cells
                  WHERE arm='a' AND period='pre'), 0) AS n_aq,
                COALESCE((SELECT s FROM cells
                  WHERE arm='a' AND period='pre'), 0) AS s_aq,
                COALESCE((SELECT n FROM cells
                  WHERE arm='b' AND period='post'), 0) AS n_bp,
                COALESCE((SELECT s FROM cells
                  WHERE arm='b' AND period='post'), 0) AS s_bp,
                COALESCE((SELECT n FROM cells
                  WHERE arm='b' AND period='pre'), 0) AS n_bq,
                COALESCE((SELECT s FROM cells
                  WHERE arm='b' AND period='pre'), 0) AS s_bq),
            f AS (SELECT *,
                (s_ap * n_aq * n_bp * n_bq
                 - s_aq * CAST(n_ap AS HUGEINT) * n_bp * n_bq
                 - s_bp * CAST(n_ap AS HUGEINT) * n_aq * n_bq
                 + s_bq * CAST(n_ap AS HUGEINT) * n_aq * n_bp) * 1000000
                  AS num,
                CAST(n_ap AS HUGEINT) * n_aq * n_bp * n_bq AS den
              FROM w)
            SELECT n_ap, n_aq, n_bp, n_bq,
              CASE WHEN n_ap > 0 AND n_aq > 0 AND n_bp > 0 AND n_bq > 0
                THEN CAST((num - ((num % den) + den) % den) // den
                  AS BIGINT) END AS did_micro
            FROM f"""))

  val queries: Map[String, Q] = Map(
    "q_m68_qte" -> mQte, "q_m69_did" -> mDid)
}
