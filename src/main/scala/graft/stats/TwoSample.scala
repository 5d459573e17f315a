package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution tests — Kolmogorov–Smirnov (drift) and
  * Mann–Whitney U (rank shift) — the distribution-level sisters of the
  * mean-level [[Anova]]: a corpus pipeline asks not only "did the mean
  * move?" but "did the DISTRIBUTION move?" (quality-score drift between
  * crawl snapshots, doc-length drift between sources, latency drift
  * between releases). KS answers with the maximum ECDF gap, MWU with the
  * tie-corrected rank statistic — both here computed EXACTLY in integer
  * arithmetic from one shared aggregation.
  *
  * Scale shape: the only data-scale pass is one map-side-combined
  * `groupBy(variable, value)` producing per-value counts for both
  * samples. Everything downstream — cumulative ECDFs, rank sums, tie
  * terms — runs over DISTINCT VALUES per variable, which for the
  * quantized metrics a pipeline monitors (cents, token counts, integer
  * scores) is bounded by value cardinality, not row count; for genuinely
  * continuous unbounded metrics, quantize first (the standard binned-KS
  * move — one `div` on the way in). The per-variable window therefore
  * orders a counts table, never rows.
  *
  * Cross-engine determinism: counts and cumulative counts are exact
  * longs, so the KS numerator `max |n_b·cumA − n_a·cumB|` and the MWU
  * statistics (doubled rank sum, tie term) are bit-exact integers on
  * any engine; the single float step (MWU's z against the normal
  * approximation) is computed from those exact integers with an
  * identical expression tree in both engines and FLOORED to micro-units
  * (floor of identical IEEE doubles is engine-independent; `round`'s
  * decimal-string semantics are not). The cross-products (KS's
  * `n_b·cum_a`, `d_num·1e6`, MWU's rank/tie sums) run in decimal(38,0)
  * (oracle: HUGEINT), so no sample size silently wraps a long — only
  * the final OUTPUT columns narrow back to bigint, where a decimal→long
  * overflow surfaces as null (visible), never as a wrong value. */
object TwoSample {

  /** Shared per-(variable, value) sample counts: `ca`/`cb` = occurrences
    * of the value in sample a / b. THE data pass; map-side partial
    * aggregation, no window, no join. */
  private def valueCounts(rows: DataFrame, varCol: String, grpCol: String,
      valCol: String): DataFrame =
    rows.groupBy(col(varCol).as("__var"), col(valCol).as("__v"))
      .agg(sum(when(col(grpCol) === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col(grpCol) === "b", 1L).otherwise(0L)).as("cb"))

  private def totals(cnt: DataFrame): DataFrame =
    cnt.groupBy("__var").agg(sum("ca").as("na"), sum("cb").as("nb"))

  /** In-variable cumulative window over distinct values — total order
    * (values are distinct after [[valueCounts]]), explicit ROWS frame. */
  private def cumWindow = Window.partitionBy("__var").orderBy("__v")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Two-sample Kolmogorov–Smirnov per variable over rows tagged
    * (variable, grp ∈ {a,b}, value). Output per variable: sample sizes,
    * the exact integer ECDF-gap numerator `d_num` (D = d_num/(na·nb)),
    * and `d_micro` = floor(D·1e6). */
  def ks(rows: DataFrame, varCol: String, grpCol: String,
      valCol: String): DataFrame =
    ksFromCounts(valueCounts(rows, varCol, grpCol, valCol))

  /** KS between a live sample and a FROZEN reference counts table
    * (value, count) — the drift-monitoring form: the reference
    * distribution is aggregated ONCE (at train/launch time) and
    * persisted; each comparison aggregates only the new sample and
    * joins the counts, so a micro-batch gate costs |batch| + |distinct
    * reference values|, never a rescan of the reference data. Rides the
    * streaming battery via foreachBatch (StreamsSpec). */
  def ksVsReference(sample: DataFrame, valCol: String,
      refCounts: DataFrame, refValCol: String, refCntCol: String)
      : DataFrame = {
    val a = sample.groupBy(col(valCol).as("__v"))
      .agg(count(lit(1)).as("ca"))
    val b = refCounts.select(col(refValCol).as("__v"),
      col(refCntCol).cast("long").as("cb"))
    ksFromCounts(a.join(b, Seq("__v"), "full_outer")
      .select(lit("drift").as("__var"), col("__v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")))
  }

  private def ksFromCounts(cnt: DataFrame): DataFrame = {
    cnt
      .withColumn("cuma", sum("ca").over(cumWindow))
      .withColumn("cumb", sum("cb").over(cumWindow))
      .join(broadcast(totals(cnt)), Seq("__var"))
      // decimal(38,0) cross-products: no long wraparound at any n
      .withColumn("__d",
        abs(col("nb").cast("decimal(38,0)") * col("cuma") -
          col("na").cast("decimal(38,0)") * col("cumb")))
      .groupBy(col("__var"), col("na"), col("nb"))
      .agg(max("__d").as("__dnum"))
      .select(col("__var").as("variable"), col("na"), col("nb"),
        col("__dnum").cast("long").as("d_num"),
        expr("""cast((__dnum * 1000000)
              div (cast(na as decimal(38,0)) * nb) as long)""")
          .as("d_micro"))
  }

  /** Two-sample Mann–Whitney U (average-rank ties, tie-corrected normal
    * z) over the same tagged-row shape. Emits exact integers —
    * `u2` = 2·U_a (doubled so average ranks at ties stay integral) and
    * the tie term Σ(t³−t) — plus `z_micro` = floor(z·1e6) against the
    * normal approximation; degenerate variables (every value identical →
    * zero variance) report null z. */
  def mannWhitney(rows: DataFrame, varCol: String, grpCol: String,
      valCol: String): DataFrame = {
    val cnt = valueCounts(rows, varCol, grpCol, valCol)
      .withColumn("c", col("ca") + col("cb"))
    val agg = cnt
      // exclusive cumulative total count = ranks preceding this value
      .withColumn("cumx", sum("c").over(cumWindow) - col("c"))
      .groupBy("__var")
      // 2·R_a = Σ ca·(2·preceding + t + 1): each tied value contributes
      // its average rank (preceding + (t+1)/2), doubled to stay integral
      .agg(sum(col("ca").cast("decimal(38,0)") *
          (col("cumx") * 2 + col("c") + 1)).as("r2a"),
        sum(col("c").cast("decimal(38,0)") * col("c") * col("c") - col("c"))
          .as("tie"))
      .join(broadcast(totals(cnt)), Seq("__var"))
      .withColumn("u2",
        col("r2a") - col("na").cast("decimal(38,0)") * (col("na") + 1))
      .withColumn("n", col("na") + col("nb"))
    // the one float computation, identical tree in the oracle SQL:
    // z = ((2U − na·nb)/2) / sqrt(na·nb/12 · ((n+1) − tie/(n(n−1))))
    val dna = col("na").cast("double")
    val dnb = col("nb").cast("double")
    val dn = col("n").cast("double")
    val varTerm = dna * dnb / lit(12.0) *
      ((dn + lit(1.0)) - col("tie").cast("double") / (dn * (dn - lit(1.0))))
    val z = (col("u2").cast("double") - dna * dnb) / lit(2.0) /
      sqrt(varTerm)
    agg.select(col("__var").as("variable"), col("na"), col("nb"),
      col("u2").cast("long").as("u2"), col("tie").cast("long").as("tie"),
      when(varTerm > 0, floor(z * lit(1e6))).as("z_micro"))
  }

  /** The registered drift workload: four (variable, sample-pair) slices
    * across all four fact tables, values as exact integer cents /
    * counts. */
  private def workload(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val docs = Tables.documents(s, d)
    val li = Tables.lineitem(s, d)
    val ev = Tables.events(s, d)
    def slice(v: String, df: DataFrame, grpExpr: Column, valExpr: Column) =
      df.select(lit(v).as("v"), grpExpr.as("g"), valExpr.as("x"))
        .filter(col("g").isNotNull && col("x").isNotNull)
    slice("acctbal_bld_mach", cust,
        when(col("c_mktsegment") === "BUILDING", "a")
          .when(col("c_mktsegment") === "MACHINERY", "b"),
        Anova.cents(col("c_acctbal")))
      .unionAll(slice("nchars_en_zh", docs,
        when(col("lang") === "en", "a").when(col("lang") === "zh", "b"),
        col("n_chars")))
      .unionAll(slice("quantity_A_R", li,
        when(col("l_returnflag") === "A", "a")
          .when(col("l_returnflag") === "R", "b"),
        Anova.cents(col("l_quantity"))))
      .unionAll(slice("value_click_purchase", ev,
        when(col("event_type") === "click", "a")
          .when(col("event_type") === "purchase", "b"),
        Anova.cents(col("value"))))
  }

  private val oracleRows = """rows0 AS (
              SELECT 'acctbal_bld_mach' AS v,
                     CASE WHEN c_mktsegment = 'BUILDING' THEN 'a'
                          WHEN c_mktsegment = 'MACHINERY' THEN 'b' END AS g,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS x
              FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
              UNION ALL
              SELECT 'nchars_en_zh',
                     CASE WHEN lang = 'en' THEN 'a'
                          WHEN lang = 'zh' THEN 'b' END,
                     n_chars
              FROM documents WHERE lang IN ('en', 'zh')
              UNION ALL
              SELECT 'quantity_A_R',
                     CASE WHEN l_returnflag = 'A' THEN 'a'
                          WHEN l_returnflag = 'R' THEN 'b' END,
                     CAST(round(l_quantity * 100) AS BIGINT)
              FROM lineitem WHERE l_returnflag IN ('A', 'R')
              UNION ALL
              SELECT 'value_click_purchase',
                     CASE WHEN event_type = 'click' THEN 'a'
                          WHEN event_type = 'purchase' THEN 'b' END,
                     CAST(round(value * 100) AS BIGINT)
              FROM events
              WHERE event_type IN ('click', 'purchase')
                AND value IS NOT NULL),
            cnt AS (SELECT v, x,
                CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                CAST(SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
              FROM rows0 GROUP BY 1, 2),
            tot AS (SELECT v, CAST(SUM(ca) AS BIGINT) AS na,
                CAST(SUM(cb) AS BIGINT) AS nb
              FROM cnt GROUP BY 1)"""

  private val mKs = Q(
    (s, d) => ks(workload(s, d), "v", "g", "x").orderBy("variable"),
    Some(s"""WITH $oracleRows,
            cum AS (SELECT v, x, ca, cb,
                CAST(SUM(ca) OVER (PARTITION BY v ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cuma,
                CAST(SUM(cb) OVER (PARTITION BY v ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumb
              FROM cnt)
            SELECT cum.v AS variable, tot.na, tot.nb,
                   CAST(MAX(abs(CAST(tot.nb AS HUGEINT) * cum.cuma
                       - CAST(tot.na AS HUGEINT) * cum.cumb))
                     AS BIGINT) AS d_num,
                   CAST(MAX(abs(CAST(tot.nb AS HUGEINT) * cum.cuma
                       - CAST(tot.na AS HUGEINT) * cum.cumb))
                     * 1000000 // (CAST(tot.na AS HUGEINT) * tot.nb)
                     AS BIGINT) AS d_micro
            FROM cum JOIN tot ON cum.v = tot.v
            GROUP BY 1, 2, 3 ORDER BY variable"""))

  private val mMwu = Q(
    (s, d) => mannWhitney(workload(s, d), "v", "g", "x")
      .orderBy("variable"),
    Some(s"""WITH $oracleRows,
            cum AS (SELECT v, x, ca, cb, ca + cb AS c,
                CAST(SUM(ca + cb) OVER (PARTITION BY v ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - (ca + cb) AS cumx
              FROM cnt),
            agg AS (SELECT v,
                SUM(CAST(ca AS HUGEINT) * (cumx * 2 + c + 1)) AS r2a,
                SUM(CAST(c AS HUGEINT) * c * c - c) AS tie
              FROM cum GROUP BY 1),
            fin AS (SELECT agg.v, tot.na, tot.nb,
                agg.r2a - CAST(tot.na AS HUGEINT) * (tot.na + 1) AS u2,
                CAST(agg.tie AS BIGINT) AS tie,
                tot.na + tot.nb AS n
              FROM agg JOIN tot ON agg.v = tot.v)
            SELECT v AS variable, na, nb, CAST(u2 AS BIGINT) AS u2, tie,
                   CASE WHEN CAST(na AS DOUBLE) * nb / 12.0 *
                       ((CAST(n AS DOUBLE) + 1.0) - CAST(tie AS DOUBLE)
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                       > 0
                     THEN CAST(floor(
                       (CAST(u2 AS DOUBLE) - CAST(na AS DOUBLE) * nb) / 2.0
                       / sqrt(CAST(na AS DOUBLE) * nb / 12.0 *
                         ((CAST(n AS DOUBLE) + 1.0) - CAST(tie AS DOUBLE)
                           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
                       * 1000000.0) AS BIGINT)
                   END AS z_micro
            FROM fin ORDER BY variable"""))

  /** Two-proportion z-test (pooled) — the A/B conversion read-out next
    * to the distribution tests: per variant the USER-level conversion
    * counts (one groupBy(user) collapse, then conditional sums — two
    * map-side passes, output is one row), z from the pooled standard
    * error. Exact integer counts; the one float step is an identical
    * tree both engines, floored to micro. */
  def twoProportion(users: DataFrame, variantCol: String,
      convCol: String): DataFrame = {
    val agg = users.agg(
      sum(when(col(variantCol) === "a", 1L).otherwise(0L)).as("n1"),
      sum(when(col(variantCol) === "a" && col(convCol) === 1L, 1L)
        .otherwise(0L)).as("x1"),
      sum(when(col(variantCol) === "b", 1L).otherwise(0L)).as("n2"),
      sum(when(col(variantCol) === "b" && col(convCol) === 1L, 1L)
        .otherwise(0L)).as("x2"))
    val p1 = col("x1").cast("double") / col("n1")
    val p2 = col("x2").cast("double") / col("n2")
    val pp = (col("x1") + col("x2")).cast("double") /
      (col("n1") + col("n2"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
    agg.select(col("n1"), col("x1"), col("n2"), col("x2"),
      floor((p1 - p2) * lit(1e6)).cast("long").as("delta_micro"),
      when(pp > 0 && pp < 1,
        floor((p1 - p2) / se * lit(1e6)).cast("long")).as("z_micro"))
  }

  private val mAb = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .withColumn("variant",
          when(col("user_id") % 2 === 0, "a").otherwise("b"))
      twoProportion(users, "variant", "conv")
    },
    Some("""WITH u AS (SELECT user_id,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS conv,
                CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant
              FROM events GROUP BY 1),
            agg AS (SELECT
                CAST(SUM(CASE WHEN variant = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN variant = 'a' AND conv = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS x1,
                CAST(SUM(CASE WHEN variant = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
                CAST(SUM(CASE WHEN variant = 'b' AND conv = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS x2
              FROM u)
            SELECT n1, x1, n2, x2,
              CAST(floor((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                * 1000000.0) AS BIGINT) AS delta_micro,
              CASE WHEN CAST(x1 + x2 AS DOUBLE) / (n1 + n2) > 0
                    AND CAST(x1 + x2 AS DOUBLE) / (n1 + n2) < 1 THEN
                CAST(floor((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                  / sqrt(CAST(x1 + x2 AS DOUBLE) / (n1 + n2)
                    * (1e0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                    * (1e0 / n1 + 1e0 / n2)) * 1000000.0) AS BIGINT)
              END AS z_micro
            FROM agg"""))

  /** Cliff's delta / rank-biserial effect size (Cliff, Psych. Bull.
    * 1993) — the MAGNITUDE companion to q_m39's MWU decision:
    * δ = P(a>b) − P(a<b) = (2U_a − n_a·n_b)/(n_a·n_b) ∈ [−1, 1],
    * derived EXACTLY from the same doubled-U sufficient statistic
    * (ties contribute half to U and cancel in δ). Zero new floats:
    * one sign-safe pmod floor-division (δ is legitimately negative),
    * so the z-family's float step never enters the δ path. */
  def cliffsDelta(rows: DataFrame, varCol: String, grpCol: String,
      valCol: String): DataFrame =
    mannWhitney(rows, varCol, grpCol, valCol)
      .select(col("variable"), col("na"), col("nb"),
        Agreement.floorDiv(
          (col("u2").cast("decimal(38,0)")
            - col("na").cast("decimal(38,0)") * col("nb")) * 1000000L,
          col("na").cast("decimal(38,0)") * col("nb")).as("delta_micro"))

  private val mCliffs = Q(
    (s, d) => cliffsDelta(workload(s, d), "v", "g", "x")
      .orderBy("variable"),
    Some(s"""WITH $oracleRows,
            cum AS (SELECT v, x, ca, cb, ca + cb AS c,
                CAST(SUM(ca + cb) OVER (PARTITION BY v ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) - (ca + cb) AS cumx
              FROM cnt),
            agg AS (SELECT v,
                SUM(CAST(ca AS HUGEINT) * (cumx * 2 + c + 1)) AS r2a
              FROM cum GROUP BY 1),
            fin AS (SELECT agg.v, tot.na, tot.nb,
                (agg.r2a - CAST(tot.na AS HUGEINT) * (tot.na + 1)
                  - CAST(tot.na AS HUGEINT) * tot.nb) * 1000000 AS dnum,
                CAST(tot.na AS HUGEINT) * tot.nb AS dden
              FROM agg JOIN tot ON agg.v = tot.v)
            SELECT v AS variable, na, nb,
              CAST((dnum - ((dnum % dden) + dden) % dden) // dden
                AS BIGINT) AS delta_micro
            FROM fin ORDER BY variable"""))

  val queries: Map[String, Q] = Map(
    "q_m38_ks" -> mKs,
    "q_m39_mwu" -> mMwu,
    "q_m41_ab_test" -> mAb,
    "q_m80_cliffs_delta" -> mCliffs)
}
