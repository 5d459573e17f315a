package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B design-quality diagnostics — the two standard checks BEFORE
  * trusting a treatment read-out (q_m41 z-test, q_m48 CUPED):
  *
  * **Covariate balance by standardized mean difference** (Rosenbaum &
  * Rubin 1985; Austin, Stat.Med. 2009): for each PRE-treatment
  * covariate, SMD = (x̄_a − x̄_b) / √((s²_a + s²_b)/2). Randomization
  * that worked leaves |SMD| ≲ 0.1 on every covariate; a larger value
  * means the arms differ before treatment and the raw diff is
  * confounded. This is the assignment sanity gate experimentation
  * platforms run automatically.
  *
  * **Post-stratified treatment effect** (Miratrix-Sekhon-Yu JRSS-B
  * 2013): τ̂ = Σ_g (n_g/n)(ȳ_ag − ȳ_bg) over pre-treatment strata —
  * removes between-stratum variance like blocking would have, after
  * the fact. The CUPED alternative when the pre-signal is CATEGORICAL
  * (acquisition channel, cohort) rather than a numeric covariate.
  *
  * Determinism: all sufficient statistics (n, Σx, Σx² per arm/stratum)
  * are exact integers in decimal(38,0)/HUGEINT. SMD's ratio is the one
  * float step — an identical ÷/√ tree over those exact integers,
  * floored to micro (the MWU-z pattern); degenerate variance → null.
  * Post-stratification is exact-rational: per-stratum mean gaps clear
  * denominators through the [[Agreement.floorDiv]] pmod form (gaps go
  * negative), and the weighted total recombines those per-stratum
  * micro gaps with integer weights — the per-stratum floor IS the
  * estimator definition here, stated, not hidden.
  *
  * Scale shape: SMD is ONE map-side groupBy(variable, arm) pass over
  * per-user covariate rows; post-stratification is one groupBy(user)
  * collapse, one first-event window (user-keyed), and a
  * (stratum, arm) cells aggregation — nothing joins event rows. */
object AbDesign {

  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-covariate SMD over tall rows (variable, arm ∈ {a,b}, x:
    * integer). Output: (variable, na, nb, dmean_micro, smd_micro). */
  def smdBalance(rows: DataFrame, varCol: String, armCol: String,
      xCol: String): DataFrame = {
    val x = d38(col(xCol))
    val cells = rows.groupBy(col(varCol).as("variable"),
        col(armCol).as("__g"))
      .agg(count(lit(1)).as("n"), sum(x).as("s"), sum(x * x).as("ss"))
    val a = cells.filter(col("__g") === "a")
      .select(col("variable"), col("n").as("na"), col("s").as("sa"),
        col("ss").as("ssa"))
    val b = cells.filter(col("__g") === "b")
      .select(col("variable"), col("n").as("nb"), col("s").as("sb"),
        col("ss").as("ssb"))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def svar(n: Column, s: Column, ss: Column) =
      (n.cast("double") * ss.cast("double") -
        s.cast("double") * s.cast("double")) /
        (n.cast("double") * (n.cast("double") - lit(1.0)))
    val pooled = (svar(col("na"), col("sa"), col("ssa")) +
      svar(col("nb"), col("sb"), col("ssb"))) / lit(2.0)
    a.join(b, Seq("variable"))
      .select(col("variable"), col("na"), col("nb"),
        floor((mean(col("sa"), col("na")) - mean(col("sb"), col("nb")))
          * lit(1e6)).cast("long").as("dmean_micro"),
        when(col("na") > 1 && col("nb") > 1 && pooled > 0,
          floor((mean(col("sa"), col("na")) - mean(col("sb"), col("nb")))
            / sqrt(pooled) * lit(1e6)).cast("long"))
          .as("smd_micro"))
  }

  /** Post-stratified effect over per-user rows (stratum, arm, y:
    * integer). Per-stratum rows plus a '__total' row; strata missing an
    * arm emit null diffs and are excluded from the total (standard —
    * they carry no within-stratum contrast). */
  def postStratEffect(users: DataFrame, stratumCol: String,
      armCol: String, yCol: String): DataFrame = {
    val cells = users.groupBy(col(stratumCol).as("stratum"),
        col(armCol).as("__g"))
      .agg(count(lit(1)).as("n"), sum(d38(col(yCol))).as("s"))
    val a = cells.filter(col("__g") === "a")
      .select(col("stratum"), col("n").as("na"), col("s").as("sa"))
    val b = cells.filter(col("__g") === "b")
      .select(col("stratum"), col("n").as("nb"), col("s").as("sb"))
    val strata = a.join(b, Seq("stratum"), "full_outer")
      .select(col("stratum"),
        (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)))
          .as("n"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        when(col("na") > 0 && col("nb") > 0,
          Agreement.floorDiv(
            (col("sa") * col("nb") - col("sb") * col("na")) * lit(1000000),
            d38(col("na")) * col("nb")).cast("long"))
          .as("diff_micro"))
    val total = strata.filter(col("diff_micro").isNotNull)
      .agg(sum("n").as("n"), sum("na").as("na"), sum("nb").as("nb"),
        Agreement.floorDiv(
          sum(col("n").cast("decimal(38,0)") * col("diff_micro")),
          sum(col("n").cast("decimal(38,0)"))).cast("long")
          .as("diff_micro"))
      .select(lit("__total").as("stratum"), col("n"), col("na"),
        col("nb"), col("diff_micro"))
    strata.unionByName(total)
  }

  // ---- fixtures: the q_m48 pre/experiment split over events ----------

  /** q_m63_smd: pre-period per-user covariates (event count, milli value
    * sum) balanced across the parity arms — the randomization check the
    * q_m41/q_m48 read-outs assume. */
  private val mSmd = Q(
    (s, d) => {
      val pre = Tables.events(s, d)
        .filter(col("ts") < to_timestamp(lit("2024-01-16 00:00:00")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("pre_cnt"),
          sum(floor(col("value") * 1000).cast("long")).as("pre_milli"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "a").otherwise("b"))
      val tall = pre.select(col("arm"), lit("pre_cnt").as("v"),
          col("pre_cnt").as("x"))
        .unionByName(pre.select(col("arm"), lit("pre_milli").as("v"),
          col("pre_milli").as("x")))
      smdBalance(tall, "v", "arm", "x").orderBy("variable")
    },
    Some("""WITH pre AS (SELECT user_id,
                CAST(COUNT(*) AS BIGINT) AS pre_cnt,
                CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                  AS pre_milli,
                CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm
              FROM events WHERE ts < TIMESTAMP '2024-01-16'
              GROUP BY user_id),
            tall AS (SELECT arm, 'pre_cnt' AS variable, pre_cnt AS x
                     FROM pre
                     UNION ALL
                     SELECT arm, 'pre_milli', pre_milli FROM pre),
            cells AS (SELECT variable, arm,
                CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(x AS HUGEINT)) AS s,
                SUM(CAST(x AS HUGEINT) * x) AS ss
              FROM tall GROUP BY 1, 2),
            w AS (SELECT a.variable, a.n AS na, b.n AS nb,
                CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                  - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS dmean,
                ((CAST(a.n AS DOUBLE) * CAST(a.ss AS DOUBLE)
                    - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
                  / (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0))
                 + (CAST(b.n AS DOUBLE) * CAST(b.ss AS DOUBLE)
                    - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
                  / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1.0)))
                / 2.0 AS pooled
              FROM (SELECT * FROM cells WHERE arm = 'a') a
              JOIN (SELECT * FROM cells WHERE arm = 'b') b
                ON a.variable = b.variable)
            SELECT variable, na, nb,
              CAST(FLOOR(dmean * 1000000.0) AS BIGINT) AS dmean_micro,
              CASE WHEN na > 1 AND nb > 1 AND pooled > 0
                THEN CAST(FLOOR(dmean / sqrt(pooled) * 1000000.0)
                  AS BIGINT) END AS smd_micro
            FROM w ORDER BY variable"""))

  /** q_m64_poststrat: experiment-period per-user value stratified by the
    * user's FIRST event type (the acquisition-channel stand-in — fixed
    * before treatment), arms by parity. The oracle replays the
    * first-event window, the exact-rational per-stratum gaps and the
    * integer-weighted total. */
  private val mPs = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val firstW = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val first = ev.withColumn("__rn", row_number().over(firstW))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_type").as("stratum"))
      val y = ev
        .filter(col("ts") >= to_timestamp(lit("2024-01-16 00:00:00")))
        .groupBy("user_id")
        .agg(sum(floor(col("value") * 1000).cast("long")).as("y"))
      val users = first.join(y, Seq("user_id"), "left")
        .select(col("stratum"),
          when(col("user_id") % 2 === 0, "a").otherwise("b").as("arm"),
          coalesce(col("y"), lit(0L)).as("y"))
      postStratEffect(users, "stratum", "arm", "y").orderBy("stratum")
    },
    Some("""WITH first AS (SELECT user_id, event_type AS stratum
              FROM (SELECT user_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS rn
                    FROM events)
              WHERE rn = 1),
            y AS (SELECT user_id,
                CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                  AS y
              FROM events WHERE ts >= TIMESTAMP '2024-01-16'
              GROUP BY user_id),
            u AS (SELECT f.stratum,
                CASE WHEN f.user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                COALESCE(y.y, 0) AS y
              FROM first f LEFT JOIN y ON y.user_id = f.user_id),
            cells AS (SELECT stratum, arm, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(CAST(y AS HUGEINT)) AS s
              FROM u GROUP BY 1, 2),
            st AS (SELECT COALESCE(a.stratum, b.stratum) AS stratum,
                COALESCE(a.n, 0) + COALESCE(b.n, 0) AS n,
                COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb,
                CASE WHEN COALESCE(a.n, 0) > 0 AND COALESCE(b.n, 0) > 0
                  THEN CAST(((a.s * b.n - b.s * a.n) * 1000000
                    - ((((a.s * b.n - b.s * a.n) * 1000000)
                        % (CAST(a.n AS HUGEINT) * b.n))
                       + CAST(a.n AS HUGEINT) * b.n)
                      % (CAST(a.n AS HUGEINT) * b.n))
                    // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT)
                END AS diff_micro
              FROM (SELECT * FROM cells WHERE arm = 'a') a
              FULL OUTER JOIN (SELECT * FROM cells WHERE arm = 'b') b
                ON a.stratum = b.stratum),
            tot AS (SELECT '__total' AS stratum,
                CAST(SUM(n) AS BIGINT) AS n,
                CAST(SUM(na) AS BIGINT) AS na,
                CAST(SUM(nb) AS BIGINT) AS nb,
                CAST((SUM(CAST(n AS HUGEINT) * diff_micro)
                  - ((SUM(CAST(n AS HUGEINT) * diff_micro)
                      % SUM(CAST(n AS HUGEINT)))
                     + SUM(CAST(n AS HUGEINT)))
                    % SUM(CAST(n AS HUGEINT)))
                  // SUM(CAST(n AS HUGEINT)) AS BIGINT) AS diff_micro
              FROM st WHERE diff_micro IS NOT NULL)
            SELECT stratum, CAST(n AS BIGINT) AS n,
              CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
              diff_micro
            FROM (SELECT * FROM st UNION ALL SELECT * FROM tot)
            ORDER BY stratum"""))

  val queries: Map[String, Q] = Map(
    "q_m63_smd" -> mSmd, "q_m64_poststrat" -> mPs)
}
