package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonparametric monotone-trend testing per group — the Mann–Kendall
  * test (Mann 1945; Kendall, "Rank Correlation Methods") with the
  * Theil–Sen slope estimator (Theil 1950; Sen, JASA 1968): the
  * standard pair for "is this monitor drifting, and how fast?" on
  * pipeline health series (daily ingest volume, dedup rate, quality
  * mix). Unlike an OLS fit on time (q_m42), both are rank/median-based:
  * immune to outlier days and to any monotone transform of the level.
  * MK's S = Σ_{i<j} sgn(x_j − x_i) counts concordant minus discordant
  * time pairs; Theil–Sen's slope is the MEDIAN of all pairwise slopes.
  *
  * Exactness: S, n and the tie-corrected variance numerator
  * `var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)` (= 18·Var(S)) are pure
  * integers. The z statistic (continuity-corrected: S∓1) is the one
  * float step — computed from those exact integers with an identical
  * ÷/√ tree in both engines and FLOORED to micro (IEEE division and
  * sqrt are correctly rounded, so identical inputs give identical
  * bits; NUMERIC_CONVENTION rule 2). Per-pair slopes are floored to
  * integer micro-units FIRST ([[Agreement.floorDiv]] — negative slopes
  * floor identically cross-engine), then the reported Theil–Sen slope
  * is the LOWER MEDIAN of those integers — order-statistic of an
  * integer multiset, engine-free.
  *
  * Scale shape: the data-scale pass is the per-(group, bucket)
  * aggregation building the series — map-side combined. The pairwise
  * self-join runs over SERIES points (calendar-bounded: a year of
  * daily buckets is 365 rows/group → ~66k pairs), never raw rows; the
  * median window partitions by group over those bounded pairs. MK on
  * an unbounded series would be quadratic — aggregate to buckets
  * first, which is also the statistically honest unit (within-bucket
  * order is noise, not trend). */
object TrendTest {

  /** Mann–Kendall S, tie-corrected variance and continuity-corrected
    * z, plus the Theil–Sen lower-median slope, per group over series
    * rows (group, t, x) with t unique within group. Output:
    * (group, n, s, var18, z_micro, sen_micro); z is null when the
    * series is constant (var18 = 0), sen in x-units-per-t micro. */
  def mannKendall(series: DataFrame, grpCol: String, tCol: String,
      xCol: String): DataFrame = {
    val pts = series.select(col(grpCol).as("__g"),
      col(tCol).cast("long").as("__t"), col(xCol).cast("long").as("__x"))
    val a = pts.select(col("__g"), col("__t").as("ta"), col("__x").as("xa"))
    val b = pts.select(col("__g"), col("__t").as("tb"), col("__x").as("xb"))
    val pairs = a.join(b, Seq("__g")).filter(col("ta") < col("tb"))
      .select(col("__g"),
        signum(col("xb") - col("xa")).cast("long").as("sgn"),
        Agreement.floorDiv((col("xb") - col("xa")) * lit(1000000L),
          col("tb") - col("ta")).as("slope_micro"))
    val sAgg = pairs.groupBy("__g").agg(sum("sgn").as("s"),
      count(lit(1)).as("n_pairs"))
    // lower median of the integer micro-slopes: value at position
    // ⌈n_pairs/2⌉ in ascending order — an order statistic, so the
    // row_number tiebreak among equal slopes cannot change the value
    val med = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("__g").orderBy("slope_micro")).cast("long"))
      .join(broadcast(sAgg.select(col("__g"), col("n_pairs"))), Seq("__g"))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("__g"), col("slope_micro").as("sen_micro"))
    val nPer = pts.groupBy("__g").agg(count(lit(1)).as("n"))
    val ties = pts.groupBy("__g", "__x").agg(count(lit(1)).as("t"))
      .groupBy("__g")
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tt"))
    nPer.join(ties, Seq("__g")).join(sAgg, Seq("__g"))
      .join(med, Seq("__g"), "left")
      .withColumn("var18",
        col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tt"))
      .select(col("__g").as("group"), col("n"), col("s"), col("var18"),
        when(col("var18") <= 0, lit(null).cast("long"))
          .otherwise(floor(
            (col("s").cast("double") - signum(col("s")).cast("double")) /
              sqrt(col("var18").cast("double") / lit(18.0)) * lit(1e6))
            .cast("long"))
          .as("z_micro"),
        col("sen_micro"))
  }

  /** q_m58_mann_kendall: daily event-count trend per event type — the
    * "is traffic drifting?" monitor. Series = one bucket per (type,
    * epoch day); the oracle replays pairs, ties, the z tree and the
    * lower-median slope identically. */
  private val mTrend = Q(
    (s, d) => mannKendall(
      Tables.events(s, d).groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "day", "cnt")
      .withColumnRenamed("group", "event_type")
      .orderBy("event_type"),
    Some("""WITH series AS (SELECT event_type,
                CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
            pairs AS (SELECT a.event_type,
                CAST(CASE WHEN b.x > a.x THEN 1
                          WHEN b.x < a.x THEN -1 ELSE 0 END AS BIGINT)
                  AS sgn,
                -- explicit floor division (slopes go negative; DuckDB //
                -- truncates toward zero there): a − pmod(a,b) is exactly
                -- divisible, so // recovers the exact floor quotient
                CAST(((b.x - a.x) * 1000000
                      - ((((b.x - a.x) * 1000000) % (b.t - a.t))
                         + (b.t - a.t)) % (b.t - a.t))
                     // (b.t - a.t) AS BIGINT) AS slope_micro
              FROM series a JOIN series b
                ON a.event_type = b.event_type AND a.t < b.t),
            sagg AS (SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n_pairs
              FROM pairs GROUP BY 1),
            med AS (SELECT event_type, slope_micro AS sen_micro FROM
              (SELECT event_type, slope_micro,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY slope_micro) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS np
                FROM pairs)
              WHERE rn = (np + 1) // 2),
            n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM series GROUP BY 1),
            ties AS (SELECT event_type,
                CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tt
              FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
                    FROM series GROUP BY 1, 2) GROUP BY 1)
            SELECT n.event_type, n.n, sagg.s,
              n.n * (n.n - 1) * (n.n * 2 + 5) - ties.tt AS var18,
              CASE WHEN n.n * (n.n - 1) * (n.n * 2 + 5) - ties.tt <= 0
                THEN NULL
                ELSE CAST(floor(
                  (CAST(sagg.s AS DOUBLE) - CAST(CASE WHEN sagg.s > 0 THEN 1
                     WHEN sagg.s < 0 THEN -1 ELSE 0 END AS DOUBLE))
                  / sqrt(CAST(n.n * (n.n - 1) * (n.n * 2 + 5) - ties.tt
                         AS DOUBLE) / 18.0) * 1e6) AS BIGINT)
              END AS z_micro,
              med.sen_micro
            FROM n JOIN ties USING (event_type)
              JOIN sagg USING (event_type)
              LEFT JOIN med USING (event_type)
            ORDER BY event_type"""))

  val queries: Map[String, Q] = Map("q_m58_mann_kendall" -> mTrend)
}
