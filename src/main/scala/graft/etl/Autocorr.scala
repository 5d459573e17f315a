package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lag-k autocorrelation of daily series (the sample ACF; Box &
  * Jenkins, Time Series Analysis 1970) — the NUMERIC seasonality/
  * persistence detector behind the monitoring family's choices:
  * r₁ ≈ 0 says the EWMA/Holt smoothing is fighting noise, r₇ high
  * says the weekly profile (q_e_seasonal) is real and a 7-day lag is
  * the right baseline; both in one keyed pass per lag.
  *
  * Exactness (rule 1, zero floats): clearing the mean x̄ = S/n makes
  * the lag-k sample ACF exactly rational —
  *   num·n² = Σ_t (n·x_t − S)(n·x_{t+k} − S)   (over the n−k pairs)
  *   den·n² = Σ_t (n·x_t − S)²                 (over all n points)
  * so r_micro = pmodfloor(num·1e6, den) — one sign-safe division of
  * decimal(38,0)/HUGEINT products (num is legitimately negative).
  * Constant series (den = 0) → null. Missing days simply contribute
  * no pair at that lag (the t+k join is calendar-keyed); a (series,
  * lag) with NO pairs at all still emits its grid row with n_pairs =
  * 0 and null r_micro, so the output is always |series|·|lags| rows.
  *
  * Scale shape: ONE map-side (series, day) aggregation; per lag ONE
  * calendar-keyed self-join of day cells + a per-series reduce;
  * output is |series|·|lags| rows. */
object Autocorr {

  /** Per-series lag-k ACF over (serCol, tCol, xCol) points for each
    * lag in `lags`. Output: (series, lag, n_points, n_pairs,
    * r_micro). */
  def acf(points: DataFrame, serCol: String, tCol: String, xCol: String,
      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    val base = points.select(col(serCol).as("series"),
      col(tCol).cast("long").as("t"), col(xCol).cast("long").as("x"))
    val tot = base.groupBy("series")
      .agg(count(lit(1)).as("n"), sum(col("x").cast("decimal(38,0)")).as("s"))
    val cent = base.join(tot, Seq("series"))
      .select(col("series"), col("t"), col("n"),
        (col("n").cast("decimal(38,0)") * col("x") - col("s")).as("c"))
    val den = cent.groupBy("series")
      .agg(max("n").as("n_points"), sum(col("c") * col("c")).as("den"))
    val lagged = lags.map { k =>
      cent.as("a")
        .join(cent.select(col("series"), (col("t") - k).as("t"),
          col("c").as("c2")), Seq("series", "t"))
        .groupBy("series")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("c") * col("c2")).as("num"))
        .withColumn("lag", lit(k.toLong))
    }.reduce(_ unionByName _)
    // pair-less (series, lag) cells would vanish from the inner joins;
    // pin the full series × lags grid and left-join the pair stats back
    val grid = den.withColumn("lag",
      explode(array(lags.map(k => lit(k.toLong)): _*)))
    grid.join(lagged, Seq("series", "lag"), "left")
      .select(col("series"), col("lag"), col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("den") === 0 || col("n_pairs").isNull,
          lit(null).cast("long"))
          .otherwise(graft.stats.Agreement.floorDiv(
            col("num") * 1000000L, col("den"))).as("r_micro"))
      .orderBy("series", "lag")
  }

  /** q_e_autocorr: lag-1 persistence and the lag-7 weekly echo of each
    * event type's daily volume — the numeric justification for
    * q_e_seasonal's 7-day baseline. */
  private val eAcf = Q(
    (s, d) => acf(
      Tables.events(s, d)
        .groupBy(col("event_type").as("series"),
          expr("datediff(to_date(ts), date'1970-01-01')").as("t"))
        .agg(count(lit(1)).as("x")),
      "series", "t", "x", Seq(1, 7)),
    Some("""WITH pts AS (SELECT event_type AS series,
                date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
                CAST(COUNT(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2),
            tot AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS HUGEINT) AS s FROM pts GROUP BY 1),
            cent AS (SELECT p.series, p.t, tot.n,
                CAST(tot.n AS HUGEINT) * p.x - tot.s AS c
              FROM pts p JOIN tot ON p.series = tot.series),
            den AS (SELECT series, MAX(n) AS n_points,
                SUM(c * c) AS den FROM cent GROUP BY 1),
            lagged AS (
              SELECT a.series, CAST(1 AS BIGINT) AS lag,
                CAST(COUNT(*) AS BIGINT) AS n_pairs,
                SUM(a.c * b.c) AS num
              FROM cent a JOIN cent b
                ON a.series = b.series AND b.t = a.t + 1
              GROUP BY 1
              UNION ALL
              SELECT a.series, 7, CAST(COUNT(*) AS BIGINT),
                SUM(a.c * b.c)
              FROM cent a JOIN cent b
                ON a.series = b.series AND b.t = a.t + 7
              GROUP BY 1),
            grid AS (SELECT d.series, CAST(g.lag AS BIGINT) AS lag,
                d.n_points, d.den
              FROM den d CROSS JOIN (SELECT UNNEST([1, 7]) AS lag) g)
            SELECT g.series, g.lag, g.n_points,
              COALESCE(l.n_pairs, 0) AS n_pairs,
              CASE WHEN g.den = 0 OR l.n_pairs IS NULL THEN NULL
                ELSE CAST(((l.num * 1000000)
                  - (((l.num * 1000000) % g.den + g.den) % g.den))
                  // g.den AS BIGINT) END AS r_micro
            FROM grid g LEFT JOIN lagged l
              ON g.series = l.series AND g.lag = l.lag
            ORDER BY g.series, g.lag"""))

  val queries: Map[String, Q] = Map("q_e_autocorr" -> eAcf)
}
