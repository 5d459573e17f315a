package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` table — the operators a
  * product/behavioral pipeline runs at 100 TB: ordered funnels, cohort
  * retention, and inter-arrival statistics. The reference has no event
  * layer (its closest analog is the work-queue poll, assets.py:9-25);
  * these extend the engine's event-time family (q_e_*) beyond the
  * windowed/sessionize/as-of/range operators.
  *
  * Scale shape: every operator here shuffles ONLY on `user_id` (or
  * (user_id, event_type)) — the natural partitioning key of an event
  * store — and reduces to per-user scalars before any global step. The
  * funnel's per-step frames all share the user_id key, so AQE reuses the
  * exchange; nothing is ever joined on time alone or exploded.
  */
object EventAnalytics {

  private def us(c: Column): Column = unix_micros(c)

  /** Ordered conversion funnel: for each user, the earliest occurrence of
    * step 1; then the earliest occurrence of step 2 STRICTLY AFTER that;
    * and so on. Returns one row per step with the count of users who
    * reached it — the standard "signup → view → click → purchase" drop-off
    * curve. Strict ordering (not mere presence) is the part plain
    * conditional aggregation cannot express.
    *
    * Each stage is a keyed (user_id) aggregate of the previous stage's
    * survivors: step k is a filter + join(user_id) + min — at cluster
    * scale that is |users| rows of state per step, never a time-range
    * join. All four aggregates hash-partition on user_id.
    */
  def funnel(events: DataFrame, steps: Seq[String], userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    val base = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      us(col(tsCol)).as("m"))
    // reachedAt(k): (u, m_k) = earliest time user completed steps 0..k in order
    val first = base.filter(col("t") === steps.head)
      .groupBy("u").agg(min("m").as("m"))
    val reached: Seq[DataFrame] = steps.tail.foldLeft(Seq(first)) { (acc, step) =>
      val prev = acc.last
      val nxt = base.filter(col("t") === step)
        .join(prev.select(col("u"), col("m").as("pm")), Seq("u"))
        .filter(col("m") > col("pm"))
        .groupBy("u").agg(min("m").as("m"))
      acc :+ nxt
    }
    val counts = reached.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step"), lit(name).as("step_name"),
          col("n_users"))
    }
    counts.reduce(_.union(_)).orderBy("step")
  }

  /** Weekly cohort retention: cohort = the user's first-ever activity week,
    * offset = whole weeks since that first activity; cell = distinct active
    * users. Pure integer day arithmetic (epoch micros div 86400e6) keeps
    * exact cross-engine parity — no timezone-dependent week truncation.
    *
    * One user_id-keyed aggregate for cohorts, a broadcast-sized join back
    * (|users| rows — broadcastable at any corpus scale where retention is
    * meaningful per-product), then a (cohort, offset) count-distinct.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // integer `div`, not double `/` + cast: a ts within ~0.4 µs of a day
    // boundary would round differently in binary64 on the two engines
    val days = events.select(col(userCol).as("u"),
      us(col(tsCol)).as("m")).withColumn("day", expr("m div 86400000000"))
      .select("u", "day").distinct()
    val cohorts = days.groupBy("u").agg(min("day").as("c_day"))
    days.join(cohorts, Seq("u"))
      .select(col("u"), expr("c_day div 7").as("cohort_week"),
        expr("(day - c_day) div 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("u").as("n_users"))
  }

  /** Per-event-type inter-arrival gap statistics: within each (user, type)
    * stream, the lag-1 time delta; aggregated per type to count / mean /
    * min / max. The window partitions on (user, type) — bounded state, no
    * global sort — and the final aggregate is map-side-combined over five
    * groups. */
  def interArrival(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(userCol, typeCol).orderBy(tsCol, "event_id")
    events
      .withColumn("gap_us", us(col(tsCol)) - lag(us(col(tsCol)), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(typeCol)
      .agg(count(lit(1)).as("n_gaps"),
        round(avg("gap_us"), 3).as("avg_gap_us"),
        min("gap_us").as("min_gap_us"),
        max("gap_us").as("max_gap_us"))
  }

  /** Per-session roll-up: gap-based session assembly (same 30-min lag flag
    * as q_e_sessionize) followed by a keyed aggregate per (user, session) —
    * events, duration, and whether the session converted. The running flag
    * sum uses an explicit rows frame; all state is user-partitioned. */
  def sessionStats(events: DataFrame, gapUs: Long = 1800000000L,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol, "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("m", us(col(tsCol)))
      .withColumn("prev", lag(col("m"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("m") - col("prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_s").over(cum).cast("long"))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max("m") - min("m")).as("duration_us"),
        max(when(col(typeCol) === "purchase", 1).otherwise(0))
          .cast("boolean").as("converted"))
  }

  /** Trailing event-time moving aggregate per user: a RANGE frame over the
    * last `windowUs` microseconds (not N rows — bursts widen the row
    * count, quiet stretches shrink it). `value` sums as exact integer
    * micro-units inside the frame, so the mean is a ratio of exact
    * integers — sliding-window float accumulation (add/remove) never
    * touches the hash. Range frames include ties on both engines. */
  def movingAggregate(events: DataFrame, windowUs: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("m"))
      .rangeBetween(-windowUs, 0)
    events
      .withColumn("m", us(col(tsCol)))
      .withColumn("vu", round(col(valueCol) * 1e6).cast("long"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_micro", sum("vu").over(w))
      .select(col("event_id"), col(userCol), col("m").as("ts_us"),
        col("n_win"), col("sum_micro"),
        round(col("sum_micro") / lit(1e6) / col("n_win"), 6).as("avg_value"))
  }

  /** Touch attribution: for each conversion event, the touch events of the
    * same user inside the trailing `windowUs` lookback — count plus the
    * deterministic first/last touch (by (ts, event_id)), the inputs of
    * linear / first-touch / last-touch credit models. Conversions with no
    * touch emit 0/null rather than disappearing.
    *
    * The join is keyed on the USER (the event store's partitioning), never
    * on time alone; per-conversion first/last come from one keyed
    * min/max-over-struct aggregate, not a window. */
  def attribution(events: DataFrame, windowUs: Long,
      convType: String = "purchase", touchType: String = "view",
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val base = events.select(col("event_id"), col(userCol).as("u"),
      col("event_type").as("t"), us(col(tsCol)).as("m"))
    val conv = base.filter(col("t") === convType)
      .select(col("event_id").as("conv_id"), col("u"), col("m").as("cm"))
    val touch = base.filter(col("t") === touchType)
      .select(col("u").as("tu"), col("event_id").as("tid"),
        col("m").as("tm"))
    // the window predicate lives IN the left join: a conversion whose
    // user has touches, all outside the window, must still emit its row
    val joined = conv.join(touch,
      col("u") === col("tu") && col("tm") >= col("cm") - windowUs &&
        col("tm") < col("cm"), "left")
    joined
      .groupBy("conv_id", "u", "cm")
      .agg(count(col("tid")).as("n_touch"),
        min(when(col("tid").isNotNull,
          struct(col("tm"), col("tid")))).getField("tid")
          .as("first_touch_id"),
        max(when(col("tid").isNotNull,
          struct(col("tm"), col("tid")))).getField("tid")
          .as("last_touch_id"))
      .select(col("conv_id"), col("u").as("user_id"), col("cm").as("ts_us"),
        col("n_touch"), col("first_touch_id"), col("last_touch_id"))
  }

  // ---- registry --------------------------------------------------------

  private val FunnelSteps = Seq("signup", "view", "click", "purchase")

  private val eFunnel = Q(
    (s, d) => funnel(Tables.events(s, d), FunnelSteps).orderBy("step"),
    Some("""WITH base AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS m
                          FROM events),
            s1 AS (SELECT u, MIN(m) AS m FROM base WHERE t = 'signup' GROUP BY 1),
            s2 AS (SELECT b.u, MIN(b.m) AS m FROM base b JOIN s1 ON b.u = s1.u
                   WHERE b.t = 'view' AND b.m > s1.m GROUP BY 1),
            s3 AS (SELECT b.u, MIN(b.m) AS m FROM base b JOIN s2 ON b.u = s2.u
                   WHERE b.t = 'click' AND b.m > s2.m GROUP BY 1),
            s4 AS (SELECT b.u, MIN(b.m) AS m FROM base b JOIN s3 ON b.u = s3.u
                   WHERE b.t = 'purchase' AND b.m > s3.m GROUP BY 1)
            SELECT * FROM (
              SELECT CAST(1 AS INT) AS step, 'signup' AS step_name,
                     CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
              UNION ALL SELECT 2, 'view', COUNT(*) FROM s2
              UNION ALL SELECT 3, 'click', COUNT(*) FROM s3
              UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4)
            ORDER BY step"""))

  private val eRetention = Q(
    (s, d) => retention(Tables.events(s, d))
      .orderBy("cohort_week", "week_offset"),
    Some("""WITH days AS (SELECT DISTINCT user_id AS u,
                            epoch_us(ts) // 86400000000 AS day FROM events),
            cohorts AS (SELECT u, MIN(day) AS c_day FROM days GROUP BY 1)
            SELECT c.c_day // 7 AS cohort_week,
                   (d.day - c.c_day) // 7 AS week_offset,
                   CAST(COUNT(DISTINCT d.u) AS BIGINT) AS n_users
            FROM days d JOIN cohorts c ON d.u = c.u
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val eInterArrival = Q(
    (s, d) => interArrival(Tables.events(s, d)).orderBy("event_type"),
    Some("""WITH g AS (SELECT event_type,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
              FROM events)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   ROUND(AVG(gap_us), 3) AS avg_gap_us,
                   MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY 1 ORDER BY 1"""))

  private val eSessionStats = Q(
    (s, d) => sessionStats(Tables.events(s, d))
      .orderBy("user_id", "session_id"),
    Some("""WITH g AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS m,
              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS prev
              FROM events),
            f AS (SELECT user_id, event_id, event_type, m,
              CASE WHEN prev IS NULL OR m - prev > 1800000000
                   THEN 1 ELSE 0 END AS new_s FROM g),
            sid AS (SELECT user_id, event_type, m,
              CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY m, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM f)
            SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   MAX(m) - MIN(m) AS duration_us,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
                     AS converted
            FROM sid GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val eAttribution = Q(
    (s, d) => attribution(Tables.events(s, d), 604800000000L)
      .orderBy("conv_id"),
    Some("""WITH base AS (SELECT event_id, user_id AS u, event_type AS t,
              epoch_us(ts) AS m FROM events),
            conv AS (SELECT event_id AS conv_id, u, m AS cm FROM base
                     WHERE t = 'purchase'),
            touch AS (SELECT u, event_id AS tid, m AS tm FROM base
                      WHERE t = 'view'),
            j AS (SELECT c.conv_id, c.u, c.cm, t.tid, t.tm
                  FROM conv c LEFT JOIN touch t
                    ON c.u = t.u AND t.tm >= c.cm - 604800000000
                   AND t.tm < c.cm),
            rk AS (SELECT conv_id, tid, tm,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY tm, tid) AS ra,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY tm DESC, tid DESC) AS rd
                   FROM j WHERE tid IS NOT NULL),
            agg AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touch,
                     MIN(CASE WHEN ra = 1 THEN tid END) AS first_touch_id,
                     MIN(CASE WHEN rd = 1 THEN tid END) AS last_touch_id
                    FROM rk GROUP BY 1)
            SELECT c.conv_id, c.u AS user_id, c.cm AS ts_us,
                   COALESCE(a.n_touch, 0) AS n_touch,
                   a.first_touch_id, a.last_touch_id
            FROM conv c LEFT JOIN agg a ON c.conv_id = a.conv_id
            ORDER BY c.conv_id"""))

  private val eMovingAvg = Q(
    (s, d) => movingAggregate(Tables.events(s, d), 300000000L)
      .orderBy("event_id"),
    Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS m,
              CAST(ROUND(value * 1000000.0) AS BIGINT) AS vu FROM events)
            SELECT event_id, user_id, m AS ts_us,
              CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
              CAST(SUM(vu) OVER w AS BIGINT) AS sum_micro,
              ROUND(CAST(SUM(vu) OVER w AS DOUBLE) / 1000000.0
                / (COUNT(*) OVER w), 6) AS avg_value
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY m
              RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  /** Period-over-period volume deltas per event type — the reporting
    * primitive behind every "WoW" dashboard number. Weekly buckets via
    * `date_trunc` (ISO Monday weeks in both engines), one lag window per
    * type over WEEK rows (config-sized — the window never sees events).
    * Counts and deltas are integers; only the ratio is floating. */
  def periodOverPeriod(events: DataFrame): DataFrame = {
    val weekly = events
      .groupBy(col("event_type"), date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("wk")
    weekly.withColumn("prev", lag("n", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        date_format(col("wk"), "yyyy-MM-dd").as("week"),
        col("n"), col("prev"),
        (col("n") - col("prev")).as("delta"),
        round((col("n") - col("prev")) / col("prev"), 6).as("pct_change"))
  }

  private val eWow = Q(
    (s, d) => periodOverPeriod(Tables.events(s, d))
      .orderBy("event_type", "week"),
    Some("""WITH wk AS (SELECT event_type, date_trunc('week', ts) AS wk,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            l AS (SELECT event_type, wk, n,
                lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev
              FROM wk)
            SELECT event_type,
              strftime(CAST(wk AS DATE), '%Y-%m-%d') AS week,
              n, prev, n - prev AS delta,
              ROUND((n - prev) * 1.0 / prev, 6) AS pct_change
            FROM l WHERE prev IS NOT NULL
            ORDER BY event_type, week"""))

  /** Per-user event-transition matrix — the Markov view of user paths
    * (what follows what, and how often): consecutive event pairs within
    * each user's (ts, event_id)-ordered stream, reduced to transition
    * counts and row-normalized probabilities. One per-user lag window
    * (user-keyed shuffle), one (from, to) aggregate; the matrix is
    * |event types|² rows — config-sized at any scale. */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .withColumn("next", lead("event_type", 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromW = Window.partitionBy("from_type")
    pairs
      .withColumn("p", round(col("n") / sum("n").over(fromW), 6))
      .select("from_type", "to_type", "n", "p")
  }

  private val eTransitions = Q(
    (s, d) => transitionMatrix(Tables.events(s, d))
      .orderBy("from_type", "to_type"),
    Some("""WITH seq AS (SELECT user_id, event_type,
                lead(event_type) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS next
              FROM events),
            tc AS (SELECT event_type AS from_type, next AS to_type,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM seq WHERE next IS NOT NULL GROUP BY 1, 2)
            SELECT from_type, to_type, n,
              ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
            FROM tc ORDER BY from_type, to_type"""))

  val queries: Map[String, Q] = Map(
    "q_e_wow" -> eWow,
    "q_e_transitions" -> eTransitions,
    "q_e_funnel" -> eFunnel,
    "q_e_attribution" -> eAttribution,
    "q_e_moving_avg" -> eMovingAvg,
    "q_e_session_stats" -> eSessionStats,
    "q_e_retention" -> eRetention,
    "q_e_interarrival" -> eInterArrival)
}
