package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-scoped conversion funnel — the WITHIN-SESSION variant of the
  * global funnel (q_e_funnel orders steps across a user's whole
  * history; product analytics usually asks "did the user view → click →
  * purchase in ONE visit?"): per session, each funnel step must occur
  * strictly after the previous step's FIRST occurrence, and the funnel
  * depth is how many steps the session completed in order. Emits the
  * per-step session counts plus micro conversion rates — the standard
  * funnel read-out.
  *
  * Scale shape: session assembly is the shared one-window
  * [[SessionPaths.sessionized]] pass; per (session, step) the MIN
  * qualifying timestamp collapses map-side, and each step joins the
  * previous step's frame on the session key — |steps| session-keyed
  * joins over session-count-sized frames, never event-scale after the
  * first collapse. Counts and rates are exact integers.
  *
  * Cross-engine determinism: step order uses the exact integer
  * (epoch-micros, event id) total order (same-tick ties pinned);
  * counts integer; rates by integer division. */
object SessionFunnel {

  /** Output: one row per funnel prefix depth 1..k — (step, event_type,
    * n_sessions, rate_micro vs ALL sessions, step_rate_micro vs the
    * previous step). */
  def sessionFunnel(events: DataFrame, gapUs: Long, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id")
      : DataFrame = {
    require(steps.nonEmpty, "empty funnel")
    val spark = events.sparkSession
    import spark.implicits._
    val sess = SessionPaths
      .sessionized(events, gapUs, userCol, tsCol, idCol)
      .select(col(userCol).as("u"), col("__sid").as("sid"),
        // the (epoch-micros, event id) pair IS the total order — a
        // packed single key would overflow a long at epoch scale
        col("__m").as("m"), col(idCol).as("i"), col(typeCol).as("t"))
    val total = sess.select("u", "sid").distinct().count()
    // fold the steps: frame i = sessions with an occurrence of step i
    // strictly after frame (i-1)'s first hit; keep that FIRST (m, id)
    def firstHit(df: DataFrame) =
      df.groupBy("u", "sid")
        .agg(min(struct(col("m"), col("i"))).as("mk"))
        .select(col("u"), col("sid"), col("mk.m").as("m"),
          col("mk.i").as("i"))
    val first = firstHit(sess.filter(col("t") === steps.head))
    val frames = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (st, _)) =>
        firstHit(sess.filter(col("t") === st)
          .join(prev.select(col("u"), col("sid"), col("m").as("pm"),
            col("i").as("pi")), Seq("u", "sid"))
          .filter(col("m") > col("pm") ||
            (col("m") === col("pm") && col("i") > col("pi"))))
    }
    val counts = frames.map(_.count())
    counts.zip(steps).zipWithIndex.map { case ((n, st), i) =>
      (i + 1L, st, n,
        if (total > 0) n * 1000000L / total else 0L,
        if (i == 0) 1000000L
        else if (counts(i - 1) > 0) n * 1000000L / counts(i - 1) else 0L)
    }.toDF("step", "event_type", "n_sessions", "rate_micro",
      "step_rate_micro")
  }

  private val funnelSteps = Seq("view", "click", "purchase")

  private val eSessionFunnel = Q(
    (s, d) => sessionFunnel(Tables.events(s, d), 21600000000L,
      funnelSteps).orderBy("step"),
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                epoch_us(ts) AS m
              FROM events),
            lagd AS (SELECT *, lag(m) OVER (PARTITION BY user_id
                ORDER BY m, event_id) AS prev FROM e),
            flagged AS (SELECT *,
                CASE WHEN prev IS NULL OR m - prev > 21600000000
                  THEN 1 ELSE 0 END AS new_s FROM lagd),
            sess AS (SELECT user_id AS u, event_type AS t, m,
                event_id AS i,
                SUM(new_s) OVER (PARTITION BY user_id
                  ORDER BY m, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sid FROM flagged),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
              (SELECT DISTINCT u, sid FROM sess)),
            f1 AS (SELECT u, sid, m, i FROM (
                SELECT u, sid, m, i, row_number() OVER
                  (PARTITION BY u, sid ORDER BY m, i) AS rn
                FROM sess WHERE t = 'view') WHERE rn = 1),
            f2 AS (SELECT u, sid, m, i FROM (
                SELECT s.u, s.sid, s.m, s.i, row_number() OVER
                  (PARTITION BY s.u, s.sid ORDER BY s.m, s.i) AS rn
                FROM sess s JOIN f1 ON s.u = f1.u AND s.sid = f1.sid
                WHERE s.t = 'click' AND (s.m > f1.m
                  OR (s.m = f1.m AND s.i > f1.i))) WHERE rn = 1),
            f3 AS (SELECT u, sid, m, i FROM (
                SELECT s.u, s.sid, s.m, s.i, row_number() OVER
                  (PARTITION BY s.u, s.sid ORDER BY s.m, s.i) AS rn
                FROM sess s JOIN f2 ON s.u = f2.u AND s.sid = f2.sid
                WHERE s.t = 'purchase' AND (s.m > f2.m
                  OR (s.m = f2.m AND s.i > f2.i))) WHERE rn = 1),
            c AS (SELECT 1 AS step, 'view' AS event_type,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM f1) AS n
              UNION ALL SELECT 2, 'click',
                (SELECT CAST(COUNT(*) AS BIGINT) FROM f2)
              UNION ALL SELECT 3, 'purchase',
                (SELECT CAST(COUNT(*) AS BIGINT) FROM f3))
            SELECT CAST(step AS BIGINT) AS step, event_type,
                   n AS n_sessions,
                   n * 1000000 // (SELECT n FROM tot) AS rate_micro,
                   CASE WHEN step = 1 THEN 1000000
                     WHEN lag(n) OVER (ORDER BY step) > 0
                       THEN n * 1000000 // lag(n) OVER (ORDER BY step)
                     ELSE 0 END AS step_rate_micro
            FROM c ORDER BY step"""))

  val queries: Map[String, Q] = Map("q_e_session_funnel" -> eSessionFunnel)
}
