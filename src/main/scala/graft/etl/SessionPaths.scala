package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top navigation paths — product-analytics "user journeys": gap-cut
  * sessions reduced to their ordered event-type sequence, counted and
  * ranked corpus-wide. The path-frequency table is what funnels are
  * mined FROM ([[EventAnalytics]] tests one hypothesized order; this
  * surfaces the orders that actually happen, including the abandonment
  * variants nobody hypothesized).
  *
  * Scale shape: session assembly is the same user-keyed lag+running-sum
  * as q_e_sessionize (one window pass); the path string builds per
  * (user, session) group — state bounded by session length, not
  * history; path counting is a gram-keyed aggregation (map-side
  * combined) and the global top-k plans as TakeOrdered. Unbounded
  * pathological sessions (bot streams) are the skew hazard — the same
  * cap-at-N guard session analytics always ships; path truncation
  * belongs upstream of the count, not after.
  *
  * Cross-engine determinism: event order inside a session is pinned by
  * (epoch-micros, event_id) — total order even under same-microsecond
  * ties; the path string is an exact object, counts are integers, ranks
  * tie-break on the path. */
object SessionPaths {

  /** Gap-cut session assembly shared with [[SeqPatterns]]: appends
    * exact epoch-micros `__m` and the per-user session id `__sid` in one
    * user-keyed window pass (lag + running sum over (ts, event id) —
    * total order even under same-microsecond ties). */
  def sessionized(events: DataFrame, gapUs: Long, userCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val cum = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      .withColumn("__m", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__m"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || col("__m") - col("__prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("__sid", sum("__new").over(cum).cast("long"))
      .drop("__prev", "__new")
  }

  /** Top-k session event-type paths. Output: (rank, path, n_sessions)
    * by (count desc, path); sessions cut at `gapUs` idle. */
  def topPaths(events: DataFrame, gapUs: Long, k: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id")
      : DataFrame = {
    val sessions = sessionized(events, gapUs, userCol, tsCol, idCol)
    val paths = sessions.groupBy(col(userCol), col("__sid"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("__m").as("m"),
          col(idCol).as("i"), col(typeCol).as("t")))),
        s => s.getField("t"))).as("path"))
    val counted = paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
    // global window AFTER limit(k): <= k rows by construction (bounded;
    // r16 window audit)
    counted.orderBy(col("n_sessions").desc, col("path")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
      .select(col("rank"), col("path"), col("n_sessions"))
  }

  private val ePaths = Q(
    (s, d) => topPaths(Tables.events(s, d), 1800000000L, 25)
      .orderBy("rank"),
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                epoch_us(ts) AS m
              FROM events),
            lagd AS (SELECT *, lag(m) OVER (PARTITION BY user_id
                ORDER BY m, event_id) AS prev FROM e),
            flagged AS (SELECT *,
                CASE WHEN prev IS NULL OR m - prev > 1800000000
                  THEN 1 ELSE 0 END AS new_s FROM lagd),
            sess AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                ORDER BY m, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS sid FROM flagged),
            paths AS (SELECT user_id, sid,
                string_agg(event_type, '>' ORDER BY m, event_id) AS path
              FROM sess GROUP BY 1, 2),
            counted AS (SELECT path, COUNT(*) AS n_sessions
              FROM paths GROUP BY 1),
            ranked AS (SELECT path, n_sessions, row_number() OVER (
                ORDER BY n_sessions DESC, path) AS rank FROM counted)
            SELECT CAST(rank AS BIGINT) AS rank, path, n_sessions
            FROM ranked WHERE rank <= 25 ORDER BY rank"""))

  val queries: Map[String, Q] = Map("q_e_paths" -> ePaths)
}
