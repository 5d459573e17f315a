package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window event rates — burst / rate-limit analytics: for every
  * event, how many events the same key produced in the trailing
  * interval (inclusive of the event itself), and whether that crosses a
  * burst threshold. The abuse-detection / rate-limiter-audit primitive:
  * "find every moment a user exceeded N requests per minute" — a
  * per-event answer a fixed tumbling bucket can't give (a burst
  * straddling a bucket edge vanishes) and a stream limiter's counters
  * don't keep.
  *
  * Scale shape: ONE window pass, keyed by the entity — a RANGE frame
  * over integer epoch-microseconds, so the sort is per-key within
  * hash-partitioned data and state per key is the trailing interval's
  * events, bounded by the rate itself. No self-join (the naive
  * formulation — events joined to events on a time band — shuffles the
  * table against itself; the range frame is the same answer in one
  * pass). Contrast [[EventAnalytics.sessionize]]: sessions CUT at gaps,
  * this COUNTS within a sliding horizon.
  *
  * Cross-engine determinism: the frame bound is exact integer
  * microseconds (`unix_micros`/`epoch_us` — [[graft.Tables.normalizeTs]]
  * pins both engines to the same UTC instants), counts are integers,
  * and RANGE frames are tie-safe by construction (same-timestamp rows
  * share a count — no ROWS-frame order ambiguity). */
object RateWindows {

  /** Per-event trailing count over `windowMicros` (inclusive), plus a
    * burst flag at `burstAt`. Output: one row per event with
    * (key, event id, trailing count, burst flag). */
  def trailingRate(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, windowMicros: Long, burstAt: Long): DataFrame = {
    require(windowMicros > 0 && burstAt > 0, "window and threshold positive")
    val w = Window.partitionBy(keyCol).orderBy(col("__us"))
      .rangeBetween(-(windowMicros - 1), 0)
    events.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .select(col(keyCol), col(idCol),
        col("n_trailing"),
        when(col("n_trailing") >= burstAt, lit(1L)).otherwise(lit(0L))
          .as("burst"))
  }

  /** q_e_burst: per-event trailing 6-hour request count per user with a
    * burst flag at ≥ 5 — the fixture's ~67 events/user/month make a
    * 6-hour horizon the scale where real bursts (and quiet stretches)
    * both occur. */
  private val eBurst = Q(
    (s, d) => trailingRate(Tables.events(s, d), "user_id", "ts",
        "event_id", 6L * 3600L * 1000000L, 5L)
      .orderBy("event_id"),
    Some("""SELECT user_id, event_id,
                   COUNT(*) OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts)
                     RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
                     AS n_trailing,
                   CAST(CASE WHEN COUNT(*) OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts)
                     RANGE BETWEEN 21599999999 PRECEDING AND CURRENT ROW)
                     >= 5 THEN 1 ELSE 0 END AS BIGINT) AS burst
            FROM events ORDER BY event_id"""))

  val queries: Map[String, Q] = Map("q_e_burst" -> eBurst)
}
