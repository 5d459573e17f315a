package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern support mining — the ORDER-aware sibling of
  * market-basket analysis ([[MarketBasket]] counts co-occurrence;
  * this counts "a HAPPENS BEFORE b in one session", the SPADE/GSP
  * length-2 pattern): per session, every distinct ordered event-type
  * pair where some a-event precedes some b-event, supported by the
  * number of sessions exhibiting it. The table funnel hypotheses and
  * next-step models are mined from.
  *
  * Scale shape: session assembly is the shared one-window-pass
  * [[SessionPaths.sessionized]]; pair extraction is a SESSION-KEYED
  * self-join (shuffle keyed on (user, session) — work bounded by
  * Σ len(session)², the standard sequence-mining cost, capped by the
  * same bot-session guard as path mining, never user×user); distinct
  * collapses pairs per session BEFORE the global count; support
  * counting is a pair-keyed map-side-combined aggregation and the cut
  * is TakeOrdered.
  *
  * Cross-engine determinism: precedence is the exact integer
  * (epoch-micros, event id) order; supports are integers; the support
  * ratio is emitted by integer division over the exact session total;
  * ranking ties break on the pair strings. */
object SeqPatterns {

  /** Top-k ordered pairs. Output: (rank, antecedent, consequent,
    * n_sessions, support_micro) — support relative to ALL sessions. */
  def topSequentialPairs(events: DataFrame, gapUs: Long, k: Int,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id")
      : DataFrame = {
    val sess = SessionPaths
      .sessionized(events, gapUs, userCol, tsCol, idCol)
      .select(col(userCol).as("u"), col("__sid").as("sid"),
        col("__m").as("m"), col(idCol).as("i"), col(typeCol).as("t"))
    val total = sess.select("u", "sid").distinct().count()
    val a = sess.select(col("u"), col("sid"), col("m").as("m1"),
      col("i").as("i1"), col("t").as("t1"))
    val b = sess.select(col("u"), col("sid"), col("m").as("m2"),
      col("i").as("i2"), col("t").as("t2"))
    val pairs = a.join(b, Seq("u", "sid"))
      .filter(col("m1") < col("m2") ||
        (col("m1") === col("m2") && col("i1") < col("i2")))
      .select(col("u"), col("sid"), col("t1"), col("t2")).distinct()
    val counted = pairs.groupBy("t1", "t2")
      .agg(count(lit(1)).as("n_sessions"))
    // global window AFTER limit(k): <= k rows by construction (bounded;
    // r16 window audit)
    counted.orderBy(col("n_sessions").desc, col("t1"), col("t2")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("t1"), col("t2")))
        .cast("long"))
      .select(col("rank"), col("t1").as("antecedent"),
        col("t2").as("consequent"), col("n_sessions"),
        expr(s"(n_sessions * 1000000L) div ${total}L").as("support_micro"))
  }

  private val eSeqPat = Q(
    (s, d) => topSequentialPairs(Tables.events(s, d), 1800000000L, 20)
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
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
              (SELECT DISTINCT user_id, sid FROM sess)),
            pairs AS (SELECT DISTINCT a.user_id, a.sid,
                a.event_type AS t1, b.event_type AS t2
              FROM sess a JOIN sess b
                ON a.user_id = b.user_id AND a.sid = b.sid
              WHERE a.m < b.m OR (a.m = b.m AND a.event_id < b.event_id)),
            counted AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT)
                AS n_sessions
              FROM pairs GROUP BY 1, 2),
            ranked AS (SELECT t1, t2, n_sessions, row_number() OVER (
                ORDER BY n_sessions DESC, t1, t2) AS rank FROM counted)
            SELECT CAST(rank AS BIGINT) AS rank, t1 AS antecedent,
                   t2 AS consequent, n_sessions,
                   (n_sessions * 1000000) // (SELECT n FROM tot)
                     AS support_micro
            FROM ranked WHERE rank <= 20 ORDER BY rank"""))

  val queries: Map[String, Q] = Map("q_e_seqpat" -> eSeqPat)
}
