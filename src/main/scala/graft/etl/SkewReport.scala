package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-skew diagnostics — the measure-before-you-salt report feeding
  * [[SkewJoin]]: per-key counts, the top-k heavy keys, each key's
  * hot factor (its count as a multiple of the mean — EXACTLY the
  * integer heavy test adaptiveSaltedJoin thresholds on, cnt·n_keys
  * vs factor·total), and the key-population stats a partitioning
  * decision needs. Run it on a join key BEFORE sizing salts /
  * choosing broadcast vs shuffle; at 1000 executors a 40× hot key is
  * the difference between a 2-minute and a 2-hour stage, and this is
  * the one-pass report that finds it.
  *
  * Exactness: counts, shares and hot factors are pure integers
  * (micro-ratios by floor division); ties in the top-k order break
  * by key ascending.
  *
  * Scale shape: ONE map-side-combined groupBy(key) is the data pass;
  * the top-k cut is TakeOrdered (k survivors per partition, no global
  * sort); population stats are a scalar reduce broadcast back onto
  * the k rows. Nothing after the first aggregation is data-sized. */
object SkewReport {

  /** Top-`k` heavy keys of `keyCol` with population context. Output:
    * (key, cnt, rank, share_micro, hot_factor_micro, n_keys, total). */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum("cnt").as("total"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(k)
    // global window over the limit(k) frame: <= k rows by construction
    // (bounded; r16 window audit)
    val w = Window.orderBy(col("cnt").desc, col("key"))
    top.join(broadcast(stats))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("key"), col("cnt"), col("rank"),
        expr("cnt * 1000000 div total").as("share_micro"),
        expr("cnt * n_keys * 1000000 div total").as("hot_factor_micro"),
        col("n_keys"), col("total"))
      .orderBy("rank")
  }

  /** q_p31_skew_report: the 20 heaviest order keys in lineitem — the
    * fact-side join-key profile a salting decision reads. The oracle
    * replays counts, the tie-broken top-20, and both micro-ratios. */
  private val pSkew = Q(
    (s, d) => skewReport(Tables.lineitem(s, d), "l_orderkey", 20),
    Some("""WITH c AS (SELECT l_orderkey AS key,
                CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY 1),
            st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                CAST(SUM(cnt) AS BIGINT) AS total FROM c),
            top AS (SELECT key, cnt, CAST(row_number() OVER
                  (ORDER BY cnt DESC, key) AS BIGINT) AS rank
              FROM c ORDER BY cnt DESC, key LIMIT 20)
            SELECT top.key, top.cnt, top.rank,
              CAST(top.cnt * 1000000 // st.total AS BIGINT) AS share_micro,
              CAST(top.cnt * st.n_keys * 1000000 // st.total AS BIGINT)
                AS hot_factor_micro,
              st.n_keys, st.total
            FROM top, st
            ORDER BY rank"""))

  val queries: Map[String, Q] = Map("q_p31_skew_report" -> pSkew)
}
