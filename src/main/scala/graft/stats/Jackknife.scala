package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delete-one-bucket jackknife variance for RATIO metrics (Quenouille
  * 1956; the bucket form is the standard large-scale practice — e.g.
  * Tang et al. KDD'10 on overlapping experiment infrastructure): a
  * per-event mean `Σvalue/Σcount` is a ratio of two random sums, so
  * the naive per-row variance is WRONG (rows of one user correlate);
  * bucketing users and recomputing the ratio with each bucket deleted
  * gives the classic jackknife variance that is correct under
  * user-level dependence — the error bar q_m41/q_m48 read-outs need.
  *
  * Pure integers end-to-end (rule 1): per-bucket numerators (milli
  * values) and denominators are exact sums; every leave-one-out ratio
  * is ONE integral division to micro; the variance over the B floored
  * ratios is the exact integer `(B−1)·(B·Σr² − (Σr)²) div B²` — no
  * mean materialized, order-free. Only the DISPLAY standard error
  * takes a float sqrt (identical tree, floored — rule 2).
  *
  * Scale shape: ONE map-side-combined (group, bucket) collapse is the
  * data pass; totals, leave-one-out ratios, and the variance run over
  * groups·B CELLS. */
object Jackknife {

  /** Per-group jackknife over (group, bucket, num, den) cells. Output:
    * (group, b_buckets, mean_micro = ΣN·1000 div ΣD, jk_var_micro2,
    * jk_se_micro) — nulls when a leave-one-out denominator empties or
    * only one bucket exists. */
  def jackknifeRatio(cells: DataFrame, grpCol: String): DataFrame = {
    val tot = cells.groupBy(col(grpCol).as("group")).agg(
      count(lit(1)).as("b"),
      sum("num").as("nn"), sum("den").as("dd"))
    val loo = cells.select(col(grpCol).as("group"), col("num"),
        col("den"))
      .join(tot, Seq("group"))
      .filter(col("b") > 1 && col("dd") > col("den"))
      .withColumn("r",
        expr("((nn - num) * 1000L) div (dd - den)"))
    loo.groupBy("group", "b", "nn", "dd").agg(
        count(lit(1)).as("bOk"),
        sum(col("r").cast("decimal(38,0)")).as("sr"),
        sum(col("r").cast("decimal(38,0)") * col("r")).as("srr"))
      // every bucket must have survived the guard, else the statistic
      // is undefined for the group (emit nulls via the left join below)
      .filter(col("bOk") === col("b"))
      .select(col("group"), col("b").as("b_buckets"),
        expr("(nn * 1000L) div dd").as("mean_micro"),
        expr("""cast(((b - 1) * (b * srr - sr * sr))
                div (cast(b as decimal(38,0)) * b) as long)""")
          .as("jk_var_micro2"))
      .withColumn("jk_se_micro",
        floor(sqrt(col("jk_var_micro2").cast("double"))).cast("long"))
  }

  /** q_m54_jackknife: mean event value (micro) per event type with a
    * 20-bucket user-level jackknife error bar. */
  private val mJack = Q(
    (s, d) => {
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 20).as("bucket"))
        .agg(sum(floor(col("value") * 1000).cast("long")).as("num"),
          count(lit(1)).as("den"))
      jackknifeRatio(cells, "event_type")
        .withColumnRenamed("group", "event_type")
        .orderBy("event_type")
    },
    Some("""WITH cells AS (SELECT event_type, user_id % 20 AS bucket,
                CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
                  AS num,
                CAST(COUNT(*) AS BIGINT) AS den
              FROM events GROUP BY 1, 2),
            tot AS (SELECT event_type AS g, CAST(COUNT(*) AS BIGINT) AS b,
                CAST(SUM(num) AS BIGINT) AS nn,
                CAST(SUM(den) AS BIGINT) AS dd
              FROM cells GROUP BY 1),
            loo AS (SELECT tot.g, tot.b, tot.nn, tot.dd,
                ((tot.nn - num) * 1000) // (tot.dd - den) AS r
              FROM cells JOIN tot ON cells.event_type = tot.g
              WHERE tot.b > 1 AND tot.dd > den),
            agg AS (SELECT g, b, nn, dd,
                CAST(COUNT(*) AS BIGINT) AS bok,
                SUM(CAST(r AS HUGEINT)) AS sr,
                SUM(CAST(r AS HUGEINT) * r) AS srr
              FROM loo GROUP BY 1, 2, 3, 4)
            SELECT g AS event_type, b AS b_buckets,
              CAST((nn * 1000) // dd AS BIGINT) AS mean_micro,
              CAST(((b - 1) * (b * srr - sr * sr))
                // (CAST(b AS HUGEINT) * b) AS BIGINT) AS jk_var_micro2,
              CAST(FLOOR(SQRT(CAST(
                CAST(((b - 1) * (b * srr - sr * sr))
                  // (CAST(b AS HUGEINT) * b) AS BIGINT) AS DOUBLE)))
                AS BIGINT) AS jk_se_micro
            FROM agg WHERE bok = b ORDER BY event_type"""))

  val queries: Map[String, Q] = Map("q_m54_jackknife" -> mJack)
}
