package graft.stats

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simpson's-paradox guard (Simpson, JRSS-B 1951; Bickel et al.,
  * Science 1975 — the Berkeley admissions case) — the aggregation
  * pitfall detector for A/B readouts: a pooled rate comparison can
  * point OPPOSITE to every stratum when arm allocation correlates with
  * a stratum that drives the outcome. Run before trusting any pooled
  * lift: a strong flip means the pooled number is an artifact of the
  * mix, and the per-stratum (or post-stratified, q_m64) readout is the
  * real effect.
  *
  * Exactness (rule 1, zero floats): every direction is an integer
  * cross-multiplication sign — pooled sign(x_a·n_b − x_b·n_a) and the
  * same per stratum; the summary counts strata agreeing/opposing the
  * pooled direction (zero-direction strata and strata missing an arm
  * count as neither). `strong_flip` = every decided stratum opposes a
  * decided pooled direction.
  *
  * Scale shape: ONE map-side (stratum × arm) cells pass; everything
  * after runs on 2·|strata| cells with the pooled row derived from
  * the same cells. */
object Simpson {

  /** Guard over (groupCol: boolean arm, stratumCol, successCol:
    * boolean) rows. Output one row: (n_strata, pooled_dir, n_same,
    * n_opposite, strong_flip). */
  def guard(rows: DataFrame, groupCol: String, stratumCol: String,
      successCol: String): DataFrame = {
    val cells = rows.groupBy(col(stratumCol).as("st"))
      .agg(
        sum(when(col(groupCol), 1L).otherwise(0L)).as("na"),
        sum(when(col(groupCol) && col(successCol), 1L).otherwise(0L))
          .as("xa"),
        sum(when(!col(groupCol), 1L).otherwise(0L)).as("nb"),
        sum(when(!col(groupCol) && col(successCol), 1L).otherwise(0L))
          .as("xb"))
    val pooled = cells.agg(sum("na").as("na"), sum("xa").as("xa"),
        sum("nb").as("nb"), sum("xb").as("xb"))
      .select(signum(col("xa").cast("decimal(38,0)") * col("nb")
        - col("xb").cast("decimal(38,0)") * col("na"))
        .cast("long").as("pooled_dir"))
    cells
      .withColumn("dir",
        when(col("na") === 0 || col("nb") === 0, lit(0L))
          .otherwise(signum(col("xa").cast("decimal(38,0)") * col("nb")
            - col("xb").cast("decimal(38,0)") * col("na")).cast("long")))
      .join(broadcast(pooled))
      .groupBy("pooled_dir")
      .agg(count(lit(1)).as("n_strata"),
        sum(when(col("dir") =!= 0 && col("dir") === col("pooled_dir"), 1L)
          .otherwise(0L)).as("n_same"),
        sum(when(col("dir") =!= 0 && col("dir") === -col("pooled_dir"), 1L)
          .otherwise(0L)).as("n_opposite"))
      .select(col("n_strata"), col("pooled_dir"), col("n_same"),
        col("n_opposite"),
        (col("pooled_dir") =!= 0 && col("n_opposite") > 0 &&
          col("n_same") === 0).as("strong_flip"))
  }

  /** q_m85_simpson: does the parity arms' pooled purchase-rate
    * direction survive stratification by the 6-hour day band (the
    * q_m72 dose grid)? The pitfall guard in front of q_m41's pooled
    * z-test. */
  private val mSimpson = Q(
    (s, d) => guard(
      Tables.events(s, d).select(
        (col("user_id") % 2 === 0).as("arm"),
        expr("hour(ts) div 6").cast("long").as("band"),
        (col("event_type") === "purchase").as("won")),
      "arm", "band", "won"),
    Some("""WITH rows0 AS (SELECT user_id % 2 = 0 AS arm,
                CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS band,
                event_type = 'purchase' AS won
              FROM events),
            cells AS (SELECT band,
                CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS na,
                CAST(SUM(CASE WHEN arm AND won THEN 1 ELSE 0 END)
                  AS BIGINT) AS xa,
                CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
                  AS nb,
                CAST(SUM(CASE WHEN NOT arm AND won THEN 1 ELSE 0 END)
                  AS BIGINT) AS xb
              FROM rows0 GROUP BY 1),
            pooled AS (SELECT CAST(CASE
                WHEN CAST(SUM(xa) AS HUGEINT) * SUM(nb)
                   - CAST(SUM(xb) AS HUGEINT) * SUM(na) > 0 THEN 1
                WHEN CAST(SUM(xa) AS HUGEINT) * SUM(nb)
                   - CAST(SUM(xb) AS HUGEINT) * SUM(na) < 0 THEN -1
                ELSE 0 END AS BIGINT) AS pooled_dir
              FROM cells),
            dirs AS (SELECT band,
                CASE WHEN na = 0 OR nb = 0 THEN 0
                  WHEN CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na > 0
                    THEN 1
                  WHEN CAST(xa AS HUGEINT) * nb - CAST(xb AS HUGEINT) * na < 0
                    THEN -1
                  ELSE 0 END AS dir
              FROM cells)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
              ANY_VALUE(pooled_dir) AS pooled_dir,
              CAST(SUM(CASE WHEN dir <> 0 AND dir = pooled_dir
                THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
              CAST(SUM(CASE WHEN dir <> 0 AND dir = -pooled_dir
                THEN 1 ELSE 0 END) AS BIGINT) AS n_opposite,
              ANY_VALUE(pooled_dir) <> 0
                AND SUM(CASE WHEN dir <> 0 AND dir = -pooled_dir
                  THEN 1 ELSE 0 END) > 0
                AND SUM(CASE WHEN dir <> 0 AND dir = pooled_dir
                  THEN 1 ELSE 0 END) = 0 AS strong_flip
            FROM dirs, pooled"""))

  val queries: Map[String, Q] = Map("q_m85_simpson" -> mSimpson)
}
