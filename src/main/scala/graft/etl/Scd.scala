package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension build (Kimball slowly-changing dimensions): a
  * keyed changelog becomes a HISTORY table — one row per key VERSION
  * with a [valid_from, valid_to) interval and a current flag. The
  * history-preserving complement to [[graft.pipeline.Sinks.applyCdc]]
  * (latest-wins collapses history; SCD2 keeps every version
  * queryable as-of any time — the thing an
  * [[AsOfJoin]] then joins against).
  *
  * Scale shape: ONE key-partitioned window pass (row_number + lead) —
  * state per key is a row, not the version list; no self-join, no
  * global ordering. At 100 TB the changelog shuffles once on the key
  * and the history table writes out partition-local.
  *
  * Cross-engine determinism: validity bounds are exact integer
  * epoch-microseconds; version order is pinned by (ts, change id) —
  * total even under same-instant ties; the half-open convention
  * (valid_to = next version's valid_from, null while current) avoids
  * the ±1-tick fencepost entirely. Attribute values carry verbatim. */
object Scd {

  /** Build SCD2 history from a changelog. Output per change row:
    * (key, version, valid_from_us, valid_to_us, attributes...,
    * is_current) — valid_to_us null on the current version. */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      idCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__m"), col(idCol))
    changes
      .withColumn("__m", unix_micros(col(tsCol)))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead(col("__m"), 1).over(w))
      .select(Seq(col(keyCol), col("version"),
        col("__m").as("valid_from_us"), col("valid_to_us")) ++
        attrCols.map(col) :+
        when(col("valid_to_us").isNull, lit(1L)).otherwise(lit(0L))
          .as("is_current"): _*)
  }

  /** q_e_scd2: each user's event stream read as an attribute changelog
    * (`value` the tracked attribute) — the fixture's densest keyed
    * version history. */
  private val eScd = Q(
    (s, d) => scd2(Tables.events(s, d), "user_id", "ts", "event_id",
        Seq("value"))
      .orderBy("user_id", "version"),
    Some("""WITH c AS (SELECT user_id, event_id, value,
                epoch_us(ts) AS m
              FROM events),
            v AS (SELECT user_id,
                CAST(row_number() OVER w AS BIGINT) AS version,
                m AS valid_from_us,
                lead(m) OVER w AS valid_to_us,
                value
              FROM c
              WINDOW w AS (PARTITION BY user_id ORDER BY m, event_id))
            SELECT user_id, version, valid_from_us, valid_to_us, value,
                   CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END
                     AS BIGINT) AS is_current
            FROM v ORDER BY user_id, version"""))

  val queries: Map[String, Q] = Map("q_e_scd2" -> eScd)
}
