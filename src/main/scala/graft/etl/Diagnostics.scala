package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew observability — the measurement half of the skew toolkit
  * ([[SkewJoin]] fixes skew; these report it, so a pipeline can gate a
  * salted-join or AQE decision on DATA instead of folklore). Both
  * reports are one cheap job each and return driver-size frames at any
  * input scale.
  */
object Diagnostics {

  /** Partition-balance snapshot: rows per CURRENT partition, reduced to
    * one summary row (partition count, min/max/avg rows, and
    * `skew_factor` = max/avg — 1.0 is perfectly balanced; >2 means the
    * slowest task does twice the average work). One map-side count per
    * partition — no data moves. Run it before and after a
    * repartition/salting change to see the effect. */
  def partitionStats(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("rows"))
      .agg(count(lit(1)).as("n_partitions"),
        min("rows").as("min_rows"),
        max("rows").as("max_rows"),
        round(avg("rows"), 2).as("avg_rows"),
        round(max("rows") / avg("rows"), 2).as("skew_factor"))

  /** Key-skew report: the k heaviest keys with their EXACT counts and
    * corpus share, plus the uniform-share baseline for contrast (a key
    * whose share dwarfs `uniform_share` is the one that melts a shuffle
    * partition). Candidates come from the fixed-memory Misra-Gries pass
    * ([[graft.sketch.HeavyHitters.topK]]) and are recounted exactly —
    * the full key domain is never shuffled. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val top = graft.sketch.HeavyHitters.topK(
      df.select(col(keyCol)), keyCol, k)
    val tot = df.agg(count(lit(1)).as("__total"),
      approx_count_distinct(keyCol, 0.02).as("__ndv"))
    top.crossJoin(broadcast(tot))
      .select(col(keyCol).as("key"), col("cnt").as("n"),
        round(col("cnt") / col("__total"), 4).as("share"),
        round(lit(1.0) / col("__ndv"), 4).as("uniform_share"))
      .orderBy(col("n").desc, col("key"))
  }
}
