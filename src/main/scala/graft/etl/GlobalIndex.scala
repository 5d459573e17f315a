package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row index over a total order — the scalable encoding
  * of pandas positional alignment (reference utils.py `df['col'] = series`
  * semantics), replacing the single-partition `row_number() OVER (ORDER BY
  * …)` that dies at scale.
  *
  * Two-pass scheme (the classic zipWithIndex shape, in DataFrame ops):
  *
  *  1. range-repartition on the order columns, so partition i holds keys
  *     strictly below partition i+1;
  *  2. one tiny job collects per-partition row counts → cumulative offsets
  *     (≤ one row per partition — driver-size at any scale);
  *  3. global index = row_number over a PARTITION-LOCAL window (partitioned
  *     by spark_partition_id — no single-partition exchange) + the
  *     partition's offset.
  *
  * The range-partitioned frame is cached so the count pass and the final
  * plan see identical partition boundaries (RangePartitioner samples);
  * release it via the session's cache clearing once the result is consumed.
  *
  * `order` must be a TOTAL order (unique keys): ties that straddle range
  * boundaries would make the index non-deterministic, exactly as they do
  * for a global row_number.
  */
object GlobalIndex {

  /** [[withGlobalIndex]] plus an explicit release handle for the internal
    * range-partitioned cache (the fitReleasable pattern): callers invoke the
    * handle once the indexed output is materialized. Releasing BEFORE
    * materialization is unsafe — a re-evaluation would resample the range
    * boundaries and shift the index. */
  def withGlobalIndexReleasable(df: DataFrame, order: Seq[Column],
      indexCol: String = "rn", numPartitions: Int = 0)
      : (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*).cache()
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val counts = withPid.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init
    // offsets attach via a broadcast join on the partition id: the (pid,
    // offset) frame is ≤ one row per partition, and a join keeps the plan
    // O(1) in expression depth — a when-chain over 10k+ partitions (what a
    // 100 TB sort implies) blows up codegen into a 10k-deep case expression.
    val offDf = counts.map(_._1).zip(offsets).toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(order: _*)
    val indexed = withPid
      .join(broadcast(offDf), Seq("__pid"), "left")
      .withColumn(indexCol,
        row_number().over(w).cast("long") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__off")
    (indexed, () => { ranged.unpersist(blocking = false); () })
  }

  def withGlobalIndex(df: DataFrame, order: Seq[Column],
      indexCol: String = "rn", numPartitions: Int = 0): DataFrame =
    withGlobalIndexReleasable(df, order, indexCol, numPartitions)._1

  /** Global EXCLUSIVE prefix sum of `valueCol` over a total order — the
    * running-total twin of [[withGlobalIndexReleasable]] (same two-pass
    * range-partition scheme, per-partition SUM instead of COUNT feeding
    * the offsets), replacing the single-partition
    * `sum() OVER (ORDER BY …)` that dies at scale. Null values count as
    * 0. Exclusive (the sum of all STRICTLY-preceding rows) because that
    * is what consumers want as a start offset — sequence packing, byte
    * offsets, allocation cursors.
    *
    * `order` must be a TOTAL order (the [[withGlobalIndex]] convention):
    * the in-partition window uses an explicit ROWS frame, so with ties the
    * per-row result depends on the (nondeterministic) tie order. */
  def withGlobalCumsumReleasable(df: DataFrame, order: Seq[Column],
      valueCol: Column, cumsumCol: String = "cumsum_excl",
      numPartitions: Int = 0): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.withColumn("__v",
        coalesce(valueCol.cast("long"), lit(0L)))
      .repartitionByRange(parts, order: _*).cache()
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val sums = withPid.groupBy("__pid").agg(sum("__v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.map(_._2).scanLeft(0L)(_ + _).init
    val offDf = sums.map(_._1).zip(offsets).toSeq.toDF("__pid", "__off")
    // explicit ROWS frame: the default RANGE frame sums over ALL tied rows,
    // which under non-unique order keys is not a prefix sum of any ordering
    val w = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = withPid
      .join(broadcast(offDf), Seq("__pid"), "left")
      .withColumn(cumsumCol,
        sum("__v").over(w) - col("__v") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__off", "__v")
    (out, () => { ranged.unpersist(blocking = false); () })
  }

  def withGlobalCumsum(df: DataFrame, order: Seq[Column], valueCol: Column,
      cumsumCol: String = "cumsum_excl", numPartitions: Int = 0): DataFrame =
    withGlobalCumsumReleasable(df, order, valueCol, cumsumCol, numPartitions)._1
}
