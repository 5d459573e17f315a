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

  /** Generalized single-partition-window replacement: over ONE
    * range-partitioned cache on `order`, computes an optional global row
    * index plus an EXCLUSIVE global prefix sum for EACH of `sums`
    * (valueCol → output name), and returns the per-column grand totals
    * and row count (driver values — the k-row/1-row literals a caller
    * formerly read off `count().over()` / `sum().over()` unbounded
    * windows). One tiny collected job (≤ one row per partition) feeds
    * every offset; inclusive running values are `excl + own`, exactly the
    * single-partition window's integers. Null values count as 0 (the
    * [[withGlobalCumsumReleasable]] convention); `order` must be a total
    * order for deterministic per-row sums (value-cell frames — one row
    * per distinct value — always qualify). The ranged cache stays for the
    * session (boundary-resample hazard). */
  def withGlobalRunning(df: DataFrame, order: Seq[Column],
      sums: Seq[(Column, String)], indexCol: String = null,
      numPartitions: Int = 0): (DataFrame, Array[Long], Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val withVals = sums.zipWithIndex.foldLeft(df) {
      case (acc, ((c, _), i)) =>
        acc.withColumn(s"__v$i", coalesce(c.cast("long"), lit(0L))) }
    val ranged = withVals.repartitionByRange(parts, order: _*).cache()
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val aggs = count(lit(1)).as("__c") +:
      sums.indices.map(i => sum(s"__v$i").as(s"__s$i"))
    val rows = withPid.groupBy("__pid").agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    val n = rows.map(_.getLong(1)).sum
    val totals = sums.indices.map(i =>
      rows.map(_.getLong(i + 2)).sum).toArray
    val cOffs = rows.map(_.getLong(1)).scanLeft(0L)(_ + _).init
    val sOffs = sums.indices.map(i =>
      rows.map(_.getLong(i + 2)).scanLeft(0L)(_ + _).init)
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val offRows = rows.indices.map(i =>
      org.apache.spark.sql.Row.fromSeq(
        rows(i).getInt(0) +: cOffs(i) +: sums.indices.map(sOffs(_)(i))))
    val offDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(StructField("__pid", IntegerType) +:
        StructField("__coff", LongType) +:
        sums.indices.map(i => StructField(s"__soff$i", LongType)))))
    val wRows = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = withPid.join(offDf, Seq("__pid"))
    val withSums = sums.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name,
          sum(s"__v$i").over(wRows) - col(s"__v$i") + col(s"__soff$i")) }
    val out0 =
      if (indexCol == null) withSums
      else withSums.withColumn(indexCol,
        row_number().over(Window.partitionBy("__pid").orderBy(order: _*))
          .cast("long") + col("__coff"))
    val dropCols = Seq("__pid", "__coff") ++
      sums.indices.map(i => s"__v$i") ++ sums.indices.map(i => s"__soff$i")
    (out0.drop(dropCols: _*), totals, n)
  }

  /** PER-GROUP global rank + group totals over a within-group total
    * order — the grouped twin of [[withGlobalIndexReleasable]], replacing
    * `row_number() OVER (PARTITION BY g ORDER BY …)` whose sort
    * parallelism is capped at |groups| (3 for a returnflag-keyed median:
    * a third of the corpus through one task at any scale).
    *
    * Same two-pass scheme, range-partitioned on (groupCols ++ order) so a
    * group SPANS partitions while every partition still holds
    * contiguous-in-order slices: one tiny job collects per-(partition,
    * group) counts; per-group offsets accumulate driver-side in partition
    * order (≤ partitions·|groups| rows — driver-sized whenever |groups|
    * is a reporting axis); rank = partition-local row_number + the
    * (partition, group) offset. Group TOTALS fall out of the same
    * collected counts and attach as `countCol` (a broadcast |groups|-row
    * join), so callers get rank + n in ONE data shuffle.
    *
    * Equal keys land in one range partition, so ranks are deterministic
    * per VALUE; rows tied on (group, order) take arbitrary ranks WITHIN
    * the tie run, exactly as the single-partition window's row_number
    * does — callers must be tie-insensitive (order statistics on values
    * are). The ranged frame stays cached (the boundary-resample hazard,
    * see [[withGlobalIndexReleasable]]); the session owns the release. */
  def withGroupedIndex(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], indexCol: String = "rn",
      countCol: String = "cnt", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, (groupCols.map(col) ++ order): _*).cache()
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    val countsDf = withPid
      .groupBy(col("__pid") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val rows = countsDf.collect()
    val gIdx = 1 to groupCols.length
    // per-group offsets in partition order + per-group totals
    val byGroup = rows.groupBy(r => gIdx.map(r.get).toList)
    val offs = byGroup.toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(0))
      val cum = sorted.map(_.getLong(gIdx.last + 1)).scanLeft(0L)(_ + _)
      sorted.zip(cum).map { case (r, off) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq.init ++ Seq(off)) }
    }
    val tots = byGroup.toSeq.map { case (g, rs) =>
      org.apache.spark.sql.Row.fromSeq(
        g ++ Seq(rs.map(_.getLong(gIdx.last + 1)).sum)) }
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val gFields = countsDf.schema.fields.slice(1, gIdx.last + 1)
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offs, 1),
      StructType(countsDf.schema.fields(0) +: gFields :+
        StructField("__off", LongType)))
    val totDf = spark.createDataFrame(
      spark.sparkContext.parallelize(tots, 1),
      StructType(gFields :+ StructField(countCol, LongType)))
    val w = Window.partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(order: _*)
    withPid
      .join(broadcast(offDf), "__pid" +: groupCols)
      .withColumn(indexCol,
        row_number().over(w).cast("long") + coalesce(col("__off"), lit(0L)))
      .join(broadcast(totDf), groupCols)
      .drop("__pid", "__off")
  }
}
