package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSpecBase {
  import spark.implicits._

  test("global index is 1..n, contiguous, and follows the total order") {
    // enough rows to span several range partitions, inserted out of order
    val df = (0 until 5000).map(i => (i * 7919 % 5000).toLong).toDF("k")
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("k")), numPartitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 5000)
    val byIndex = out.sortBy(_._2)
    assert(byIndex.map(_._2).toSeq === (1L to 5000L)) // contiguous, no gaps
    assert(byIndex.map(_._1).toSeq === byIndex.map(_._1).sorted.toSeq) // order-aligned
    spark.catalog.clearCache()
  }

  test("offsets attach via broadcast join and stay correct at 1000+ partitions") {
    val df = (0 until 6000).map(i => (i * 104729 % 6000).toLong).toDF("k")
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("k")), numPartitions = 1200)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "offset attachment must be a broadcast join, not a when-chain")
    assert(!plan.contains("Exchange SinglePartition"),
      "no single-partition exchange anywhere in the index plan")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 6000)
    val byIndex = rows.sortBy(_._2)
    assert(byIndex.map(_._2).toSeq === (1L to 6000L))
    assert(byIndex.map(_._1).toSeq === byIndex.map(_._1).sorted.toSeq)
    spark.catalog.clearCache()
  }

  test("global index matches a single-partition row_number exactly") {
    val df = Seq(30L, 10L, 50L, 20L, 40L).toDF("k")
    val dist = GlobalIndex.withGlobalIndex(df, Seq(col("k")), numPartitions = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === Map(10L -> 1L, 20L -> 2L, 30L -> 3L, 40L -> 4L, 50L -> 5L))
    spark.catalog.clearCache()
  }

  test("global cumsum matches a single-partition running sum; nulls are 0") {
    val df = (0 until 4000).map { i =>
      val k = (i * 7919 % 4000).toLong
      (k, if (k % 17 == 0) null else java.lang.Long.valueOf(k % 7 + 1))
    }.toDF("k", "v")
    val out = GlobalIndex.withGlobalCumsum(df, Seq(col("k")), col("v"),
        numPartitions = 8)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2)))
    assert(out.length === 4000)
    val byKey = out.sortBy(_._1)
    // exclusive: first row starts at 0; each next = prev + prev value
    var acc = 0L
    byKey.foreach { case (_, v, cum) =>
      assert(cum === acc); acc += v
    }
    // no single-partition exchange in the plan
    val plan = GlobalIndex.withGlobalCumsum(df, Seq(col("k")), col("v"),
      numPartitions = 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"))
    spark.catalog.clearCache()
  }
}
