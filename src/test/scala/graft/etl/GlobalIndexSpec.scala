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

  test("grouped index: per-group ranks 1..n_g, totals, order-aligned") {
    // 3 groups of uneven size, values inserted out of order, duplicates
    // included (ties must land in one range partition and take a
    // contiguous run of ranks)
    val df = (0 until 6000).map { i =>
      val g = "g" + (i % 7919 % 3)
      (g, (i * 104729 % 500).toLong)
    }.toDF("g", "v")
    val out = GlobalIndex.withGroupedIndex(df, Seq("g"), Seq(col("v")),
        numPartitions = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.length === 6000)
    out.groupBy(_._1).foreach { case (g, rows) =>
      val n = rows.length.toLong
      assert(rows.forall(_._4 === n), s"group $g: totals wrong")
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1L to n), s"group $g: ranks not 1..$n")
      assert(byRank.map(_._2).toSeq === byRank.map(_._2).sorted.toSeq,
        s"group $g: rank order not value order")
    }
    spark.catalog.clearCache()
  }

  test("grouped median off the grouped index equals the windowed median") {
    // the q_a14 shape: two middle order statistics per group, averaged —
    // fast path (grouped index) vs the former PARTITION BY g window
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 5001).map { i =>
      ("g" + (i % 3), (i * 7919 % 1000) / 8.0) }.toDF("g", "x")
    def viaWindow = {
      val w = Window.partitionBy("g").orderBy(col("x"))
      val cw = Window.partitionBy("g")
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(cw))
        .filter(col("rn") === floor((col("cnt") + 1) / 2).cast("long") ||
          col("rn") === floor(col("cnt") / 2).cast("long") + 1)
        .groupBy("g").agg(avg("x").as("med"))
    }
    def viaIndex =
      GlobalIndex.withGroupedIndex(df, Seq("g"), Seq(col("x")),
          numPartitions = 8)
        .filter(col("rn") === floor((col("cnt") + 1) / 2).cast("long") ||
          col("rn") === floor(col("cnt") / 2).cast("long") + 1)
        .groupBy("g").agg(avg("x").as("med"))
    val a = viaWindow.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = viaIndex.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a === b)
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
