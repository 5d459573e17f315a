package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def sample(n: Int) = {
    val rnd = new scala.util.Random(31)
    // duplicated values planted so the trailing id tie-break matters
    (0 until n).map(i =>
      (s"g${rnd.nextInt(50)}", rnd.nextInt(500).toDouble, i.toLong))
      .toDF("g", "v", "id").repartition(7)
  }

  test("exact equality with the window encoding, ties broken by the " +
      "trailing total-order column") {
    val df = sample(40000).cache()
    val got = GroupedTopK.topK(df, Seq("g"),
        Seq("v" -> true, "id" -> false), 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(got === want)
    assert(got.size === 250) // 50 groups x 5
    df.unpersist()
  }

  test("k larger than the group keeps whole groups; single-row groups " +
      "survive") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 9.0, 3L))
      .toDF("g", "v", "id").repartition(3)
    val got = GroupedTopK.topK(df, Seq("g"),
        Seq("v" -> true, "id" -> false), 5)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("forced-low-threshold partial fallback matches the window " +
      "encoding row-for-row; default threshold restores filtering") {
    // threshold far below groups×k: the partial tracks only the first
    // few groups per partition and STREAMS every other row through to
    // the final pass — results must be identical to the never-degraded
    // path and the window encoding
    spark.conf.set("spark.graft.groupedTopK.partialMaxRows", "7")
    try {
      val df = sample(40000).cache()
      try {
        val got = GroupedTopK.topK(df, Seq("g"),
            Seq("v" -> true, "id" -> false), 5)
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
          .toSet
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
        val want = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5).drop("rn")
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
          .toSet
        assert(got === want)
        assert(got.size === 250)
      } finally df.unpersist()
    } finally
      spark.conf.unset("spark.graft.groupedTopK.partialMaxRows")
  }

  test("q_a10's native routing equals the flatMapGroups grouped-" +
      "iteration surface row-for-row") {
    val native = graft.etl.Relational.queries("q_a10_grouped_topn")
      .fn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val iterate = graft.etl.Relational.groupedTopNIterate(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(native === iterate)
    assert(native.nonEmpty)
  }

  test("plan shape: partial before the exchange, final after, exchange " +
      "keyed on the group") {
    val plan = GroupedTopK.topK(sample(1000), Seq("g"),
        Seq("v" -> true, "id" -> false), 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("GroupedTopKPartial"), plan)
    assert(plan.contains("GroupedTopKFinal"), plan)
    assert(plan.contains("hashpartitioning(g"), plan)
    // partial must appear BELOW the exchange (later in the tree print)
    assert(plan.indexOf("GroupedTopKFinal") <
      plan.indexOf("GroupedTopKPartial"), plan)
  }
}
