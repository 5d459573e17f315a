package graft.sketch

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  test("estimates never underestimate; exact when width is not contended") {
    val df = (1 to 100).flatMap(i => Seq.fill(i % 5 + 1)(i.toLong))
      .toDF("k")
    val sketch = CountMin.countMinSketch(df, "k")
    val keys = df.distinct()
    val est = CountMin.cmsEstimate(sketch, keys, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k underestimated: ${est(k)} < $c")
    }
    // 100 keys in 4×256 counters: most keys should be exact
    val exactHits = exact.count { case (k, c) => est(k) == c }
    assert(exactHits > 80, s"only $exactHits/100 exact at low contention")
  }

  test("streaming CMS: counter grid over a stream equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = CountMin.countMinSketch(input.toDF().toDF("k"), "k")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    val batch1 = (1L to 200L).map(_ % 31)
    val batch2 = (1L to 150L).map(_ % 17)
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = CountMin.countMinSketch(
        (batch1 ++ batch2).toDF("k"), "k").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed === batch,
      "the streaming counter state must equal the batch-built sketch")
  }

  test("two half-sketches merged by counter addition equal the full sketch") {
    val all = (1L to 400L).map(i => i % 37).toDF("k")
    val half1 = CountMin.countMinSketch(all.filter($"k" % 2 === 0), "k")
    val half2 = CountMin.countMinSketch(all.filter($"k" % 2 =!= 0), "k")
    val merged = half1.unionByName(half2)
      .groupBy("j", "b").agg(sum("cnt").as("cnt"))
    val full = CountMin.countMinSketch(all, "k")
    val m = merged.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val f = full.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m === f, "CMS must merge by pure counter addition")
  }
}
