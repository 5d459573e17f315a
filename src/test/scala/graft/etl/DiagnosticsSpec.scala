package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DiagnosticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("partitionStats: balanced after round-robin, skewed after a " +
      "hot-key hash partitioning") {
    val skewed = (1 to 10000).map(i => if (i % 10 < 9) 1L else i.toLong)
      .toDF("k")
    val balanced = Diagnostics.partitionStats(skewed.repartition(4)).head()
    assert(balanced.getAs[Long]("n_partitions") === 4L)
    assert(balanced.getAs[Double]("skew_factor") <= 1.2)
    // hash-partitioning on the 90%-hot key melts one partition
    val hot = Diagnostics.partitionStats(
      skewed.repartition(4, col("k"))).head()
    assert(hot.getAs[Double]("skew_factor") >= 2.0,
      s"expected hot partition, got $hot")
  }

  test("keySkew: the hot key surfaces with its exact share, dwarfing " +
      "the uniform baseline") {
    val df = ((1 to 9000).map(_ => "hot") ++ (1 to 1000).map(i => s"k$i"))
      .toDF("key")
    val rows = Diagnostics.keySkew(df, "key", k = 3).collect()
    assert(rows.head.getAs[String]("key") === "hot")
    assert(rows.head.getAs[Long]("n") === 9000L)
    assert(rows.head.getAs[Double]("share") === 0.9)
    assert(rows.head.getAs[Double]("uniform_share") <= 0.01)
  }
}
