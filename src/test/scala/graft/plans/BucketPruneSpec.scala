package graft.plans

import graft.SparkSpecBase
import graft.pipeline.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class BucketPruneSpec extends SparkSpecBase {
  import spark.implicits._

  private def numFilesRead(q: DataFrame): Long = {
    q.collect() // metrics populate on execution
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scan.size === 1)
    scan.head.metrics("numFiles").value
  }

  test("InjectBucketPruning: plain key predicates prune to their bucket " +
      "dirs; non-key predicates and sidecar-less tables untouched") {
    val dir = java.nio.file.Files.createTempDirectory("bp").toString + "/t"
    val rows = (0L until 400L).map(k => (k, s"v$k"))
    Sinks.writeKeyedBuckets(rows.toDF("k", "v"), dir, "k", 16)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ InjectBucketPruning(spark)
    try {
      // equality: one bucket dir (one file per bucket by construction)
      val q1 = spark.read.parquet(dir).filter(col("k") === 5L)
      assert(q1.select("k", "v").as[(Long, String)].collect().toSeq
        === Seq(5L -> "v5"))
      assert(numFilesRead(q1) === 1L)
      // IN-list: at most |distinct buckets of the probed keys| files
      val q2 = spark.read.parquet(dir).filter(col("k").isin(5L, 7L, 250L))
      assert(q2.select("k").as[Long].collect().toSet === Set(5L, 7L, 250L))
      assert(numFilesRead(q2) <= 3L)
      // semantics preserved under conjunction with non-key predicates
      val q3 = spark.read.parquet(dir)
        .filter(col("k") === 7L && col("v") =!= "nope")
      assert(q3.select("v").as[String].collect().toSeq === Seq("v7"))
      assert(numFilesRead(q3) === 1L)
      // non-key predicate: no injection, full scan
      val q4 = spark.read.parquet(dir).filter(col("v") === "v5")
      assert(q4.select("k").as[Long].collect().toSeq === Seq(5L))
      assert(numFilesRead(q4) === 16L)
      // a partitioned table WITHOUT the sidecar is never touched
      val plainDir = dir + "_plain"
      rows.toDF("k", "v")
        .withColumn("bucket", Sinks.bucketId(col("k"), 16))
        .repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(plainDir)
      val q5 = spark.read.parquet(plainDir).filter(col("k") === 5L)
      assert(q5.select("v").as[String].collect().toSeq === Seq("v5"))
      assert(numFilesRead(q5) === 16L)
    } finally spark.experimental.extraOptimizations = prev
    // rule off: the same key predicate full-scans — the pruning above
    // came from the rule, not from parquet stats
    val q6 = spark.read.parquet(dir).filter(col("k") === 5L)
    assert(numFilesRead(q6) === 16L)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }
}
