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

  test("InjectBucketPruning on JOIN keys: a small dim joined on the " +
      "bucket key dynamically prunes the fact scan to the dim's buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bpj").toString + "/t"
    val rows = (0L until 400L).map(k => (k, s"v$k"))
    Sinks.writeKeyedBuckets(rows.toDF("k", "v"), dir, "k", 16)
    val dimDir = dir + "_dim"
    Seq((5L, "a"), (7L, "b"), (250L, "c")).toDF("k", "tag")
      .write.parquet(dimDir)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ InjectBucketPruning(spark)
    try {
      // join plans run under AQE: AdaptiveSparkPlanExec and query stages
      // are leaf wrappers, so scan collection must recurse through them
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allScans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allScans(qs.plan)
          case s: FileSourceScanExec => Seq(s)
        }.flatten
      def factScanFiles(q: DataFrame): Long = {
        q.collect()
        val scans = allScans(q.queryExecution.executedPlan).filter(
          _.relation.location.rootPaths.exists(_.toString.endsWith("/t")))
        assert(scans.size === 1, q.queryExecution.executedPlan.toString)
        scans.head.metrics("numFiles").value
      }
      val fact = spark.read.parquet(dir)
      val dim = spark.read.parquet(dimDir)
      // inner equi-join on the bucket key: only the dim keys' buckets read
      val q1 = fact.join(dim, Seq("k"))
      assert(q1.select("k", "tag").as[(Long, String)].collect().toSet
        === Set((5L, "a"), (7L, "b"), (250L, "c")))
      assert(factScanFiles(q1) <= 3L, "fact side not dynamically pruned")
      // the injected subquery is visible in the final plan
      assert(q1.queryExecution.executedPlan.toString
        .contains("dynamicpruning"), q1.queryExecution.executedPlan.toString)
      // left-outer with the FACT on the left must NOT prune the fact side
      // (all fact rows survive)
      val q2 = fact.join(dim, Seq("k"), "left")
      assert(q2.count() === 400L)
      assert(factScanFiles(q2) === 16L)
      // semantics with extra predicates on both sides stay correct
      val q3 = fact.filter(col("v") =!= "zzz")
        .join(dim.filter(col("tag") =!= "b"), Seq("k"))
      assert(q3.select("k").as[Long].collect().toSet === Set(5L, 250L))
      assert(factScanFiles(q3) <= 3L)
    } finally spark.experimental.extraOptimizations = prev
    // rule off: the same join full-scans the fact side
    def allScans2(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans2(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans2(qs.plan)
        case s: FileSourceScanExec => Seq(s)
      }.flatten
    val q4 = spark.read.parquet(dir).join(spark.read.parquet(dimDir), Seq("k"))
    q4.collect()
    val scans = allScans2(q4.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.endsWith("/t")))
    assert(scans.head.metrics("numFiles").value === 16L)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)
  }
}
