package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VersionedGramIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val span = "x" * 60 // one 60-char block: 11 overlapping 50-grams

  test("append == rebuild, and time travel probes the pre-append index") {
    val base = Seq((0L, s"base doc carries $span inside it"))
      .toDF("doc_id", "text")
    val arriving = Seq((2L, s"arrival carries ${"y" * 60} only"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"batch one carries $span too"),
      (3L, s"batch three carries ${"y" * 60} as well"),
      (5L, "batch five carries nothing duplicated at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("vgram-spec")
      .toString + "/idx"
    VersionedGramIndex.create(base, dir, "doc_id", "text")
    VersionedGramIndex.append(spark, dir, arriving, "doc_id", "text")

    val v1 = VersionedGramIndex.probe(spark, dir, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // latest snapshot knows both spans
    assert(v1 === Set(1L, 3L))
    // v0 predates the y-span commit: only the x-span doc flags
    val v0 = VersionedGramIndex.probe(spark, dir, batch, "doc_id", "text",
      version = 0L).select("doc_id").as[Long].collect().toSet
    assert(v0 === Set(1L))
    // append == rebuild: v1 probe equals a from-scratch index probe
    val rebuilt = DupClusters.exactSpansVsIndex(batch,
      DupClusters.buildSpanIndex(base.unionByName(arriving), "doc_id",
        "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(rebuilt === v1)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(new java.io.File(dir).getParent))
  }

  test("duplicate keys across commits leave probe verdicts unchanged") {
    val base = Seq((0L, s"carrier of $span here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("vgram-spec2")
      .toString + "/idx"
    VersionedGramIndex.create(base, dir, "doc_id", "text")
    // re-commit the SAME doc's grams: key multiplicity is invisible to
    // the left-semi probe
    VersionedGramIndex.append(spark, dir, base, "doc_id", "text")
    val batch = Seq((1L, s"probe with $span embedded")).toDF("doc_id", "text")
    val out = VersionedGramIndex.probe(spark, dir, batch, "doc_id", "text")
      .collect()
    assert(out.length === 1 && out(0).getAs[Long]("doc_id") === 1L)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(new java.io.File(dir).getParent))
  }
}
