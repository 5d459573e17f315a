package graft.dedup

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** The persisted-index contract: arbitrating a batch against a
  * [[DedupOps.buildCorpusIndex]] frame that went THROUGH A PARQUET ROUND
  * TRIP must be bit-identical to the recompute-everything path
  * ([[DedupOps.incrementalDedup]]), and appending an increment's accepted
  * docs to the index must equal rebuilding it from the grown corpus. */
class IncrementalIndexSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("index parquet round trip equals the recompute path bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)

    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    try {
      DedupOps.buildCorpusIndex(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(dir)
      val reloaded = spark.read.parquet(dir)
      val viaIndex = DedupOps.incrementalDedupAgainstIndex(
        batch, reloaded, "doc_id", "text")
      val recompute = DedupOps.incrementalDedup(
        batch, corpus, "doc_id", "text")
      val a = rows(viaIndex)
      assert(a.nonEmpty, "arbitration must cover every batch doc")
      assert(a == rows(recompute))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("embedding index parquet round trip matches the direct arbitration") {
    val emb = Tables.embeddings(spark, sf)
    val corpus = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_eidx").toString
    try {
      val direct = DedupOps.buildEmbeddingIndex(
        corpus, "vec_id", "embedding", dim = 64)
      direct.write.mode("overwrite").parquet(dir)
      val reloaded = spark.read.parquet(dir)
      def run(idx: org.apache.spark.sql.DataFrame) =
        DedupOps.incrementalEmbedDedupAgainstIndex(batch, idx, "vec_id",
          "embedding", dim = 64, threshold = 0.45)
          .orderBy("vec_id").collect().map(_.toSeq).toSeq
      val viaParquet = run(reloaded)
      assert(viaParquet.nonEmpty, "every batch vector must get a verdict")
      assert(viaParquet == run(direct))
      // both verdicts must be live, or the threshold is degenerate here
      val flags = viaParquet.map(_.last).toSet
      assert(flags === Set(true, false), s"degenerate verdicts: $flags")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("appending an increment to the index equals rebuilding from the grown corpus") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val increment = docs.filter(pmod(col("doc_id"), lit(4)) === 2)
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)

    val appended = DedupOps.buildCorpusIndex(corpus, "doc_id", "text")
      .unionByName(DedupOps.buildCorpusIndex(increment, "doc_id", "text"))
    val rebuilt = DedupOps.buildCorpusIndex(
      corpus.unionByName(increment), "doc_id", "text")
    assert(rows(DedupOps.incrementalDedupAgainstIndex(
        batch, appended, "doc_id", "text")) ==
      rows(DedupOps.incrementalDedupAgainstIndex(
        batch, rebuilt, "doc_id", "text")))
  }
}
