package graft.sim

import graft.SparkSpecBase
import graft.pipeline.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class VersionedIvfSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic synthetic vectors: 40 ids × 8 dims, integer-derived
  // doubles so every assignment is exact
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      (i, (0 until 8).map(j => ((i * 7 + j * 3) % 11).toDouble).toArray)
    }.toDF("vec_id", "embedding")

  private val baseIds = (0L until 40L).filter(_ % 5 != 0)
  private val batchIds = (0L until 40L).filter(_ % 5 == 0)

  private def postings(df: DataFrame): Set[(Long, Long)] =
    df.select("id", "list").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("append against the frozen quantizer ≡ assigning the full corpus " +
      "in one shot; probe(version=0) time-travels to the pre-append index") {
    val dir = java.nio.file.Files.createTempDirectory("vivf").toString + "/ix"
    val base = vecs(baseIds)
    VersionedIvf.create(base, dir, "vec_id", "embedding",
      nList = 4, numBuckets = 4)
    VersionedIvf.append(spark, dir, vecs(batchIds), "vec_id", "embedding",
      numBuckets = 4)

    // incremental ≡ full rebuild EXACTLY (frozen quantizer)
    val cent = VersionedIvf.quantizer(spark, dir)
    val full = SimilarityOps.assignToLists(
      SimilarityOps.prep(vecs(0L until 40L), "vec_id", "embedding"), cent)
    assert(postings(VersionedIvf.readIndex(spark, dir)) === postings(full))

    // version 0 is exactly the base postings
    val baseOnly = SimilarityOps.assignToLists(
      SimilarityOps.prep(base, "vec_id", "embedding"), cent)
    assert(postings(VersionedIvf.readIndex(spark, dir, version = 0L))
      === postings(baseOnly))

    // probing the time-traveled snapshot ≡ probing a fresh base-only index
    val q = vecs(Seq(1L, 2L))
    val got = VersionedIvf.probe(spark, dir, q, "vec_id", "embedding",
        nProbe = 2, k = 3, numBuckets = 4, version = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = SimilarityOps.probeIvf(baseOnly, cent, q, "vec_id",
        "embedding", nProbe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("snapshot isolation: a probe plan resolved before a concurrent " +
      "append still reads the pre-append snapshot; no existing file is " +
      "touched by the append") {
    val dir = java.nio.file.Files.createTempDirectory("vivf2").toString + "/ix"
    VersionedIvf.create(vecs(baseIds), dir, "vec_id", "embedding",
      nList = 4, numBuckets = 4)
    // reader resolves its manifest NOW (latest = v0)
    val snapshot = VersionedIvf.readIndex(spark, dir)
    def files() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/data"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.lastModified(), f.length())).toMap
    }
    val before = files()
    VersionedIvf.append(spark, dir, vecs(batchIds), "vec_id", "embedding",
      numBuckets = 4)
    // the captured snapshot collects ONLY base postings, append landed
    val ids = snapshot.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === baseIds.toSet)
    // append-only commit: every pre-existing file byte-identical
    val after = files()
    before.foreach { case (p, sig) => assert(after(p) === sig) }
    assert(after.size > before.size)
    assert(VersionedTable.latestVersion(spark, dir) === 1L)
  }

  test("quantizer is frozen: a second create at the same dir refuses to " +
      "overwrite it") {
    val dir = java.nio.file.Files.createTempDirectory("vivf3").toString + "/ix"
    VersionedIvf.create(vecs(baseIds), dir, "vec_id", "embedding",
      nList = 4, numBuckets = 4)
    intercept[Exception] {
      VersionedIvf.create(vecs(batchIds), dir, "vec_id", "embedding",
        nList = 4, numBuckets = 4)
    }
  }

  test("vacuum beyond the probed version fails loudly; latest survives") {
    val dir = java.nio.file.Files.createTempDirectory("vivf4").toString + "/ix"
    VersionedIvf.create(vecs(baseIds), dir, "vec_id", "embedding",
      nList = 4, numBuckets = 4)
    VersionedIvf.append(spark, dir, vecs(batchIds), "vec_id", "embedding",
      numBuckets = 4)
    VersionedTable.vacuum(spark, dir, keep = 1)
    intercept[IllegalArgumentException] {
      VersionedIvf.readIndex(spark, dir, version = 0L).collect()
    }
    assert(VersionedIvf.readIndex(spark, dir).count() === 40L)
  }
}
