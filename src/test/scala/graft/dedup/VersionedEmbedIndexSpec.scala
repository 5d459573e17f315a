package graft.dedup

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class VersionedEmbedIndexSpec extends SparkSpecBase {

  private def tmp() = java.nio.file.Files
    .createTempDirectory("vembed-spec").toString + "/index"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("append == rebuild: latest-snapshot arbitration matches a fresh index") {
    val emb = Tables.embeddings(spark, sf)
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val base = evens.filter(pmod(col("vec_id"), lit(20)) =!= 0)
    val arriving = evens.filter(pmod(col("vec_id"), lit(20)) === 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val dir = tmp()
    VersionedEmbedIndex.create(base, dir, "vec_id", "embedding", 64, 8)
    VersionedEmbedIndex.append(spark, dir, arriving, "vec_id",
      "embedding", 64, 8)
    val versioned = VersionedEmbedIndex.arbitrate(spark, dir, batch,
      "vec_id", "embedding", 64, 0.45)
    val fresh = DedupOps.incrementalEmbedDedupAgainstIndex(batch,
      DedupOps.buildEmbeddingIndex(evens, "vec_id", "embedding", 64),
      "vec_id", "embedding", 64, 0.45)
    assert(rows(versioned) === rows(fresh))
  }

  test("time travel: v0 arbitration matches a fresh index on the base only") {
    val emb = Tables.embeddings(spark, sf)
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val base = evens.filter(pmod(col("vec_id"), lit(20)) =!= 0)
    val arriving = evens.filter(pmod(col("vec_id"), lit(20)) === 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val dir = tmp()
    VersionedEmbedIndex.create(base, dir, "vec_id", "embedding", 64, 8)
    VersionedEmbedIndex.append(spark, dir, arriving, "vec_id",
      "embedding", 64, 8)
    val travelled = VersionedEmbedIndex.arbitrate(spark, dir, batch,
      "vec_id", "embedding", 64, 0.45, version = 0L)
    val freshBase = DedupOps.incrementalEmbedDedupAgainstIndex(batch,
      DedupOps.buildEmbeddingIndex(base, "vec_id", "embedding", 64),
      "vec_id", "embedding", 64, 0.45)
    assert(rows(travelled) === rows(freshBase))
  }

  test("snapshot isolation: a v0 reader is untouched by a concurrent append") {
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(col("vec_id") < 100)
    val dir = tmp()
    VersionedEmbedIndex.create(base, dir, "vec_id", "embedding", 64, 8)
    val v0 = VersionedEmbedIndex.readIndex(spark, dir, version = 0L)
    val before = v0.count()
    VersionedEmbedIndex.append(spark, dir,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150),
      "vec_id", "embedding", 64, 8)
    // the same frame, re-evaluated after the append, still resolves the
    // explicit v0 file list
    assert(v0.count() === before)
    assert(VersionedEmbedIndex.readIndex(spark, dir).count() > before)
  }
}
