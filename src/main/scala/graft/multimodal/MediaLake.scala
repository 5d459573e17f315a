package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-based media-lake ingestion — the missing ENTRY of the
  * multimodal family: real pipelines receive imagery/audio as
  * DIRECTORIES OF FILES, not pre-assembled blob columns, and Spark's
  * `binaryFile` source is the scan for exactly that (one row per
  * file: path, length, content; no decode on the scan — bytes land
  * as an opaque binary column, the brief's multimodal contract).
  * From there the proven column operators take over unchanged: the
  * decode seam, dHash/pHash, fingerprints.
  *
  * Scale shape: binaryFile is a real FileFormat — distributed
  * listing, partition-parallel reads, `pathGlobFilter` pushdown,
  * and `maxPartitionBytes` packing apply as for parquet; the id
  * parse is one regexp in the scan projection. Files never funnel
  * through the driver. */
object MediaLake {

  /** Scan a directory of media files into (media_id, blob): id parsed
    * from the file name by `idPattern` (first capture group). Files
    * whose names do not match are dropped (foreign files in the lake
    * directory are the norm, not an error). */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*.png",
      idPattern: String = "([0-9]+)\\.[a-z0-9]+$"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(regexp_extract(col("path"), idPattern, 1).as("__id"),
        col("content").as("blob"))
      .filter(col("__id") =!= "")
      .select(col("__id").cast("long").as("media_id"), col("blob"))

  /** q_mm_binary_lake: the full file round trip, hash-gated — the
    * synthetic textures land as REAL .png FILES (written
    * executor-side), scan back through binaryFile, decode with
    * ImageIO, pHash — and the result must equal the SAME closed-form
    * pHash oracle as q_mm_phash_neardup, so a bug anywhere in the
    * write → list → scan → id-parse → decode chain breaks the hash.
    *
    * FIXTURE DRIVE IS LOCAL-MODE-ONLY: executors write the .png files
    * into a temp dir created on the driver, which is only a shared
    * path when driver and executors share a filesystem (local[n]).
    * The OPERATOR ([[readMediaDir]]) is cluster-clean; on a real
    * cluster point the drive at a Hadoop-FS path (s3://, hdfs://).
    * The scratch dir is deleted in a finally so a failed scan cannot
    * leak it. */
  private val mmBinaryLake = Q(
    (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-lake")
        .toString
      try {
        MultimodalOps.spreadIds(
            Tables.documents(s, d).select(col("doc_id").cast("long")))
          .rdd.foreachPartition { it =>
            it.foreach { r =>
              val id = r.getLong(0)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dir, s"$id.png"),
                PerceptualHash.synthTexturePng(id))
            }
          }
        PerceptualHash.pHashImages(
          readMediaDir(s, dir), "media_id", "blob")
          .select(col("media_id").as("id"), col("phash"))
          .orderBy("id")
          .localCheckpoint(eager = true)
      } finally {
        org.apache.hadoop.fs.FileSystem.getLocal(
          s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(dir), true)
        ()
      }
    },
    Some("WITH " + PerceptualHash.phashSigCtes + """
        SELECT id, phash FROM psig ORDER BY id"""))

  val queries: Map[String, Q] = Map("q_mm_binary_lake" -> mmBinaryLake)
}
