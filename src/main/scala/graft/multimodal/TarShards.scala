package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard ingestion — the layout multimodal
  * training corpora actually ship in (Aizman et al., "High Performance
  * I/O For Large Scale Deep Learning", IEEE BigData 2019; the
  * WebDataset convention: a corpus is thousands of .tar shards, each
  * holding member files named `<sample-id>.<ext>`): sequential shard
  * reads amortize object-store latency that millions of loose files
  * cannot. The scan is binaryFile over `*.tar` + a per-shard POSIX
  * tar parse (ustar headers: 512-byte blocks, octal size at offset
  * 124, content padded to block size) — one row per member, bytes as
  * the opaque blob column the decode seam consumes.
  *
  * Scale shape: shards read partition-parallel (binaryFile), the
  * parse is mapPartitions (shard bytes never leave their executor,
  * members stream out as rows), and everything downstream is the
  * proven column machinery. The writer side packs one tar per shard
  * key, executor-side. */
object TarShards {

  private def headerBlock(name: String, size: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(name, 0)
    put("0000644\u0000", 100) // mode
    put("0000000\u0000", 108) // uid
    put("0000000\u0000", 116) // gid
    put(f"$size%011o\u0000", 124) // size, octal
    put("00000000000\u0000", 136) // mtime
    put("        ", 148) // chksum = spaces while summing
    h(156) = '0' // typeflag: regular file
    put("ustar\u0000" + "00", 257) // magic + version
    val sum = h.map(_ & 0xff).sum
    put(f"$sum%06o\u0000 ", 148)
    h
  }

  /** Minimal POSIX/ustar tar of (memberName, bytes) entries. */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, bytes) =>
      out.write(headerBlock(name, bytes.length))
      out.write(bytes)
      val pad = (512 - bytes.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  /** Parse a tar blob into (memberName, bytes) entries; stops at the
    * end-of-archive zero block; malformed trailers yield what parsed
    * cleanly so far (decoder-contract tolerance). */
  def tarEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val nameEnd = (off until off + 100).find(bytes(_) == 0)
        .getOrElse(off + 100)
      val name = new String(bytes, off, nameEnd - off, "US-ASCII")
      val sizeStr = new String(bytes, off + 124, 12, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      if (sizeStr.isEmpty) return out.result()
      val size = java.lang.Long.parseLong(sizeStr, 8).toInt
      val dataOff = off + 512
      if (dataOff + size > bytes.length) return out.result()
      out += name -> java.util.Arrays.copyOfRange(bytes, dataOff,
        dataOff + size)
      off = dataOff + size + (512 - size % 512) % 512
    }
    out.result()
  }

  /** Scan a directory of .tar shards into (shard, media_id, blob):
    * member ids parsed by `idPattern` (first capture group);
    * non-matching members are skipped. */
  def readTarShards(spark: SparkSession, dir: String,
      idPattern: String = "([0-9]+)\\.[a-z0-9]+$"): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("media_id", LongType),
      StructField("blob", BinaryType)))
    val re = idPattern.r
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .rdd.mapPartitions(_.flatMap { r =>
        val shard = r.getString(0).split("/").last
        tarEntries(r.getAs[Array[Byte]](1)).iterator.flatMap {
          case (name, bytes) =>
            re.findFirstMatchIn(name).map(m =>
              Row(shard, m.group(1).toLong, bytes))
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Streaming twin of [[readTarShards]]: tar shards ARRIVING as
    * files (the production shape — a crawler drops shards, the
    * pipeline ingests incrementally) stream through binaryFile's file
    * source, each micro-batch parsing its new shards' members and
    * pHashing them executor-side. With a checkpoint, already-seen
    * shards are never reprocessed across invocations (exactly-once
    * file bookkeeping — the S9 ingest contract, spec-pinned); pair
    * with Trigger.AvailableNow for drain-what-is-present batches.
    * Output rows: (shard, media_id, phash). */
  def tarShardPhashStream(spark: SparkSession, dir: String,
      idPattern: String = "([0-9]+)\\.[a-z0-9]+$")
      : org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val re = idPattern.r
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.tar").schema(schema).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        MultimodalOps.imageIoInMemory
        val shard = path.split("/").last
        tarEntries(bytes).flatMap { case (name, member) =>
          re.findFirstMatchIn(name).flatMap { m =>
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(member))
              if (img == null) None
              else Some((shard, m.group(1).toLong,
                PerceptualHash.pHash8(PerceptualHash.gray8x8(img))))
            } catch { case scala.util.control.NonFatal(_) => None }
          }
        }
      }
  }

  /** q_mm_tar_shards: textures pack 16-per-shard into REAL .tar files
    * (hand-rolled ustar writer, executor-side), scan back through
    * binaryFile + the tar parse, decode, pHash — and the result must
    * equal the SAME closed-form psig oracle plus the shard assignment
    * id div 16, so a header-offset, octal-size, padding, or
    * member-name bug anywhere in the round trip breaks the hash.
    *
    * FIXTURE DRIVE IS LOCAL-MODE-ONLY: executors write the .tar files
    * into a temp dir created on the driver, which is only a shared
    * path when driver and executors share a filesystem (local[n]).
    * The OPERATORS ([[tarBytes]], [[tarEntries]], [[readTarShards]])
    * are cluster-clean; on a real cluster point the drive at a
    * Hadoop-FS path (s3://, hdfs://) instead. The scratch dir is
    * deleted in a finally so a failed scan cannot leak it. */
  private val mmTarShards = Q(
    (s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-tar")
        .toString
      try {
        Tables.documents(s, d)
          .select(col("doc_id").cast("long").as("id"),
            expr("cast(doc_id as long) div 16").as("shard"))
          .repartition(col("shard"))
          .rdd.foreachPartition { it =>
            it.toSeq.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
              val entries = rows.map(_.getLong(0)).sorted.map(id =>
                s"$id.png" -> PerceptualHash.synthTexturePng(id))
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dir, f"shard-$shard%05d.tar"),
                tarBytes(entries))
            }
          }
        val scanned = readTarShards(s, dir)
        PerceptualHash.pHashImages(scanned, "media_id", "blob")
          .join(scanned.select(col("media_id"), col("shard")), "media_id")
          .select(col("media_id").as("id"), col("shard"), col("phash"))
          .orderBy("id")
          .localCheckpoint(eager = true)
      } finally {
        org.apache.hadoop.fs.FileSystem.getLocal(
          s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(dir), true)
        ()
      }
    },
    // pad-only shard name: DuckDB lpad TRUNCATES to the target length
    // (lpad('123456',5,'0') = '12345'), so a naked lpad diverges from
    // the writer's %05d (pad-only) once doc_id div 16 exceeds 5 digits
    Some("WITH " + PerceptualHash.phashSigCtes + """,
        sn AS (SELECT id, phash, CAST(id // 16 AS VARCHAR) AS v FROM psig)
        SELECT id,
          'shard-' || CASE WHEN len(v) >= 5 THEN v
                           ELSE lpad(v, 5, '0') END || '.tar' AS shard,
          phash
        FROM sn ORDER BY id"""))

  val queries: Map[String, Q] = Map("q_mm_tar_shards" -> mmTarShards)
}
