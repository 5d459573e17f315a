package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, processed by a pluggable per-partition
  * decoder.
  *
  * The Spark-side shape is the real deliverable here — schema, partition
  * batching, decoder signature — while the actual media decode is STUBBED
  * (this container has no image/audio libraries): [[StubDecoder]] produces
  * deterministic fake features from the raw bytes. Swapping in a real
  * decoder (JNI/ffmpeg/ImageIO) changes only the [[MediaDecoder]] instance,
  * not the pipeline.
  */
object MultimodalOps {

  /** One decoded media record. */
  final case class MediaFeatures(
      nBytes: Long, format: String, width: Int, height: Int,
      features: Array[Float])

  /** Decoder contract: called once per partition with an iterator of blobs —
    * implementations amortize codec/model init across the whole partition
    * (the mapInPandas batching idiom, natively in Scala). */
  trait MediaDecoder extends Serializable {
    def decodePartition(blobs: Iterator[(Long, Array[Byte])])
        : Iterator[(Long, MediaFeatures)]
  }

  /** STUB decoder — deterministic fake decode: "dimensions" and an 8-dim
    * "feature vector" derived from byte statistics. Marks where a real
    * image/audio codec would run. */
  object StubDecoder extends MediaDecoder {
    override def decodePartition(blobs: Iterator[(Long, Array[Byte])])
        : Iterator[(Long, MediaFeatures)] =
      blobs.map { case (id, bytes) =>
        val n = bytes.length
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feats = Array.tabulate(8) { i =>
          if (n == 0) 0f
          else bytes.iterator.zipWithIndex.filter(_._2 % 8 == i)
            .map(x => (x._1 & 0xff).toFloat).sum / n
        }
        id -> MediaFeatures(n.toLong, "stub",
          width = (sum % 640).toInt, height = (sum % 480).toInt, feats)
      }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Run a decoder over a (id, binary) frame. Partition-parallel; the blob
    * column never leaves the executor it was read on. */
  def decodeFeatures(df: DataFrame, idCol: String, blobCol: String,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .rdd.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .mapPartitions(decoder.decodePartition)
      .map { case (id, f) =>
        Row(id, f.nBytes, f.format, f.width, f.height, f.features.toSeq)
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  // -- registered queries -------------------------------------------------

  /** Binary-column plumbing with an oracle on the SQL-expressible parts:
    * byte length and sha256 of the blob (text bytes stand in for media). */
  private val mmBinary = Q(
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha
            FROM documents ORDER BY doc_id"""))

  /** Stub decode through the real mapPartitions pipeline — rows-only check
    * (the stub features are engine-internal). */
  private val mmDecode = Q(
    (s, d) => graft.Q.serializeArrays(decodeFeatures(
      Tables.documents(s, d).withColumn("blob", col("text").cast("binary")),
      "doc_id", "blob").orderBy("media_id")))

  /** The decode pipeline's integer byte math (n_bytes, width, height) is
    * SQL-expressible on ASCII text, so this variant runs the REAL
    * mapPartitions decoder and hash-checks everything except the float
    * feature vector against a DuckDB byte-sum oracle. */
  private val mmDecodeDims = Q(
    (s, d) => decodeFeatures(
      Tables.documents(s, d).withColumn("blob", col("text").cast("binary")),
      "doc_id", "blob")
      .select("media_id", "n_bytes", "format", "width", "height")
      .orderBy("media_id"),
    Some("""SELECT CAST(doc_id AS BIGINT) AS media_id,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   'stub' AS format,
                   CAST(COALESCE(list_sum(list_transform(range(1, length(text)+1),
                        i -> ascii(substr(text, i, 1)))), 0) % 640 AS INTEGER) AS width,
                   CAST(COALESCE(list_sum(list_transform(range(1, length(text)+1),
                        i -> ascii(substr(text, i, 1)))), 0) % 480 AS INTEGER) AS height
            FROM documents ORDER BY media_id"""))

  val queries: Map[String, Q] = Map(
    "q_mm_binary_meta" -> mmBinary,
    "q_mm_stub_decode" -> mmDecode,
    "q_mm_decode_dims" -> mmDecodeDims)
}
