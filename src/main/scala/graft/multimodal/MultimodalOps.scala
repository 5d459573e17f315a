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
        // feature i = mean contribution of bytes at positions ≡ i (mod 8):
        // exact integer sum → one double division → float32 quantization.
        // This arithmetic shape is cross-engine replicable (the oracle does
        // the identical int-sum / double-divide / float-cast), unlike a
        // float-accumulated sum whose rounding is order-dependent.
        val feats = Array.tabulate(8) { i =>
          if (n == 0) 0f
          else {
            var s = 0L
            var j = i
            while (j < n) { s += bytes(j) & 0xff; j += 8 }
            (s.toDouble / n).toFloat
          }
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

  /** Stub decode through the real mapPartitions pipeline, fully
    * hash-checked: the 8 feature values are emitted as per-feature DOUBLE
    * columns (exact widening of the stored float32 — no float-JSON
    * formatting ambiguity) and the oracle replays the same
    * int-sum/double-divide/float-cast per byte-residue class. */
  private val mmDecode = Q(
    (s, d) => {
      val decoded = decodeFeatures(
        Tables.documents(s, d).withColumn("blob", col("text").cast("binary")),
        "doc_id", "blob")
      decoded.select(
        Seq(col("media_id"), col("n_bytes"), col("format"),
          col("width"), col("height")) ++
        (0 until 8).map(i =>
          element_at(col("features"), i + 1).cast("double").as(s"f$i")): _*)
        .orderBy("media_id")
    },
    Some {
      val feat = (0 until 8).map { i =>
        s"""CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE)
           ELSE CAST(CAST(CAST(COALESCE(list_sum(list_transform(
                  list_filter(range(1, length(text) + 1), p -> (p - 1) % 8 = $i),
                  p -> ascii(substr(text, CAST(p AS INT), 1)))), 0) AS DOUBLE)
                / length(text) AS REAL) AS DOUBLE) END AS f$i"""
      }.mkString(",\n                   ")
      s"""SELECT CAST(doc_id AS BIGINT) AS media_id,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   'stub' AS format,
                   CAST(COALESCE(list_sum(list_transform(range(1, length(text)+1),
                        i -> ascii(substr(text, i, 1)))), 0) % 640 AS INTEGER) AS width,
                   CAST(COALESCE(list_sum(list_transform(range(1, length(text)+1),
                        i -> ascii(substr(text, i, 1)))), 0) % 480 AS INTEGER) AS height,
                   $feat
            FROM documents ORDER BY media_id"""
    })

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
