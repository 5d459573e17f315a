package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, processed by a pluggable per-partition
  * decoder.
  *
  * The Spark-side shape is the deliverable — schema, partition batching,
  * decoder signature — with two [[MediaDecoder]] instances behind it:
  * [[ImageIoDecoder]], a REAL pure-JVM image decode (javax.imageio — PNG
  * and friends, true pixel dims + channel moments), and [[StubDecoder]],
  * a deterministic byte-statistics fake whose arithmetic is SQL-replicable
  * and therefore carries the DuckDB oracle (media decoding itself has no
  * cross-engine oracle). Audio/video codecs aren't in this container —
  * swapping in ffmpeg/JNI changes only the decoder instance, not the
  * pipeline.
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

  /** REAL pure-JVM image decoder over javax.imageio (PNG/GIF/BMP/JPEG —
    * whatever ImageIO service providers the JRE ships). Per blob:
    * container format name, true pixel dimensions, and an 8-dim feature
    * vector of exact-integer channel moments (mean A/R/G/B, mean luma,
    * luma second moment, width, height) — the same
    * int-sum → double-divide → float-cast arithmetic shape as
    * [[StubDecoder]], so features are deterministic and replicable.
    * Undecodable blobs map to format "unknown" with -1 dims rather than
    * failing the partition (a 100 TB scrape always contains garbage).
    * ImageIO's reader registry is JVM-static, so per-partition amortization
    * needs no extra state. */
  object ImageIoDecoder extends MediaDecoder {
    override def decodePartition(blobs: Iterator[(Long, Array[Byte])])
        : Iterator[(Long, MediaFeatures)] =
      blobs.map { case (id, bytes) => id -> decodeOne(bytes) }

    private def decodeOne(bytes: Array[Byte]): MediaFeatures = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          return MediaFeatures(bytes.length.toLong, "unknown", -1, -1,
            Array.fill(8)(0f))
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val img = reader.read(0)
          val w = img.getWidth
          val h = img.getHeight
          var sa, sr, sg, sb, sl, sll = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y) // ARGB, color-model-converted
              val a = (p >>> 24) & 0xff
              val r = (p >>> 16) & 0xff
              val g = (p >>> 8) & 0xff
              val b = p & 0xff
              // integer-weighted luma (ITU-R 601 in 1/1000ths) keeps the
              // sums exact, so the float features are order-independent
              val l = 299L * r + 587L * g + 114L * b
              sa += a; sr += r; sg += g; sb += b; sl += l; sll += l * l / 1000L
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          def m(s: Long) = if (n == 0) 0f else (s.toDouble / n).toFloat
          MediaFeatures(bytes.length.toLong, fmt, w, h,
            Array(m(sa), m(sr), m(sg), m(sb), m(sl / 1000L), m(sll / 1000L),
              w.toFloat, h.toFloat))
        } finally reader.dispose()
      } catch {
        case scala.util.control.NonFatal(_) =>
          MediaFeatures(bytes.length.toLong, "unknown", -1, -1,
            Array.fill(8)(0f))
      } finally iis.close()
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
