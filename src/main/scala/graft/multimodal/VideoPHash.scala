package graft.multimodal

import graft.{Q, Tables}
import graft.functions.SimHash64
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Frame-sampled video near-duplicate detection: the video leg of the
  * perceptual-dedup family. A re-encoded / re-containered video keeps
  * its FRAMES perceptually intact, so the published shape (frame-level
  * perceptual hashing + per-frame matching + clip-level voting — the
  * construction behind content-ID systems; frame pHash per Zauner
  * 2010) is: stride-sample frames from the container, pHash each
  * sampled frame, call two clips near-duplicates when ENOUGH sampled
  * frame positions match within a Hamming budget.
  *
  * Exactness: per-frame hashing is the integer-DCT
  * [[PerceptualHash.pHash8]] (fixed-point table, order-statistic
  * median — NUMERIC_CONVENTION rule 1), the frame match is the exact
  * banded-Hamming predicate, and the clip vote is a COUNT — every
  * stage replays bit-for-bit in the oracle.
  *
  * Scale shape: container parse + frame decode + hash in ONE
  * mapPartitions pass (no shuffle, blobs never leave their executor;
  * output is hashes only — 8 bytes per sampled frame, a ~million-fold
  * reduction before anything shuffles). Pair generation joins on
  * (frame_idx, 16-bit band) keys — LSH candidates, never all-pairs —
  * and the clip vote is one keyed groupBy. At 100 TB the shuffle
  * carries only (id, frame_idx, hash) triples. */
object VideoPHash {

  /** pHash every `stride`-th frame of GFV1 video blobs (per-frame
    * decode via ImageIO — real for PNG payloads). Output:
    * (media_id, frame_idx, phash); malformed containers and
    * undecodable frames contribute no rows (the decoder contract). */
  def videoPHash(df: DataFrame, idCol: String, blobCol: String,
      stride: Int = 2): DataFrame = {
    require(stride >= 1)
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", LongType),
      StructField("phash", LongType)))
    val rows = df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .rdd.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .mapPartitions { it =>
        MultimodalOps.imageIoInMemory
        it.flatMap { case (id, bytes) =>
        MultimodalOps.videoFrames(bytes).iterator.flatMap { case (_, frames) =>
          frames.iterator.zipWithIndex
            .filter(_._2 % stride == 0)
            .flatMap { case (f, i) =>
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(f))
                if (img == null) None
                else Some(Row(id, i.toLong,
                  PerceptualHash.pHash8(PerceptualHash.gray8x8(img))))
              } catch {
                case scala.util.control.NonFatal(_) => None
              }
            }
        }
      }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Clip near-dup pairs over per-frame hashes: frames match when they
    * share a frame position, a 16-bit hash band (LSH candidate), and
    * Hamming ≤ `maxHamming`; clips pair when ≥ `minFrames` positions
    * match. Output: (ida, idb, n_matched). */
  def videoNearDupPairs(frames: DataFrame, maxHamming: Int,
      minFrames: Int): DataFrame = {
    // r16 (guide §5): both join sides read the frame-hash frame — cached,
    // or the GFV1 parse + per-frame PNG decode + DCT runs twice
    val framesC = frames.cache()
    val banded = framesC.select(col("media_id"), col("frame_idx"),
      col("phash"),
      explode(array((0 until 4).map(bnd =>
        struct(lit(bnd).as("band"),
          shiftrightunsigned(col("phash"), bnd * 16)
            .bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
    val a = banded.select(col("media_id").as("ida"), col("frame_idx"),
      col("phash").as("ha"), col("bk"))
    val b = banded.select(col("media_id").as("idb"), col("frame_idx"),
      col("phash").as("hb"), col("bk"))
    a.join(b, Seq("bk", "frame_idx")).filter(col("ida") < col("idb"))
      .select("ida", "idb", "frame_idx", "ha", "hb").distinct()
      .withColumn("hamming", SimHash64.hammingDist(col("ha"), col("hb")))
      .filter(col("hamming") <= maxHamming)
      .groupBy("ida", "idb")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minFrames)
  }

  /** Deterministic GFV1 clip per id: 3 + id mod 3 PNG frames; every
    * frame carries the clip's group texture (g = id mod 251, the
    * [[PerceptualHash.synthTexturePng]] hash pattern — a static scene)
    * perturbed per frame by a MILD delta ((id div 64) + f) mod 5 − 2
    * at pixel ((id + f) mod 8, ((id div 8) + f) mod 8). Clips sharing
    * g render near-identical frame sequences (≤ 2 perturbed pixels
    * per frame pair → pHash distance ≤ ~4); distinct g land ≥ 22 bits
    * apart per frame. */
  private[multimodal] def synthTextureClip(id: Long): Array[Byte] = {
    val nf = (3 + id % 3).toInt
    val frames = (0 until nf).map { f =>
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      val g = id % 251
      val pr = ((id + f) % 8).toInt
      val pc = ((id / 8 + f) % 8).toInt
      val d = ((id / 64 + f) % 5 - 2).toInt
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val base = (((g * 73856093L) ^ (r * 19349663L) ^
            (c * 83492791L)) % 251).toInt
          val v = if (r == pr && c == pc)
            math.min(250, math.max(0, base + d)) else base
          raster.setSample(c, r, 0, v)
          c += 1
        }
        r += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      MultimodalOps.imageIoInMemory
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    MultimodalOps.gfv1(frames)
  }

  /** q_mm_video_phash: REAL GFV1 build → parse → stride-2 PNG frame
    * decode → integer-DCT pHash per frame → per-position banded
    * Hamming match at ≤ 6 → clip pairs with ≥ 2 matched positions.
    * Sampled positions are {0, 2} (and 4 for 5-frame clips), so every
    * same-texture clip pair shares ≥ 2 matchable positions whatever
    * their lengths. The oracle replays pixels, DCT, median, pack,
    * band predicate, and the vote from the closed form. */
  private val mmVideoPhash = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"))
      val rdd = MultimodalOps.spreadIds(docs).rdd.map(r =>
        Row(r.getLong(0), synthTextureClip(r.getLong(0))))
      val withBlob = s.createDataFrame(rdd, StructType(Seq(
        StructField("doc_id", LongType), StructField("blob", BinaryType))))
      val frames = videoPHash(withBlob, "doc_id", "blob", stride = 2)
      videoNearDupPairs(frames, maxHamming = 6, minFrames = 2)
        .orderBy("ida", "idb")
    },
    Some {
      val tblRows = (for (u <- 0 until 8; x <- 0 until 8)
        yield s"($u, $x, ${PerceptualHash.dctT(u)(x)})").mkString(", ")
      s"""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
          ptbl(u, x, t) AS (VALUES $tblRows),
          fr AS (SELECT id, CAST(f AS BIGINT) AS f
            FROM ids, LATERAL (SELECT unnest(range(0, 3 + id % 3)) AS f) ff
            WHERE f % 2 = 0),
          px AS (SELECT id, f, r, c,
              CASE WHEN r = (id + f) % 8 AND c = (id // 8 + f) % 8
                   THEN LEAST(250, GREATEST(0,
                     xor(xor((id % 251) * 73856093, r * 19349663),
                         c * 83492791) % 251 + (id // 64 + f) % 5 - 2))
                   ELSE xor(xor((id % 251) * 73856093, r * 19349663),
                         c * 83492791) % 251 END AS p
            FROM fr
            CROSS JOIN (SELECT unnest(range(0, 8)) AS r) rr
            CROSS JOIN (SELECT unnest(range(0, 8)) AS c) cc),
          coef AS (SELECT px.id, px.f, tu.u, tv.u AS v,
              SUM(px.p * tu.t * tv.t) AS cval
            FROM px JOIN ptbl tu ON tu.x = px.r
                    JOIN ptbl tv ON tv.x = px.c
            GROUP BY 1, 2, 3, 4),
          ac AS (SELECT id, f, u * 8 + v - 1 AS b, cval
            FROM coef WHERE NOT (u = 0 AND v = 0)),
          med AS (SELECT id, f, cval AS m FROM (
              SELECT id, f, cval, row_number() OVER
                (PARTITION BY id, f ORDER BY cval) AS rn FROM ac)
            WHERE rn = 32),
          vsig AS (SELECT ac.id, ac.f,
              CAST(SUM(CASE WHEN ac.cval > med.m
                THEN CAST(CAST(1 AS BIGINT) << CAST(ac.b AS INT) AS HUGEINT)
                ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS phash
            FROM ac JOIN med ON ac.id = med.id AND ac.f = med.f
            GROUP BY 1, 2),
          fm AS (SELECT a.id AS ida, b.id AS idb, a.f
            FROM vsig a JOIN vsig b ON a.f = b.f AND a.id < b.id
            WHERE bit_count(xor(a.phash, b.phash)) <= 6
              AND ((a.phash >> 0)  & 65535 = (b.phash >> 0)  & 65535
                OR (a.phash >> 16) & 65535 = (b.phash >> 16) & 65535
                OR (a.phash >> 32) & 65535 = (b.phash >> 32) & 65535
                OR (a.phash >> 48) & 65535 = (b.phash >> 48) & 65535))
          SELECT ida, idb, CAST(COUNT(*) AS BIGINT) AS n_matched
          FROM fm GROUP BY 1, 2 HAVING COUNT(*) >= 2
          ORDER BY ida, idb"""
    })

  val queries: Map[String, Q] = Map("q_mm_video_phash" -> mmVideoPhash)
}
