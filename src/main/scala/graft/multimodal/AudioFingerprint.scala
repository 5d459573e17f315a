package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sub-band energy audio fingerprint over the real WAV decode — the
  * Haitsma–Kalker construction ("A Highly Robust Audio Fingerprinting
  * System", ISMIR 2002), the published scheme behind broadcast-scale
  * audio dedup: per frame a small bank of band energies, per
  * (frame, band) ONE bit — the sign of the energy's time-and-frequency
  * second difference — so the fingerprint is invariant to volume
  * scaling and slowly-varying spectral tilt, exactly the distortions a
  * re-encode introduces. This is the MFCC-lite leg of the multimodal
  * family: the full MFCC chain (FFT → mel filterbank → log → DCT) only
  * adds perceptual warping on top of the same band-energy core.
  *
  * Exactness (NUMERIC_CONVENTION rule 1): band energies are computed
  * by fixed-point Goertzel-style correlation — E(f,m) = cs² + ss²
  * with cs = Σ s_j·CT(m)(j), ss = Σ s_j·ST(m)(j) over the frame's
  * samples, where CT/ST are integer tables round(128·cos/sin(2π(m+1)
  * j/80)) computed ONCE here and interpolated verbatim into the
  * oracle SQL (no engine trig in the data path). With 16-bit PCM,
  * |cs| ≤ 80·32768·128 ≈ 3.4e8, E ≤ 2.3e17 — pure 64-bit integers.
  * The fingerprint bit is a strict integer comparison, so stream and
  * oracle replay bit-for-bit.
  *
  * Scale shape: mapPartitions decode+fingerprint, one output row per
  * (clip, frame) — linear in audio duration, NO shuffle; matching
  * fingerprints downstream is an exact-key groupBy (the fp value IS
  * the dedup key), the same shape as exact text dedup. */
object AudioFingerprint {

  /** Bands: m = 0..4 → m+1 cycles per 80-sample frame. */
  private[multimodal] val nBands = 5
  private[multimodal] val frameLen = 80

  /** Fixed-point correlation tables, CT(m)(j) = round(128·cos(2π(m+1)
    * j/80)), ST likewise with sin. Computed once on the driver; the
    * oracle SQL interpolates the SAME values, so JVM-vs-libm trig can
    * never diverge the two engines. */
  private[multimodal] val (cosT, sinT): (Array[Array[Long]], Array[Array[Long]]) = {
    val ct = Array.tabulate(nBands, frameLen)((m, j) =>
      math.round(128.0 * math.cos(2.0 * math.Pi * (m + 1) * j / frameLen)))
    val st = Array.tabulate(nBands, frameLen)((m, j) =>
      math.round(128.0 * math.sin(2.0 * math.Pi * (m + 1) * j / frameLen)))
    (ct, st)
  }

  /** Band energies of one frame (samples s(from until until)). */
  private[multimodal] def bandEnergies(bytes: Array[Byte], dataOff: Int,
      from: Int, until: Int): Array[Long] = {
    val e = new Array[Long](nBands)
    var m = 0
    while (m < nBands) {
      var cs = 0L
      var ss = 0L
      var j = from
      while (j < until) {
        val s = MultimodalOps.WavDecoder.sampleAt(bytes, dataOff, j).toLong
        cs += s * cosT(m)(j - from)
        ss += s * sinT(m)(j - from)
        j += 1
      }
      e(m) = cs * cs + ss * ss
      m += 1
    }
    e
  }

  /** Per-frame fingerprints of mono 16-bit PCM WAV blobs:
    * non-overlapping 80-sample frames (ragged tail kept, same framing
    * as [[MultimodalOps.wavFrameFeatures]]), 5 band energies per
    * frame, and for every frame n ≥ 1 a 4-bit fingerprint — bit m set
    * iff (E(n,m)−E(n,m+1)) − (E(n−1,m)−E(n−1,m+1)) > 0. Output:
    * (media_id, frame_id ≥ 1, fp ∈ [0,16)). The first frame seeds the
    * difference and emits no row; invalid / multichannel blobs
    * contribute no rows (the [[wavFrameFeatures]] decoder contract). */
  def audioFingerprint(df: DataFrame, idCol: String, blobCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_id", LongType),
      StructField("fp", LongType)))
    val rows = df.select(col(idCol).cast("long"), col(blobCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        MultimodalOps.WavDecoder.pcmInfo(bytes).iterator
          .filter { case (_, channels, _, _) => channels == 1 }
          .flatMap { case (_, _, dataOff, n) =>
            val nFrames = (n + frameLen - 1) / frameLen
            var prev: Array[Long] = null
            (0 until nFrames).iterator.flatMap { f =>
              val from = f * frameLen
              val until = math.min(from + frameLen, n)
              val e = bandEnergies(bytes, dataOff, from, until)
              val out = if (prev == null) None
                else {
                  var fp = 0L
                  var m = 0
                  while (m < nBands - 1) {
                    if ((e(m) - e(m + 1)) - (prev(m) - prev(m + 1)) > 0L)
                      fp |= 1L << m
                    m += 1
                  }
                  Some(Row(id, f.toLong, fp))
                }
              prev = e
              out
            }
          }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Clip-level fingerprint key: the first 15 frame fingerprints (the
    * clip HEAD — the standard prefix-fingerprint lookup key) packed
    * 4 bits each into one long, clip_fp = Σ fp(n) << 4(n−1). Identical
    * audio at ANY volume packs to the identical key (per-frame bits
    * are scale-invariant), so clip dedup becomes an exact-key groupBy
    * — the text-exact-dedup shape, no pairwise work at all. Distinct
    * content can collide on the coarse 4-bit-per-frame key (measured:
    * 97 synthetic groups → 84 distinct keys); a collision only merges
    * dedup groups, the documented trade of prefix fingerprints —
    * lengthen the prefix or add bands to sharpen. */
  def clipFingerprint(df: DataFrame, idCol: String, blobCol: String)
      : DataFrame = {
    audioFingerprint(df, idCol, blobCol)
      .filter(col("frame_id") <= 15)
      .groupBy(col("media_id"))
      .agg(sum(expr("shiftleft(fp, cast((frame_id - 1) * 4 as int))"))
        .as("clip_fp"))
  }

  /** q_mm_audio_neardup: exact-key audio clip dedup through the
    * fingerprint — deterministic clips in 97 groups (group g =
    * id mod 97 fixes the SIGNAL, sample j = ((g·53 + j·29) mod 1601)
    * − 800 over 400 + (g mod 5)·80 samples; the clip's VOLUME varies
    * per id, ×(1 + (id div 97) mod 3)), decoded and fingerprinted for
    * real, then grouped by clip_fp: same-signal clips collapse to one
    * group whatever their volume (spec-pinned invariance), min id
    * canonicalizes. The oracle replays samples, energies, bits, pack,
    * and group stats from the closed form. */
  private val mmAudioNearDup = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"))
      val rdd = MultimodalOps.spreadIds(docs).rdd.map { r =>
        val id = r.getLong(0)
        val g = id % 97
        val v = 1 + (id / 97) % 3
        val n = (400 + (g % 5) * 80).toInt
        val samples = Array.tabulate(n)(j =>
          (v * (((g * 53 + j * 29) % 1601) - 800)).toShort)
        Row(id, MultimodalOps.pcm16Wav(samples, 8000))
      }
      val withBlob = s.createDataFrame(rdd, StructType(Seq(
        StructField("doc_id", LongType), StructField("blob", BinaryType))))
      val keyed = clipFingerprint(withBlob, "doc_id", "blob")
      val sizes = keyed.groupBy("clip_fp")
        .agg(count(lit(1)).as("group_size"),
          min("media_id").as("__canon"))
      keyed.join(sizes, Seq("clip_fp"))
        .select(col("media_id"), col("clip_fp"), col("group_size"),
          (col("media_id") === col("__canon")).cast("int")
            .as("is_canonical"))
        .orderBy("media_id")
    },
    Some {
      val tblRows = (for (m <- 0 until nBands; j <- 0 until frameLen)
        yield s"($m, $j, ${cosT(m)(j)}, ${sinT(m)(j)})").mkString(", ")
      s"""WITH atbl(m, j, ct, st) AS (VALUES $tblRows),
          b AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
                 doc_id % 97 AS g,
                 1 + (doc_id // 97) % 3 AS v,
                 400 + (doc_id % 97 % 5) * 80 AS n FROM documents),
          f AS (SELECT media_id, g, v, n, CAST(fr AS BIGINT) AS frame_id,
                 CAST(fr * 80 AS INT) AS lo,
                 CAST(LEAST((fr + 1) * 80, n) AS INT) AS hi
                FROM b, LATERAL (SELECT unnest(range(0,
                  CAST(ceil(n / 80.0) AS BIGINT))) AS fr) ff),
          corr AS (SELECT f.media_id, f.frame_id, atbl.m,
                 SUM(f.v * (((f.g * 53 + (f.lo + atbl.j) * 29) % 1601)
                   - 800) * atbl.ct) AS cs,
                 SUM(f.v * (((f.g * 53 + (f.lo + atbl.j) * 29) % 1601)
                   - 800) * atbl.st) AS ss
               FROM f JOIN atbl ON atbl.j < f.hi - f.lo
               GROUP BY 1, 2, 3),
          en AS (SELECT media_id, frame_id, m,
                 cs * cs + ss * ss AS e FROM corr),
          d AS (SELECT a.media_id, a.frame_id, a.m, (a.e - b2.e) AS de
               FROM en a JOIN en b2
                 ON a.media_id = b2.media_id AND a.frame_id = b2.frame_id
                AND b2.m = a.m + 1
               WHERE a.m < 4),
          fps AS (SELECT cur.media_id, cur.frame_id,
                 SUM(CASE WHEN cur.de - prv.de > 0
                   THEN CAST(1 AS BIGINT) << CAST(cur.m AS INT)
                   ELSE 0 END) AS fp
               FROM d cur JOIN d prv
                 ON cur.media_id = prv.media_id AND cur.m = prv.m
                AND prv.frame_id = cur.frame_id - 1
               GROUP BY 1, 2),
          keyed AS (SELECT media_id,
                 CAST(SUM(fp << CAST(4 * (frame_id - 1) AS INT))
                   AS BIGINT) AS clip_fp
               FROM fps WHERE frame_id <= 15 GROUP BY 1),
          sz AS (SELECT clip_fp, CAST(COUNT(*) AS BIGINT) AS group_size,
                 MIN(media_id) AS canon
               FROM keyed GROUP BY 1)
          SELECT k.media_id, k.clip_fp, sz.group_size,
                 CAST(k.media_id = sz.canon AS INT) AS is_canonical
          FROM keyed k JOIN sz ON k.clip_fp = sz.clip_fp
          ORDER BY k.media_id"""
    })

  /** Silence-trim spans — VAD-lite over the real frame decode: a
    * frame is voiced iff its exact integer PEAK clears
    * `peakThreshold` (peak, not the float RMS, so the gate is pure
    * integers), and the clip report gives the voiced span a trimmer
    * keeps — leading/trailing silence removal being the first step
    * of every speech-training prep. Output per clip: (media_id,
    * n_frames, first_voiced, last_voiced, n_voiced,
    * trimmed_frames) — first/last null for all-silent clips, which
    * trim entirely. One mapPartitions decode + one clip-keyed agg. */
  def silenceSpans(df: DataFrame, idCol: String, blobCol: String,
      frameSamples: Int = 80, peakThreshold: Long = 1L): DataFrame = {
    val frames = MultimodalOps.wavFrameFeatures(df, idCol, blobCol,
      frameSamples)
    frames
      .withColumn("voiced", col("peak") >= peakThreshold)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        min(when(col("voiced"), col("frame_id"))).as("first_voiced"),
        max(when(col("voiced"), col("frame_id"))).as("last_voiced"),
        sum(when(col("voiced"), 1L).otherwise(0L)).as("n_voiced"))
      .withColumn("trimmed_frames",
        when(col("n_voiced") === 0, col("n_frames"))
          .otherwise(col("n_frames") -
            (col("last_voiced") - col("first_voiced") + 1)))
  }

  /** q_mm_silence_spans: clips where id mod 3 = 0 carry one silent
    * 80-sample frame at each end (samples forced 0), the rest are the
    * q_mm_wav closed form; the oracle replays per-frame peaks and the
    * span report exactly. */
  private val mmSilence = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"))
      val rdd = MultimodalOps.spreadIds(docs).rdd.map { r =>
        val id = r.getLong(0)
        val n = (240 + (id % 5) * 16).toInt
        val samples = Array.tabulate(n) { j =>
          if (id % 3 == 0 && (j < 80 || j >= n - 80)) 0.toShort
          else (((id * 31 + j * 17) % 2001) - 1000).toShort
        }
        Row(id, MultimodalOps.pcm16Wav(samples, 8000))
      }
      val withBlob = s.createDataFrame(rdd, StructType(Seq(
        StructField("doc_id", LongType), StructField("blob", BinaryType))))
      silenceSpans(withBlob, "doc_id", "blob").orderBy("media_id")
    },
    Some("""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
                 240 + (doc_id % 5) * 16 AS n FROM documents),
            f AS (SELECT media_id, n, CAST(fr AS BIGINT) AS frame_id,
                 CAST(fr * 80 AS INT) AS lo,
                 CAST(LEAST((fr + 1) * 80, n) AS INT) AS hi
                FROM b, LATERAL (SELECT unnest(range(0,
                  CAST(ceil(n / 80.0) AS BIGINT))) AS fr) ff),
            pk AS (SELECT media_id, frame_id,
                 list_max(list_transform(range(lo, hi), j ->
                   CASE WHEN media_id % 3 = 0
                        AND (j < 80 OR j >= n - 80) THEN 0
                   ELSE abs(((media_id * 31 + j * 17) % 2001) - 1000)
                   END)) AS peak
              FROM f),
            v AS (SELECT media_id, frame_id, peak >= 1 AS voiced FROM pk)
            SELECT media_id,
              CAST(COUNT(*) AS BIGINT) AS n_frames,
              CAST(MIN(CASE WHEN voiced THEN frame_id END) AS BIGINT)
                AS first_voiced,
              CAST(MAX(CASE WHEN voiced THEN frame_id END) AS BIGINT)
                AS last_voiced,
              CAST(SUM(CASE WHEN voiced THEN 1 ELSE 0 END) AS BIGINT)
                AS n_voiced,
              CAST(CASE WHEN SUM(CASE WHEN voiced THEN 1 ELSE 0 END) = 0
                THEN COUNT(*)
                ELSE COUNT(*) - (MAX(CASE WHEN voiced THEN frame_id END)
                  - MIN(CASE WHEN voiced THEN frame_id END) + 1) END
                AS BIGINT) AS trimmed_frames
            FROM v GROUP BY 1
            ORDER BY media_id"""))

  /** q_mm_audio_fp: the fingerprint chain over the SAME deterministic
    * closed-form PCM blobs as q_mm_wav (sample j = ((id·31 + j·17) mod
    * 2001) − 1000), fully hash-checked: the oracle re-synthesizes the
    * samples, re-derives the band energies from the INTERPOLATED
    * integer trig tables, and re-packs the sign bits — a framing,
    * table-indexing, or difference-order bug breaks the hash match. */
  private val mmAudioFp = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"))
      val rdd = MultimodalOps.spreadIds(docs).rdd.map { r =>
        val id = r.getLong(0)
        val n = (160 + (id % 5) * 16).toInt
        val samples = Array.tabulate(n)(j =>
          (((id * 31 + j * 17) % 2001) - 1000).toShort)
        Row(id, MultimodalOps.pcm16Wav(samples, 8000))
      }
      val withBlob = s.createDataFrame(rdd, StructType(Seq(
        StructField("doc_id", LongType), StructField("blob", BinaryType))))
      audioFingerprint(withBlob, "doc_id", "blob")
        .orderBy("media_id", "frame_id")
    },
    Some {
      val tblRows = (for (m <- 0 until nBands; j <- 0 until frameLen)
        yield s"($m, $j, ${cosT(m)(j)}, ${sinT(m)(j)})").mkString(", ")
      s"""WITH atbl(m, j, ct, st) AS (VALUES $tblRows),
          b AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
                 160 + (doc_id % 5) * 16 AS n FROM documents),
          f AS (SELECT media_id, n, CAST(fr AS BIGINT) AS frame_id,
                 CAST(fr * 80 AS INT) AS lo,
                 CAST(LEAST((fr + 1) * 80, n) AS INT) AS hi
                FROM b, LATERAL (SELECT unnest(range(0,
                  CAST(ceil(n / 80.0) AS BIGINT))) AS fr) ff),
          corr AS (SELECT f.media_id, f.frame_id, atbl.m,
                 SUM((((f.media_id * 31 + (f.lo + atbl.j) * 17) % 2001)
                   - 1000) * atbl.ct) AS cs,
                 SUM((((f.media_id * 31 + (f.lo + atbl.j) * 17) % 2001)
                   - 1000) * atbl.st) AS ss
               FROM f JOIN atbl ON atbl.j < f.hi - f.lo
               GROUP BY 1, 2, 3),
          en AS (SELECT media_id, frame_id, m,
                 cs * cs + ss * ss AS e FROM corr),
          d AS (SELECT a.media_id, a.frame_id, a.m,
                 (a.e - b2.e) AS de
               FROM en a JOIN en b2
                 ON a.media_id = b2.media_id AND a.frame_id = b2.frame_id
                AND b2.m = a.m + 1
               WHERE a.m < 4),
          bits AS (SELECT cur.media_id, cur.frame_id, cur.m,
                 CASE WHEN cur.de - prv.de > 0
                   THEN CAST(1 AS BIGINT) << CAST(cur.m AS INT)
                   ELSE 0 END AS bit
               FROM d cur JOIN d prv
                 ON cur.media_id = prv.media_id AND cur.m = prv.m
                AND prv.frame_id = cur.frame_id - 1)
          SELECT media_id, frame_id,
                 CAST(SUM(bit) AS BIGINT) AS fp
          FROM bits GROUP BY 1, 2
          ORDER BY media_id, frame_id"""
    })

  /** q_mm_audio_decon: audio benchmark decontamination — the audio
    * leg of the decon trilogy (text: q_d_decontaminate, image:
    * q_mm_image_decon): even ids are the train corpus, odd ids the
    * benchmark, same signal groups at different VOLUMES across the
    * parity split; a benchmark clip is contaminated iff some train
    * clip packs the identical (volume-invariant) fingerprint key —
    * ONE exact-key join, no pairwise stage. Output per benchmark
    * clip: (bench_id, clip_fp, n_train_matches, contaminated). */
  private val mmAudioDecon = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"))
      val rdd = MultimodalOps.spreadIds(docs).rdd.map { r =>
        val id = r.getLong(0)
        val g = id % 97
        val v = 1 + (id / 97) % 3
        val n = (400 + (g % 5) * 80).toInt
        val samples = Array.tabulate(n)(j =>
          (v * (((g * 53 + j * 29) % 1601) - 800)).toShort)
        Row(id, MultimodalOps.pcm16Wav(samples, 8000))
      }
      val withBlob = s.createDataFrame(rdd, StructType(Seq(
        StructField("doc_id", LongType), StructField("blob", BinaryType))))
      val keyed = clipFingerprint(withBlob, "doc_id", "blob")
      val train = keyed.filter(pmod(col("media_id"), lit(2)) === 0)
        .groupBy("clip_fp")
        .agg(count(lit(1)).as("n_train_matches"))
      keyed.filter(pmod(col("media_id"), lit(2)) === 1)
        .withColumnRenamed("media_id", "bench_id")
        .join(train, Seq("clip_fp"), "left")
        .select(col("bench_id"), col("clip_fp"),
          coalesce(col("n_train_matches"), lit(0L))
            .as("n_train_matches"),
          (coalesce(col("n_train_matches"), lit(0L)) > 0)
            .as("contaminated"))
        .orderBy("bench_id")
    },
    Some {
      val tblRows = (for (m <- 0 until nBands; j <- 0 until frameLen)
        yield s"($m, $j, ${cosT(m)(j)}, ${sinT(m)(j)})").mkString(", ")
      s"""WITH atbl(m, j, ct, st) AS (VALUES $tblRows),
          b AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
                 doc_id % 97 AS g,
                 1 + (doc_id // 97) % 3 AS v,
                 400 + (doc_id % 97 % 5) * 80 AS n FROM documents),
          f AS (SELECT media_id, g, v, n, CAST(fr AS BIGINT) AS frame_id,
                 CAST(fr * 80 AS INT) AS lo,
                 CAST(LEAST((fr + 1) * 80, n) AS INT) AS hi
                FROM b, LATERAL (SELECT unnest(range(0,
                  CAST(ceil(n / 80.0) AS BIGINT))) AS fr) ff),
          corr AS (SELECT f.media_id, f.frame_id, atbl.m,
                 SUM(f.v * (((f.g * 53 + (f.lo + atbl.j) * 29) % 1601)
                   - 800) * atbl.ct) AS cs,
                 SUM(f.v * (((f.g * 53 + (f.lo + atbl.j) * 29) % 1601)
                   - 800) * atbl.st) AS ss
               FROM f JOIN atbl ON atbl.j < f.hi - f.lo
               GROUP BY 1, 2, 3),
          en AS (SELECT media_id, frame_id, m,
                 cs * cs + ss * ss AS e FROM corr),
          d AS (SELECT a.media_id, a.frame_id, a.m, (a.e - b2.e) AS de
               FROM en a JOIN en b2
                 ON a.media_id = b2.media_id AND a.frame_id = b2.frame_id
                AND b2.m = a.m + 1
               WHERE a.m < 4),
          fps AS (SELECT cur.media_id, cur.frame_id,
                 SUM(CASE WHEN cur.de - prv.de > 0
                   THEN CAST(1 AS BIGINT) << CAST(cur.m AS INT)
                   ELSE 0 END) AS fp
               FROM d cur JOIN d prv
                 ON cur.media_id = prv.media_id AND cur.m = prv.m
                AND prv.frame_id = cur.frame_id - 1
               GROUP BY 1, 2),
          keyed AS (SELECT media_id,
                 CAST(SUM(fp << CAST(4 * (frame_id - 1) AS INT))
                   AS BIGINT) AS clip_fp
               FROM fps WHERE frame_id <= 15 GROUP BY 1),
          train AS (SELECT clip_fp,
                 CAST(COUNT(*) AS BIGINT) AS n_train_matches
               FROM keyed WHERE media_id % 2 = 0 GROUP BY 1)
          SELECT k.media_id AS bench_id, k.clip_fp,
                 COALESCE(t.n_train_matches, 0) AS n_train_matches,
                 COALESCE(t.n_train_matches, 0) > 0 AS contaminated
          FROM keyed k LEFT JOIN train t ON k.clip_fp = t.clip_fp
          WHERE k.media_id % 2 = 1
          ORDER BY bench_id"""
    })

  val queries: Map[String, Q] = Map(
    "q_mm_audio_fp" -> mmAudioFp,
    "q_mm_audio_neardup" -> mmAudioNearDup,
    "q_mm_silence_spans" -> mmSilence,
    "q_mm_audio_decon" -> mmAudioDecon)
}
