package graft.multimodal

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The real javax.imageio decode path: a planted PNG's true dimensions,
  * format, and exact channel moments must come back through the
  * per-partition pipeline; garbage blobs must degrade, not fail. */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  // 3×2 ARGB image with known pixel values, PNG-encoded in memory
  private val pixels: Seq[Int] = Seq(
    0xff102030, 0xff405060, 0xff708090,
    0xffa0b0c0, 0x80d0e0f0, 0xff000000)

  private lazy val pngBytes: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, pixels(y * 3 + x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoDecoder decodes a planted PNG's dims, format, and moments") {
    val df = Seq((1L, pngBytes), (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "blob")
    val rows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
        MultimodalOps.ImageIoDecoder)
      .orderBy("media_id").collect()

    val png = rows(0)
    assert(png.getString(2) === "png")
    assert(png.getInt(3) === 3 && png.getInt(4) === 2)
    assert(png.getLong(1) === pngBytes.length.toLong)
    // expected moments from the raw pixel values (PNG is lossless)
    val (as, rs, gs, bs) = (
      pixels.map(p => (p >>> 24) & 0xff), pixels.map(p => (p >>> 16) & 0xff),
      pixels.map(p => (p >>> 8) & 0xff), pixels.map(p => p & 0xff))
    val feats = png.getAs[scala.collection.Seq[Float]](5)
    assert(feats(0) === (as.map(_.toLong).sum.toDouble / 6).toFloat)
    assert(feats(1) === (rs.map(_.toLong).sum.toDouble / 6).toFloat)
    assert(feats(2) === (gs.map(_.toLong).sum.toDouble / 6).toFloat)
    assert(feats(3) === (bs.map(_.toLong).sum.toDouble / 6).toFloat)
    assert(feats(6) === 3f && feats(7) === 2f)

    val junk = rows(1)
    assert(junk.getString(2) === "unknown")
    assert(junk.getInt(3) === -1 && junk.getInt(4) === -1)
  }

  test("WavDecoder parses planted PCM WAV bytes back to exact statistics") {
    // alternating ±1000 square wave: mean 0, rms 1000, a zero crossing at
    // every step — every statistic is known in closed form
    val samples = Array.tabulate(400)(j => (if (j % 2 == 0) 1000 else -1000).toShort)
    val wav = MultimodalOps.pcm16Wav(samples, 16000)
    val df = Seq(
      (1L, wav),
      (2L, "RIFFgarbage that is not a wave file at all....".getBytes("UTF-8")),
      (3L, wav.take(30))) // truncated header
      .toDF("media_id", "blob")
    val rows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
        MultimodalOps.WavDecoder)
      .orderBy("media_id").collect()

    val ok = rows(0)
    assert(ok.getString(2) === "wav")
    assert(ok.getInt(3) === 16000 && ok.getInt(4) === 1) // rate, channels
    assert(ok.getLong(1) === (44 + 800).toLong)
    val f = ok.getAs[scala.collection.Seq[Float]](5)
    assert(f(0) === 400f)                 // samples
    assert(f(1) === 25f)                  // 400 frames @ 16 kHz = 25 ms
    assert(f(2) === 0f)                   // mean of the square wave
    assert(f(3) === 1000f)                // rms
    assert(f(4) === 1000f && f(5) === 399f) // peak, zero crossings
    assert(f(6) === 16f && f(7) === 1f)   // bits, channels

    assert(rows(1).getString(2) === "unknown")
    assert(rows(2).getString(2) === "unknown")
  }

  test("video container: stride sampling + real per-frame PNG decode + pooling") {
    // 5 PNG frames; stride 2 samples frames 0, 2, 4
    val video = MultimodalOps.gfv1(Seq.fill(5)(pngBytes))
    val df = Seq((1L, video), (2L, "not a video".getBytes("UTF-8")))
      .toDF("media_id", "blob")
    val rows = MultimodalOps.decodeVideoFeatures(df, "media_id", "blob",
        stride = 2, MultimodalOps.ImageIoDecoder)
      .orderBy("media_id").collect()

    val v = rows(0)
    assert(v.getString(2) === "gfv1/png")
    assert(v.getInt(3) === 5 && v.getInt(4) === 3) // frames, sampled
    assert(v.getInt(5) === 3 && v.getInt(6) === 2) // first frame dims
    assert(v.getLong(1) === (8 + 5 * (4 + pngBytes.length)).toLong)
    // identical frames: pooled features equal one frame's features
    val single = MultimodalOps.decodeFeatures(
        Seq((1L, pngBytes)).toDF("media_id", "blob"), "media_id", "blob",
        MultimodalOps.ImageIoDecoder)
      .head().getAs[scala.collection.Seq[Float]](5)
    val pooled = v.getAs[scala.collection.Seq[Float]](7)
    assert(pooled === single)

    assert(rows(1).getString(2) === "unknown")
    assert(rows(1).getInt(3) === -1)
  }

  test("video container: truncated frame table degrades to unknown") {
    val video = MultimodalOps.gfv1(Seq(pngBytes, pngBytes))
    val truncated = video.take(video.length - 10)
    val df = Seq((1L, truncated)).toDF("media_id", "blob")
    val r = MultimodalOps.decodeVideoFeatures(df, "media_id", "blob",
      stride = 1, MultimodalOps.ImageIoDecoder).head()
    assert(r.getString(2) === "unknown")
  }

  test("resizeImages round-trips to the target dims; garbage degrades") {
    val df = Seq((1L, pngBytes), (2L, "noise".getBytes("UTF-8")))
      .toDF("media_id", "blob")
    val resized = MultimodalOps.resizeImages(df, "media_id", "blob", w = 8, h = 6)
      .orderBy("media_id").collect()
    assert(resized(0).getBoolean(2))
    assert(!resized(1).getBoolean(2) &&
      resized(1).getAs[Array[Byte]](1).isEmpty)
    val redecoded = MultimodalOps.decodeFeatures(
      MultimodalOps.resizeImages(df.filter($"media_id" === 1L),
        "media_id", "blob", 8, 6),
      "media_id", "blob", MultimodalOps.ImageIoDecoder).head()
    assert(redecoded.getString(2) === "png")
    assert(redecoded.getInt(3) === 8 && redecoded.getInt(4) === 6)
  }

  test("wav frame features: hand-computed windows, ragged tail, garbage silent") {
    // 5 samples, frame size 2 → frames [3,-4], [0,5], tail [-5]
    val wav = MultimodalOps.pcm16Wav(Array[Short](3, -4, 0, 5, -5), 8000)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3))).toDF("media_id", "blob")
    val out = MultimodalOps.wavFrameFeatures(df, "media_id", "blob",
      frameSamples = 2).orderBy("media_id", "frame_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getFloat(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 0L, 2L, math.sqrt(25.0 / 2).toFloat, 4L, 1L), // 3,-4: one crossing
      (1L, 1L, 2L, math.sqrt(25.0 / 2).toFloat, 5L, 0L), // 0,5: both non-neg
      (1L, 2L, 1L, 5f, 5L, 0L)))                          // ragged tail, no pair
    // garbage blob (media 2) contributed no rows and didn't fail the job
    assert(!out.exists(_._1 == 2L))
  }

  test("wavFrameFeatures skips multi-channel blobs (mono-only framing)") {
    // flat framing over an interleaved stereo stream would mix channels in
    // every RMS/ZC — stereo blobs must be dropped like invalid ones
    val mono = MultimodalOps.pcm16Wav(Array.tabulate(4)(_.toShort), 8000)
    val stereo = mono.clone(); stereo(22) = 2 // channel-count field
    val df = Seq((1L, mono), (2L, stereo), (3L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "blob")
    val ids = MultimodalOps.wavFrameFeatures(df, "media_id", "blob",
      frameSamples = 2).select("media_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L))
    // the coverage companion tells a policy skip apart from corruption
    val cov = MultimodalOps.wavFrameCoverage(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cov === Map(1L -> "ok", 2L -> "multichannel", 3L -> "invalid"))
  }

  test("null blobs classify as invalid/unknown across every decoder, never NPE") {
    val wav = MultimodalOps.pcm16Wav(Array[Short](3, -4, 0, 5), 8000)
    val df = Seq((1L, Option(wav)), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "blob")
    // frame ops: null blob contributes no frames / an "invalid" status row
    assert(MultimodalOps.wavFrameFeatures(df, "media_id", "blob",
      frameSamples = 2).select("media_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(1L))
    val cov = MultimodalOps.wavFrameCoverage(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cov === Map(1L -> "ok", 2L -> "invalid"))
    // clip decoders: null blob → 0-byte unknown/stub row
    val wavRows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
      MultimodalOps.WavDecoder).orderBy("media_id").collect()
    assert(wavRows(1).getLong(1) === 0L &&
      wavRows(1).getString(2) === "unknown")
    val imgRows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
      MultimodalOps.ImageIoDecoder).orderBy("media_id").collect()
    assert(imgRows(1).getString(2) === "unknown")
    val stubRows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
      MultimodalOps.StubDecoder).orderBy("media_id").collect()
    assert(stubRows(1).getLong(1) === 0L)
    // video sampler: null container → unknown row with 0 bytes
    val vid = MultimodalOps.decodeVideoFeatures(df, "media_id", "blob")
      .orderBy("media_id").collect()
    assert(vid(1).getLong(1) === 0L && vid(1).getString(2) === "unknown")
  }

  test("WavDecoder rejects non-PCM and non-16-bit variants, not the partition") {
    // hand-flip the audioFormat field (offset 20) to 3 (IEEE float)
    val wav = MultimodalOps.pcm16Wav(Array.tabulate(8)(_.toShort), 8000)
    val nonPcm = wav.clone(); nonPcm(20) = 3
    val eightBit = wav.clone(); eightBit(34) = 8 // bitsPerSample field
    val df = Seq((1L, nonPcm), (2L, eightBit)).toDF("media_id", "blob")
    val rows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
        MultimodalOps.WavDecoder)
      .orderBy("media_id").collect()
    assert(rows.forall(_.getString(2) == "unknown"))
  }

  test("dHash: same-group images within hamming 4, bad blobs flagged") {
    import spark.implicits._
    // ids 0 and 251 share id % 251 = 0 (near-identical images, different
    // perturbed pixel); id 10 is another group entirely
    val blobs = Seq(0L, 251L, 10L).map(id =>
      (id, MultimodalOps.synthGrayPng(id))) :+ ((99L, Array[Byte](1, 2, 3)))
    val df = blobs.toDF("media_id", "blob")
    val sig = MultimodalOps.dHashImages(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(sig(99L)._2 === false, "garbage blob must flag ok=false")
    assert(Seq(0L, 251L, 10L).forall(sig(_)._2))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L)._1, sig(251L)._1) <= 4, "same-group must be near")
    assert(ham(sig(0L)._1, sig(10L)._1) > 4, "different groups must differ")
    // the pair generator finds the same-group pair and not the cross pair
    val sigDf = MultimodalOps.dHashImages(
        df.filter($"media_id" =!= 99L), "media_id", "blob")
      .select($"media_id".as("id"), $"dhash".as("simhash"))
    val pairs = graft.dedup.DedupOps.bandedHammingPairs(sigDf, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 251L)))
    assert(!pairs.contains((0L, 10L)) && !pairs.contains((10L, 251L)))
  }
}
