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
}
