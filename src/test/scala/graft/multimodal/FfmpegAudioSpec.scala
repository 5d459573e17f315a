package graft.multimodal

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The compressed-audio decoder seam must behave in BOTH environments: with
  * an ffmpeg binary on PATH it decodes a real container to the WavDecoder
  * statistic family; without one (this repo's container ships no codecs)
  * every blob degrades to "unknown" and nothing fails. The test branches on
  * the runtime probe so it is green either way. */
class FfmpegAudioSpec extends SparkSpecBase {
  import spark.implicits._

  private val samples = Array.tabulate[Short](480)(i =>
    (math.sin(i / 8.0) * 9000).toShort)
  private lazy val wav = MultimodalOps.pcm16Wav(samples, 16000)

  test("ffmpeg decoder: decodes when present, degrades to unknown when absent") {
    val df = Seq((1L, Option(wav)), (2L, Option("junk".getBytes("UTF-8"))),
      (3L, Option.empty[Array[Byte]])).toDF("media_id", "blob")
    val rows = MultimodalOps.decodeFeatures(df, "media_id", "blob",
        MultimodalOps.FfmpegAudioDecoder)
      .orderBy("media_id").collect()
    info(s"ffmpeg available: ${MultimodalOps.FfmpegAudioDecoder.available}")
    if (MultimodalOps.FfmpegAudioDecoder.available) {
      // real decode: WAV in at the target rate → sample count and the
      // exact-integer stats must match the pure-JVM WavDecoder's
      val ff = rows(0)
      assert(ff.getString(2) === "ffmpeg/pcm16")
      assert(ff.getInt(3) === 16000 && ff.getInt(4) === 1)
      val feats = ff.getAs[scala.collection.Seq[Float]](5)
      val ref = MultimodalOps.decodeFeatures(
          df.filter($"media_id" === 1L), "media_id", "blob",
          MultimodalOps.WavDecoder).head()
        .getAs[scala.collection.Seq[Float]](5)
      assert(feats(0) === ref(0), "sample count must survive the codec")
      assert(math.abs(feats(3) - ref(3)) <= 1.0f,
        "RMS must survive a lossless PCM round-trip (±1 LSB resample slack)")
      // garbage is classified, not fatal
      assert(rows(1).getString(2) === "unknown")
    } else {
      // no codec in this environment: every blob is a classified unknown,
      // the partition never fails, and byte counts are still reported
      assert(rows.forall(_.getString(2) === "unknown"))
      assert(rows(0).getLong(1) === wav.length.toLong)
    }
    // null blob is 0-byte unknown in every environment
    assert(rows(2).getLong(1) === 0L && rows(2).getString(2) === "unknown")
  }
}
