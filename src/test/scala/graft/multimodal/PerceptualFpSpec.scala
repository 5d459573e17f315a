package graft.multimodal

import graft.SparkSpecBase

class PerceptualFpSpec extends SparkSpecBase {
  import spark.implicits._

  // -- pHash ---------------------------------------------------------------

  test("pHash8 replays the hand-checked integer-DCT constant") {
    // independently recomputed (python, same table): p(i) = 7i mod 251
    val p = Array.tabulate(64)(i => (i * 7) % 251)
    assert(PerceptualHash.pHash8(p) === 1244194789059216400L)
  }

  test("pHash has at most 31 of its 63 bits set and is non-negative") {
    for (id <- Seq(0L, 17L, 251L, 999L)) {
      val p = Array.tabulate(64)(i =>
        ((((id % 251) * 73856093L) ^ ((i / 8) * 19349663L) ^
          ((i % 8) * 83492791L)) % 251).toInt)
      val h = PerceptualHash.pHash8(p)
      assert(h >= 0L)
      assert(java.lang.Long.bitCount(h) <= 31)
    }
  }

  test("real PNG decode: same-texture ids land within 2 bits, " +
      "distinct textures at least 10 apart") {
    // 3 and 254 share g = 3; 5 is a different texture
    val df = Seq(3L, 254L, 5L)
      .map(id => (id, PerceptualHash.synthTexturePng(id)))
      .toDF("media_id", "blob")
    val h = PerceptualHash.pHashImages(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(3L), h(254L)) <= 2)
    assert(ham(h(3L), h(5L)) >= 10)
    assert(ham(h(254L), h(5L)) >= 10)
  }

  test("undecodable blobs carry ok = false, never fail the partition") {
    val df = Seq((1L, PerceptualHash.synthTexturePng(1L)),
      (2L, Array[Byte](9, 9, 9))).toDF("media_id", "blob")
    val out = PerceptualHash.pHashImages(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L))
  }

  test("banded near-dup pairs join same-texture ids, not cross-texture") {
    val ids = Seq(3L, 254L, 5L, 256L) // groups {3, 254}, {5, 256}
    val df = ids.map(id => (id, PerceptualHash.synthTexturePng(id)))
      .toDF("media_id", "blob")
    val sig = PerceptualHash.pHashImages(df, "media_id", "blob")
      .select($"media_id".as("id"), $"phash".as("simhash"))
    val pairs = graft.dedup.DedupOps.bandedHammingPairs(sig, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((3L, 254L), (5L, 256L)))
  }

  test("image decon: cross-corpus same-texture pairs flag, " +
      "cross-texture never; candidates stay banded") {
    val ids = Seq(3L, 254L, 5L, 256L)
    val df = ids.map(id => (id, PerceptualHash.synthTexturePng(id)))
      .toDF("media_id", "blob")
    val sig = PerceptualHash.pHashImages(df, "media_id", "blob")
      .select($"media_id".as("id"), $"phash")
    val pairs = PerceptualHash.crossMatchPairs(
      sig.filter($"id" % 2 === 0), sig.filter($"id" % 2 === 1),
      maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((254L, 3L), (256L, 5L)))
  }

  // -- audio fingerprint ---------------------------------------------------

  private def synthWav(id: Long): Array[Byte] = {
    val n = (160 + (id % 5) * 16).toInt
    MultimodalOps.pcm16Wav(Array.tabulate(n)(j =>
      (((id * 31 + j * 17) % 2001) - 1000).toShort), 8000)
  }

  test("fingerprint replays the hand-checked closed-form constants") {
    // id 1: 176 samples -> frames 80/80/16 -> fp rows (1, 13), (2, 2)
    // (independently recomputed in python from the same tables)
    val df = Seq((1L, synthWav(1L))).toDF("media_id", "blob")
    val out = AudioFingerprint.audioFingerprint(df, "media_id", "blob")
      .orderBy("frame_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 13L), (2L, 2L)))
  }

  test("volume scaling leaves the fingerprint unchanged") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(160)((rnd.nextInt(201) - 100).toShort)
    val loud = base.map(s => (s * 2).toShort)
    val df = Seq(
      (1L, MultimodalOps.pcm16Wav(base, 8000)),
      (2L, MultimodalOps.pcm16Wav(loud, 8000))).toDF("media_id", "blob")
    val out = AudioFingerprint.audioFingerprint(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === out(2L))
  }

  test("video pHash: same-texture clips pair on >=2 frame positions, " +
      "cross-texture clips never pair") {
    // 3 and 254 share texture g = 3 (different lengths: 3 vs 5 frames);
    // 5 is distinct content
    val df = Seq(3L, 254L, 5L)
      .map(id => (id, VideoPHash.synthTextureClip(id)))
      .toDF("media_id", "blob")
    val frames = VideoPHash.videoPHash(df, "media_id", "blob", stride = 2)
    // stride-2 sampling: 3-frame clip -> {0, 2}; 5-frame -> {0, 2, 4}
    val byClip = frames.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(byClip(3L) === Seq(0L, 2L))
    assert(byClip(254L) === Seq(0L, 2L, 4L))
    val pairs = VideoPHash.videoNearDupPairs(frames, maxHamming = 6,
      minFrames = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((3L, 254L, 2L)))
  }

  test("video pHash: malformed containers contribute no rows") {
    val df = Seq((1L, VideoPHash.synthTextureClip(1L)),
      (2L, Array[Byte](71, 70, 86, 9))).toDF("media_id", "blob")
    val ids = VideoPHash.videoPHash(df, "media_id", "blob")
      .select("media_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("clip fingerprint: volume-scaled clips pack to the identical " +
      "key and dedup to one canonical id") {
    // ids 0, 97, 194 share signal g = 0 at volumes 1, 2, 3; id 1 is
    // different content (hand-checked keys: g0 = 56006, g1 = 185030)
    def wav(id: Long): Array[Byte] = {
      val g = id % 97
      val v = 1 + (id / 97) % 3
      val n = (400 + (g % 5) * 80).toInt
      MultimodalOps.pcm16Wav(Array.tabulate(n)(j =>
        (v * (((g * 53 + j * 29) % 1601) - 800)).toShort), 8000)
    }
    val df = Seq(0L, 97L, 194L, 1L).map(id => (id, wav(id)))
      .toDF("media_id", "blob")
    val keyed = AudioFingerprint.clipFingerprint(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed(0L) === 56006L)
    assert(keyed(97L) === 56006L)
    assert(keyed(194L) === 56006L)
    assert(keyed(1L) === 185030L)
  }

  test("silence spans: hand-built lead/tail silence trims, all-silent " +
      "clips trim entirely, fully-voiced clips trim nothing") {
    import org.apache.spark.sql.functions.col
    def wav(s: Array[Short]) = MultimodalOps.pcm16Wav(s, 8000)
    val lead = Array.fill(80)(0.toShort) ++ Array.fill(80)(5.toShort) ++
      Array.fill(80)(0.toShort) // silent-voiced-silent
    val allSilent = Array.fill(160)(0.toShort)
    val voiced = Array.fill(160)(9.toShort)
    val df = Seq((1L, wav(lead)), (2L, wav(allSilent)), (3L, wav(voiced)))
      .toDF("media_id", "blob")
    val m = AudioFingerprint.silenceSpans(df, "media_id", "blob")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    assert(m(1L) === ((3L, 1L, 2L))) // 3 frames, 1 voiced, 2 trimmed
    assert(m(2L) === ((2L, 0L, 2L))) // all silent: everything trims
    assert(m(3L) === ((2L, 2L, 0L)))
    val r1 = AudioFingerprint.silenceSpans(df, "media_id", "blob")
      .filter(col("media_id") === 1L).head()
    assert(r1.getLong(2) === 1L && r1.getLong(3) === 1L) // span [1, 1]
  }

  test("first frame seeds only; garbage and stereo blobs emit nothing") {
    val mono = MultimodalOps.pcm16Wav(Array.tabulate(100)(_.toShort), 8000)
    val stereo = mono.clone(); stereo(22) = 2
    val df = Seq((1L, mono), (2L, stereo), (3L, Array[Byte](1, 2)))
      .toDF("media_id", "blob")
    val out = AudioFingerprint.audioFingerprint(df, "media_id", "blob")
      .collect()
    // 100 samples -> frames 80 + ragged 20 -> exactly ONE row, frame 1
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L && out(0).getLong(1) === 1L)
  }
}
