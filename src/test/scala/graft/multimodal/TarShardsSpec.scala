package graft.multimodal

import graft.SparkSpecBase

class TarShardsSpec extends SparkSpecBase {

  test("tar round trip: names, sizes, bytes, including the " +
      "block-aligned-size edge") {
    val entries = Seq(
      "1.png" -> Array.tabulate(100)(_.toByte),
      "2.png" -> Array.tabulate(512)(i => (i * 3).toByte), // exact block
      "3.png" -> Array.emptyByteArray)
    val rt = TarShards.tarEntries(TarShards.tarBytes(entries))
    assert(rt.map(_._1) === entries.map(_._1))
    rt.zip(entries).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("ustar header fields parse: checksum block is well-formed") {
    val t = TarShards.tarBytes(Seq("7.png" -> Array[Byte](1, 2, 3)))
    // magic at 257
    assert(new String(t, 257, 5, "US-ASCII") === "ustar")
    // stored checksum equals a recomputation with the chksum field spaced
    val stored = Integer.parseInt(
      new String(t, 148, 6, "US-ASCII"), 8)
    val h = java.util.Arrays.copyOfRange(t, 0, 512)
    (148 until 156).foreach(h(_) = ' ')
    assert(stored === h.map(_ & 0xff).sum)
  }

  test("truncated trailer yields the clean prefix, not a crash") {
    val t = TarShards.tarBytes(Seq(
      "1.png" -> Array[Byte](1), "2.png" -> Array[Byte](2)))
    val cut = java.util.Arrays.copyOfRange(t, 0, 512 + 100) // mid-entry 2
    val got = TarShards.tarEntries(cut)
    assert(got.map(_._1) === Seq("1.png"))
  }

  test("shard scan: members explode with parsed ids, foreign names skip") {
    val dir = java.nio.file.Files.createTempDirectory("tars").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00000.tar"),
      TarShards.tarBytes(Seq(
        "3.png" -> PerceptualHash.synthTexturePng(3L),
        "meta.json" -> "{}".getBytes,
        "17.png" -> PerceptualHash.synthTexturePng(17L))))
    val rows = TarShards.readTarShards(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(rows.toSeq === Seq(("shard-00000.tar", 3L),
      ("shard-00000.tar", 17L)).sorted)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
