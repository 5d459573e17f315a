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

  test("streaming shard ingest: arriving tars drain incrementally, " +
      "already-seen shards never reprocess across invocations") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("tarstream").toString
    val cp = java.nio.file.Files.createTempDirectory("tarcp").toString
    def writeShard(n: Int, ids: Seq[Long]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"shard-$n%05d.tar"),
        TarShards.tarBytes(ids.map(id =>
          s"$id.png" -> PerceptualHash.synthTexturePng(id))))
    val outDir = java.nio.file.Files.createTempDirectory("tarout").toString
    writeShard(0, Seq(1L, 2L))
    writeShard(1, Seq(3L))
    // parquet sink: the memory sink refuses checkpoint RECOVERY, and
    // the cross-invocation bookkeeping is exactly what this pins
    def drain(): Unit = {
      val q = TarShards.tarShardPhashStream(spark, dir)
        .toDF("shard", "media_id", "phash")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(first.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
    // the streamed hashes equal the batch operator's over the same blobs
    import spark.implicits._
    val batch = PerceptualHash.pHashImages(
      Seq(1L, 2L, 3L, 9L).map(id =>
        (id, PerceptualHash.synthTexturePng(id)))
        .toDF("media_id", "blob"), "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    first.foreach { case (_, id, h) => assert(h === batch(id)) }
    // a NEW shard arrives; the replay drains ONLY it (seen shards stay
    // booked in the checkpoint)
    writeShard(2, Seq(9L))
    drain()
    val second = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(second.length === 4)
    assert(second.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L, 9L))
    second.foreach { case (id, h) => assert(h === batch(id)) }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cp))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
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
