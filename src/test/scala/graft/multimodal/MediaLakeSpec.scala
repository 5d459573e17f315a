package graft.multimodal

import graft.SparkSpecBase

class MediaLakeSpec extends SparkSpecBase {

  test("binaryFile round trip: written PNGs scan back with parsed ids " +
      "and identical bytes; foreign files are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("lake").toString
    val a = PerceptualHash.synthTexturePng(3L)
    val b = PerceptualHash.synthTexturePng(17L)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "3.png"), a)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "17.png"), b)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "README.png"),
      "not an id".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "9.jpeg"),
      Array[Byte](1, 2)) // filtered by the glob
    val rows = MediaLake.readMediaDir(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows.keySet === Set(3L, 17L))
    assert(rows(3L).toSeq === a.toSeq)
    assert(rows(17L).toSeq === b.toSeq)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("lake scan feeds the column operators unchanged: pHash over " +
      "the scan equals pHash over in-memory blobs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lake2").toString
    val ids = Seq(1L, 2L, 254L)
    ids.foreach(id => java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"$id.png"),
      PerceptualHash.synthTexturePng(id)))
    val viaLake = PerceptualHash.pHashImages(
      MediaLake.readMediaDir(spark, dir), "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMem = PerceptualHash.pHashImages(
      ids.map(id => (id, PerceptualHash.synthTexturePng(id)))
        .toDF("media_id", "blob"), "media_id", "blob")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLake === viaMem)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
