package graft.pipeline

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpecBase {
  import spark.implicits._

  private def tbl(dir: String, v: Long = -1L): Map[Long, String] =
    VersionedTable.read(spark, dir, v).drop("bucket")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap

  test("create + cdc chain: latest reads the merged state, every prior " +
      "version time-travels exactly") {
    val dir = java.nio.file.Files.createTempDirectory("vtab").toString + "/t"
    val init = (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v")
    VersionedTable.create(init, dir, "k", 8)
    assert(VersionedTable.latestVersion(spark, dir) === 0L)
    val v0 = (0L until 200L).map(k => k -> s"v$k").toMap
    assert(tbl(dir) === v0)

    val b1 = Seq((5L, "old", "U", 1L), (5L, "b1", "U", 2L),
      (7L, "", "D", 1L), (900L, "new", "I", 1L)).toDF("k", "v", "op", "seq")
    VersionedTable.applyCdc(spark, dir, b1, "k", "op", "seq", 8)
    val v1 = v0 - 7L + (5L -> "b1") + (900L -> "new")
    assert(VersionedTable.latestVersion(spark, dir) === 1L)
    assert(tbl(dir) === v1)

    val b2 = Seq((5L, "b2", "U", 1L), (900L, "", "D", 1L))
      .toDF("k", "v", "op", "seq")
    VersionedTable.applyCdc(spark, dir, b2, "k", "op", "seq", 8)
    val v2 = v1 + (5L -> "b2") - 900L
    assert(tbl(dir) === v2)

    // time travel: every retained version replays bit-for-bit
    assert(tbl(dir, 0L) === v0)
    assert(tbl(dir, 1L) === v1)
    assert(tbl(dir, 2L) === v2)
  }

  test("snapshot isolation: a reader holding an old snapshot is " +
      "undisturbed by commits; data files are immutable") {
    val dir = java.nio.file.Files.createTempDirectory("vsnap").toString + "/t"
    VersionedTable.create(
      (0L until 100L).map(k => (k, s"a$k")).toDF("k", "v"), dir, "k", 4)
    val snapshot = VersionedTable.read(spark, dir) // resolved at v0
    def files() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/data")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.lastModified(), f.length())).toMap
    }
    val before = files()
    VersionedTable.applyCdc(spark,
      dir, Seq((1L, "CHANGED", "U", 1L)).toDF("k", "v", "op", "seq"),
      "k", "op", "seq", 4)
    // the old snapshot still reads v0 content (its files untouched)
    val snapMap = snapshot.drop("bucket").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(snapMap(1L) === "a1")
    // every pre-commit file survives byte-identical (immutability)
    val after = files()
    before.foreach { case (p, st) => assert(after.get(p) === Some(st)) }
    // and the new latest sees the change
    assert(tbl(dir)(1L) === "CHANGED")
  }

  test("crashed commit (manifest written, pointer swap missed) is " +
      "invisible; the retry converges to the never-crashed state") {
    val dir = java.nio.file.Files.createTempDirectory("vcrash").toString + "/t"
    VersionedTable.create(
      (0L until 50L).map(k => (k, s"a$k")).toDF("k", "v"), dir, "k", 4)
    val batch = Seq((3L, "fresh", "U", 1L), (60L, "new", "I", 1L))
      .toDF("k", "v", "op", "seq")
    // simulate the crash: a manifest for v1 exists but _LATEST still
    // points at v0 (as if the writer died between manifest and swap)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifests/v00000001"),
      "9999\tbucket=0/part-bogus.parquet\n".getBytes)
    assert(VersionedTable.latestVersion(spark, dir) === 0L)
    assert(tbl(dir)(3L) === "a3") // orphan manifest invisible to readers
    VersionedTable.applyCdc(spark, dir, batch, "k", "op", "seq", 4)
    assert(VersionedTable.latestVersion(spark, dir) === 1L)
    val expect = (0L until 50L).map(k => k -> s"a$k").toMap +
      (3L -> "fresh") + (60L -> "new")
    assert(tbl(dir) === expect)
  }

  test("crash AFTER data-file adoption (pointer never swapped): the " +
      "retry's deterministic names do not collide and same-version " +
      "orphans of the crashed attempt are swept") {
    val dir = java.nio.file.Files.createTempDirectory("vadopt").toString + "/t"
    VersionedTable.create(
      (0L until 50L).map(k => (k, s"a$k")).toDF("k", "v"), dir, "k", 4)
    // crashed attempt at v1: a multi-bucket batch runs to completion...
    val crashed = Seq((3L, "crashA", "U", 1L), (4L, "crashB", "U", 1L),
      (60L, "neverlanded", "I", 1L)).toDF("k", "v", "op", "seq")
    VersionedTable.applyCdc(spark, dir, crashed, "k", "op", "seq", 4)
    // ...then we rewind manifest+pointer, leaving ONLY the adopted
    // part-v00000001-* data files — the exact crash-between-adoptStaged-
    // and-writeManifest state
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/manifests/v00000001"))
    // drop the checksum sidecar too — the raw rewind below would
    // otherwise trip LocalFileSystem's CRC verification
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/._LATEST.crc"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_LATEST"), "0\n".getBytes)
    assert(VersionedTable.latestVersion(spark, dir) === 0L)
    // the retry commits a DIFFERENT (narrower) batch at the same v1
    val retry = Seq((3L, "fresh", "U", 1L)).toDF("k", "v", "op", "seq")
    VersionedTable.applyCdc(spark, dir, retry, "k", "op", "seq", 4)
    assert(VersionedTable.latestVersion(spark, dir) === 1L)
    val state = tbl(dir)
    assert(state(3L) === "fresh")
    assert(state(4L) === "a4", "crashed attempt's update must not leak")
    assert(!state.contains(60L), "crashed attempt's insert must not leak")
    // every v1-stamped file on disk is referenced by the v1 manifest —
    // the crashed attempt's same-version orphans were cleared, so no
    // rename collision and no unreachable files wearing a published stamp
    val manifest = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$dir/manifests/v00000001"))
      .toArray.map(_.toString.split("\t")(1)).toSet
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val v1OnDisk = walk(new java.io.File(s"$dir/data"))
      .filter(_.getName.startsWith("part-v00000001-"))
      .map(f => s"${f.getParentFile.getName}/${f.getName}").toSet
    assert(v1OnDisk === manifest.filter(_.contains("part-v00000001-")))
  }

  test("empty states read as empty frames with the table schema: a " +
      "bucket emptied by deletes (lookupKeys) and a fully-deleted " +
      "table (read)") {
    val dir = java.nio.file.Files.createTempDirectory("vempty").toString + "/t"
    val keys = 0L until 20L
    VersionedTable.create(
      keys.map(k => (k, s"a$k")).toDF("k", "v"), dir, "k", 4)
    // empty the whole bucket key 5 hashes to
    val b5 = spark.range(1)
      .select(Sinks.bucketId(lit(5L), 4)).head().getInt(0)
    val sameBucket = keys.filter(k => spark.range(1)
      .select(Sinks.bucketId(lit(k), 4)).head().getInt(0) == b5)
    VersionedTable.applyCdc(spark, dir,
      sameBucket.map(k => (k, "", "D", 1L)).toDF("k", "v", "op", "seq"),
      "k", "op", "seq", 4)
    val lk = VersionedTable.lookupKeys(spark, dir, "k", Seq(5L), 4)
    assert(lk.count() === 0L, "a valid empty lookup, not an exception")
    assert(lk.columns.contains("k") && lk.columns.contains("v"))
    // now delete everything: the table's latest version lists no files
    VersionedTable.applyCdc(spark, dir,
      keys.map(k => (k, "", "D", 1L)).toDF("k", "v", "op", "seq"),
      "k", "op", "seq", 4)
    val empty = VersionedTable.read(spark, dir)
    assert(empty.count() === 0L)
    assert(empty.columns.contains("k") && empty.columns.contains("v"))
    // time travel below the deletes still replays the full state
    assert(tbl(dir, 0L).keySet === keys.toSet)
  }

  test("vacuum keeps the retention window readable, drops older " +
      "versions loudly, and sweeps unreferenced files") {
    val dir = java.nio.file.Files.createTempDirectory("vvac").toString + "/t"
    VersionedTable.create(
      (0L until 40L).map(k => (k, s"a$k")).toDF("k", "v"), dir, "k", 4)
    (1 to 3).foreach { i =>
      VersionedTable.applyCdc(spark,
        dir, Seq((1L, s"u$i", "U", 1L)).toDF("k", "v", "op", "seq"),
        "k", "op", "seq", 4)
    }
    VersionedTable.vacuum(spark, dir, keep = 2)
    assert(tbl(dir)(1L) === "u3")     // latest intact
    assert(tbl(dir, 2L)(1L) === "u2") // inside the window
    val ex = intercept[IllegalArgumentException](tbl(dir, 0L))
    assert(ex.getMessage.contains("vacuumed or never committed"))
    // files referenced only by dropped versions are gone: bucket of k=1
    // accumulated one file per version; only the kept versions' remain
    val b1 = graft.pipeline.Sinks
    val bucket = spark.range(1).select(b1.bucketId(lit(1L), 4)).head().getInt(0)
    val left = new java.io.File(s"$dir/data/bucket=$bucket").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(left.count(_.startsWith("part-v0000000")) <= 2, left.mkString(","))
  }

  test("lookupKeys hands the scan only the probed buckets' files") {
    val dir = java.nio.file.Files.createTempDirectory("vlk").toString + "/t"
    VersionedTable.create(
      (0L until 100L).map(k => (k, s"a$k")).toDF("k", "v"), dir, "k", 8)
    val lk = VersionedTable.lookupKeys(spark, dir, "k", Seq(5L, 9L), 8)
    assert(lk.collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v"))
      .toSet === Set(5L -> "a5", 9L -> "a9"))
    val scanned = lk.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location")))
    // 8 buckets on disk, at most 2 distinct buckets' files in the scan
    val probed = spark.range(1).select(
        graft.pipeline.Sinks.bucketId(lit(5L), 8),
        graft.pipeline.Sinks.bucketId(lit(9L), 8))
      .head().toSeq.map(_.asInstanceOf[Int]).toSet
    assert(probed.size <= 2)
    val numFiles = lk.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.length }.sum
    assert(numFiles <= probed.size, s"scan lists $numFiles files")
  }
}
