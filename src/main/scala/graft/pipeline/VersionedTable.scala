package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Manifest-committed versioned keyed-bucket table — the snapshot-
  * isolated evolution of [[Sinks.applyCdc]]'s rename-swap protocol
  * (the Iceberg/Delta commit idea, re-derived over plain parquet +
  * Hadoop FS):
  *
  *  - DATA FILES ARE IMMUTABLE. A commit only ADDS files under
  *    `data/bucket=<b>/part-v<version>-<n>.parquet`; nothing a reader
  *    could be scanning is ever renamed, rewritten, or deleted by a
  *    commit (deletion happens only in [[vacuum]], and only for files
  *    no retained version references).
  *  - A VERSION IS A MANIFEST: `manifests/v<version>` lists exactly the
  *    files (bucket → relative path) that make up that snapshot.
  *    Readers resolve a manifest and read that explicit file list —
  *    never a directory listing — so a reader holds a consistent
  *    snapshot for as long as it wants, commits racing underneath it.
  *  - COMMIT = ATOMIC POINTER SWAP: the `_LATEST` pointer file is
  *    replaced via FileContext rename-with-OVERWRITE (atomic on POSIX
  *    and HDFS). A crash anywhere before the swap leaves orphan data
  *    files and possibly an orphan manifest — both invisible to every
  *    reader — and the retry simply re-commits; a crash after the swap
  *    IS the committed state. This closes the one window the
  *    rename-swap protocol had (readers mid-scan of a bucket being
  *    swapped).
  *
  * At 100 TB the commit cost is: rewrite of |touched buckets| bucket
  * files + one manifest (config-sized: entries, not rows) + one 1-line
  * pointer rename. Untouched buckets carry their OLD FILES FORWARD by
  * reference in the new manifest — no data movement, no rewrite.
  *
  * Single-writer contract per table (the changelog topology), as for
  * [[Sinks.applyCdc]]; readers need no coordination at all. */
object VersionedTable {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long) =
    new Path(f"$dir/manifests/v$v%08d")

  /** Latest committed version, -1 when the pointer does not exist. */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(s"$dir/_LATEST")
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def readManifest(spark: SparkSession, dir: String, v: Long)
      : Seq[(Int, String)] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    require(f.exists(p),
      s"versioned table $dir has no manifest for version $v " +
        "(vacuumed or never committed)")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in).getLines().filter(_.nonEmpty)
      .map { l => val Array(b, rel) = l.split("\t", 2); (b.toInt, rel) }
      .toList
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, dir: String, v: Long,
      entries: Seq[(Int, String)]): Unit = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    // a leftover manifest at this version can only be a crashed prior
    // attempt that never swapped the pointer (single-writer contract):
    // never published, safe to replace
    val out = f.create(p, true)
    try out.write(entries.sortBy(e => (e._1, e._2))
      .map { case (b, rel) => s"$b\t$rel" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** The atomic publish: write the pointer aside, rename over _LATEST
    * with OVERWRITE (FileContext — atomic where the FS can promise it). */
  private def swapPointer(spark: SparkSession, dir: String, v: Long): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/_LATEST.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(new Path(dir).toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(s"$dir/_LATEST"), Options.Rename.OVERWRITE)
  }

  /** Delete any data files already stamped with the (unpublished)
    * version `v` — orphans of a crashed prior attempt at this same
    * commit. Under the single-writer contract no reader can reference
    * them (the pointer never swapped), so deletion is safe; without it
    * the retry regenerates the same deterministic names and the
    * adopt-rename fails on HDFS (rename onto an existing destination)
    * or silently overwrites on a local FS. */
  private def clearCrashedAttempt(spark: SparkSession, dir: String,
      v: Long): Unit = {
    val f = fs(spark, dir)
    val dataRoot = new Path(s"$dir/data")
    val stamp = f"part-v$v%08d-"
    if (f.exists(dataRoot))
      f.listStatus(dataRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
        .foreach { bd =>
          f.listStatus(bd.getPath)
            .filter(st => st.isFile && st.getPath.getName.startsWith(stamp))
            .foreach(st => f.delete(st.getPath, false))
        }
  }

  /** Move the staged bucket files (a partitionBy("bucket") output) into
    * the immutable data area under fresh version-stamped names; returns
    * the new (bucket, relative path) entries. Clears same-version
    * orphans of a crashed prior attempt first, so the retry's renames
    * never collide. */
  private def adoptStaged(spark: SparkSession, dir: String, stage: String,
      v: Long): Seq[(Int, String)] = {
    val f = fs(spark, dir)
    clearCrashedAttempt(spark, dir, v)
    val stagePath = new Path(stage)
    if (!f.exists(stagePath)) return Nil
    f.listStatus(stagePath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .flatMap { bd =>
        val b = bd.getPath.getName.stripPrefix("bucket=").toInt
        f.listStatus(bd.getPath)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .zipWithIndex.map { case (st, i) =>
            val rel = f"bucket=$b/part-v$v%08d-$i%04d.parquet"
            val dest = new Path(s"$dir/data/$rel")
            f.mkdirs(dest.getParent)
            if (!f.rename(st.getPath, dest)) throw new java.io.IOException(
              s"versioned commit: rename ${st.getPath} -> $dest failed")
            (b, rel)
          }
      }.toSeq
  }

  /** Create version 0 from a full dataframe. */
  def create(df: DataFrame, dir: String, key: String, numBuckets: Int)
      : Unit = {
    val spark = df.sparkSession
    require(latestVersion(spark, dir) < 0,
      s"versioned table $dir already exists")
    val stage = s"$dir/__stage"
    df.withColumn("bucket", Sinks.bucketId(col(key), numBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(stage)
    val entries = adoptStaged(spark, dir, stage, 0L)
    fs(spark, dir).delete(new Path(stage), true)
    writeManifest(spark, dir, 0L, entries)
    swapPointer(spark, dir, 0L)
  }

  /** An EMPTY frame carrying the table schema — the legitimate result
    * of reading a version whose (filtered) file list is empty (all keys
    * of a bucket deleted, or a fully-deleted table). Schema is borrowed
    * from any data file still on disk (read with `limit 0`, one footer);
    * a table that never adopted a single data file has no schema to
    * offer and fails loudly. */
  private def emptySnapshot(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val dataRoot = new Path(s"$dir/data")
    val any: Option[String] =
      if (!f.exists(dataRoot)) None
      else f.listStatus(dataRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
        .iterator.flatMap(bd => f.listStatus(bd.getPath)
          .filter(_.isFile).map(_.getPath.toString))
        .nextOption()
    require(any.nonEmpty,
      s"versioned table $dir holds no data files at all — cannot " +
        "construct the schema of an empty snapshot")
    spark.read.option("basePath", s"$dir/data")
      .option("mergeSchema", "true").parquet(any.get).limit(0)
  }

  /** Read a snapshot — the latest by default, any retained `version`
    * for time travel. The scan is the manifest's explicit file list
    * (basePath keeps the bucket partition column), so it is immune to
    * concurrent commits AND naturally pruned when callers pre-filter
    * the entries ([[lookupKeys]]). A version that legitimately lists no
    * files (every row deleted) reads as an EMPTY frame with the table
    * schema — only a missing version is an error. */
  def read(spark: SparkSession, dir: String, version: Long = -1L)
      : DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, dir)
    require(v >= 0, s"versioned table $dir has no committed version")
    val files = readManifest(spark, dir, v).map(e => s"$dir/data/${e._2}")
    if (files.isEmpty) emptySnapshot(spark, dir)
    else spark.read.option("basePath", s"$dir/data")
      .option("mergeSchema", "true").parquet(files: _*)
  }

  /** Key lookup that prunes AT THE MANIFEST: only files of the buckets
    * the probed keys hash to are handed to the scan. Keys hashing to
    * buckets with no retained files (e.g. emptied by deletes) return an
    * EMPTY frame, not an exception — an empty lookup is a valid
    * answer. */
  def lookupKeys(spark: SparkSession, dir: String, key: String,
      keys: Seq[Any], numBuckets: Int, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, dir)
    require(v >= 0, s"versioned table $dir has no committed version")
    val hashed = spark.range(1)
      .select(keys.map(k => Sinks.bucketId(lit(k), numBuckets)): _*)
      .head().toSeq.map(_.asInstanceOf[Int]).toSet
    val files = readManifest(spark, dir, v)
      .filter(e => hashed.contains(e._1)).map(e => s"$dir/data/${e._2}")
    val snap =
      if (files.isEmpty) emptySnapshot(spark, dir)
      else spark.read.option("basePath", s"$dir/data")
        .option("mergeSchema", "true").parquet(files: _*)
    snap.filter(col(key).isin(keys: _*))
  }

  /** Append-only commit: ADD the batch's files to the table without
    * touching (or even reading) any existing file — the manifest for the
    * new version is the previous manifest plus the fresh entries. This
    * is the commit shape for LOG/POSTINGS semantics, where a batch only
    * ever contributes NEW rows (an IVF postings append, an event log):
    * no bucket rewrite, no survivors scan — at 100 TB the commit cost is
    * exactly |batch| bytes written + one manifest + one pointer rename,
    * independent of table size. The caller owns the no-duplicate-keys
    * guarantee ([[applyCdc]] is the path for upsert semantics); readers
    * get the same snapshot isolation as every other commit. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      key: String, numBuckets: Int): Unit = {
    val prev = latestVersion(spark, dir)
    require(prev >= 0, s"versioned table $dir must be create()d first")
    val next = prev + 1
    val stage = s"$dir/__stage"
    batch.withColumn("bucket", Sinks.bucketId(col(key), numBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(stage)
    val fresh = adoptStaged(spark, dir, stage, next)
    fs(spark, dir).delete(new Path(stage), true)
    writeManifest(spark, dir, next, readManifest(spark, dir, prev) ++ fresh)
    swapPointer(spark, dir, next)
  }

  /** CDC merge committing a new snapshot: same changelog collapse and
    * touched-bucket rewrite as [[Sinks.applyCdc]], but the commit is the
    * manifest+pointer protocol — untouched buckets travel by reference,
    * readers of any version are never disturbed, and a crashed commit
    * leaves only invisible orphans for the retry ([[vacuum]] sweeps
    * them). Idempotent per batch for the same reason applyCdc is. */
  def applyCdc(spark: SparkSession, dir: String, batch: DataFrame,
      key: String, opCol: String, seqCol: String, numBuckets: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val prev = latestVersion(spark, dir)
    require(prev >= 0, s"versioned table $dir must be create()d first")
    val next = prev + 1
    val w = Window.partitionBy(key).orderBy(col(seqCol).desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("bucket", Sinks.bucketId(col(key), numBuckets))
      .cache()
    try {
      val touched = latest.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val entries = readManifest(spark, dir, prev)
      // survivors read ONLY the touched buckets' files — manifest-level
      // pruning, no directory listing, no partition-filter reliance
      val touchedFiles = entries.filter(e => touched.contains(e._1))
        .map(e => s"$dir/data/${e._2}")
      val stage = s"$dir/__stage"
      if (touchedFiles.nonEmpty) {
        val existing = spark.read.option("basePath", s"$dir/data")
          .option("mergeSchema", "true").parquet(touchedFiles: _*)
        val survivors = existing
          .join(latest.select(col(key)), Seq(key), "left_anti")
        val upserts = latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
        survivors.unionByName(upserts, allowMissingColumns = true)
          .repartition(col("bucket"))
          .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(stage)
      } else {
        latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
          .repartition(col("bucket"))
          .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(stage)
      }
      val fresh = adoptStaged(spark, dir, stage, next)
      fs(spark, dir).delete(new Path(stage), true)
      val carried = entries.filterNot(e => touched.contains(e._1))
      writeManifest(spark, dir, next, carried ++ fresh)
      swapPointer(spark, dir, next)
    } finally latest.unpersist(blocking = false)
  }

  /** Retention sweep: drop manifests older than the `keep` most recent
    * versions and every data file none of the kept manifests reference
    * (this includes orphans from crashed commits). Runs entirely on
    * manifests + one listing of the data area — never reads row data.
    * Time travel below the retention horizon then fails loudly in
    * [[read]]. */
  def vacuum(spark: SparkSession, dir: String, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the latest version")
    val f = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    require(latest >= 0, s"versioned table $dir has no committed version")
    val all = f.listStatus(new Path(s"$dir/manifests"))
      .map(_.getPath.getName.stripPrefix("v").toLong).sorted.toSeq
    val kept = all.filter(v => v > latest - keep && v <= latest)
    val referenced = kept.flatMap(v => readManifest(spark, dir, v))
      .map(_._2).toSet
    all.filterNot(kept.contains)
      .foreach(v => f.delete(manifestPath(dir, v), false))
    val dataRoot = new Path(s"$dir/data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
        .foreach { bd =>
          f.listStatus(bd.getPath).filter(_.isFile).foreach { st =>
            val rel = s"${bd.getPath.getName}/${st.getPath.getName}"
            if (!referenced.contains(rel)) f.delete(st.getPath, false)
          }
        }
  }
}
