package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks (SURVEY.md S5-S8). The reference pickles result dicts
  * (main.py:176-182) — pickle is Python-only, so the same fields are
  * serialized as a single-row struct to JSON/Parquet (S7 note in SURVEY §2.1).
  */
object Sinks {

  /** S4: object-existence probe for conditional pipeline branches (the
    * reference probes S3 before recomputing population modes,
    * chisquared_tester.py:782-786) — Hadoop FS API on the driver, works for
    * any configured filesystem (local, s3a, ...). */
  def exists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Early-exit caching guard: compute and write only when absent
    * (reference's skip-if-output-exists pattern). Returns true if written. */
  def writeParquetIfAbsent(df: => DataFrame, path: String): Boolean = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (exists(spark, path)) false
    else { df.write.mode(SaveMode.ErrorIfExists).parquet(path); true }
  }

  /** S5: metrics CSV per segmentation type (coalesced — metric tables are
    * tiny; a 100 TB pipeline still writes KB here). */
  def metricsCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", true).csv(path)

  /** S6: parquet sink (population modes etc.). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S8: JSON sink. */
  def json(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed-table sink: persist a table hash-bucketed (and sorted)
    * on its join/aggregation key. THE storage-layout lever for repeated
    * big-table joins at 100 TB: two tables bucketed on the same key with
    * the same bucket count join with ZERO Exchange — the shuffle is paid
    * once at write time instead of on every downstream query (and
    * bucket-local sort makes it a sort-merge join with no sort either).
    * Registered to the session catalog (`saveAsTable` — bucket metadata
    * lives in the catalog, plain `.parquet(path)` cannot carry it);
    * the exchange-free join contract is spec-pinned in SinksSpec. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** ORC sink — the second columnar format (parquet is the default;
    * ORC covers warehouses standardized on it). Spark's OrcScan carries
    * the same scan-side contracts as parquet — predicate pushdown +
    * column pruning (PushedFilters in the plan) — so switching formats
    * costs no plan quality; OrcSpec pins round-trip fidelity AND the
    * pushdown. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.orc(path)

  /** Corrupt-tolerant JSONL ingest with a quarantine lane. A 100 TB
    * ingest WILL contain malformed lines; FAILFAST kills the job on the
    * first one and DROPMALFORMED silently loses data — the production
    * answer is PERMISSIVE parse + route the RAW broken line to a replay
    * sink. Returns the parsed good rows; the quarantine path receives
    * each broken line verbatim (text, one per line — re-ingestable by
    * this same function after repair).
    *
    * The corrupt column must be materialized before it can be filtered
    * alone (Spark disallows queries referencing ONLY the internal
    * corrupt-record column), hence the cache; it is released after the
    * quarantine write — the good-row frame re-reads the source. */
  def readJsonWithQuarantine(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: org.apache.spark.sql.types.StructType,
      quarantinePath: String): DataFrame = {
    val corrupt = "_corrupt_record"
    val raw = spark.read
      .schema(schema.add(corrupt, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .cache()
    try {
      raw.filter(col(corrupt).isNotNull).select(col(corrupt))
        .write.mode(SaveMode.Append).text(quarantinePath)
      val good = raw.filter(col(corrupt).isNull).drop(corrupt)
      // materialize before releasing the cache so the returned frame
      // never re-parses the source (this call is an ingest ACTION, not a
      // lazy transform — the quarantine write already ran a job)
      good.localCheckpoint(eager = true)
    } finally raw.unpersist(blocking = false)
  }

  /** Deterministic bucket id for the keyed-bucket layout: pmod(xxhash64)
    * — NOT Spark's internal bucketBy hash, because the id must be
    * reproducible by name from any engine/session (the layout contract
    * lives in directory names, not catalog metadata). */
  def bucketId(key: org.apache.spark.sql.Column, numBuckets: Int)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(key), lit(numBuckets.toLong)).cast("int")

  /** Keyed-bucket table layout: rows land in `bucket=<i>` partition dirs
    * by hashed key. The point is [[applyCdc]]: a change batch touches
    * only the buckets its keys hash to, so incremental maintenance
    * rewrites |touched buckets| / numBuckets of the table instead of all
    * of it, and key lookups prune to one directory (PartitionFilters on
    * the bucket column — spec-pinned). */
  def writeKeyedBuckets(df: DataFrame, dir: String, key: String,
      numBuckets: Int): Unit = {
    df.withColumn("bucket", bucketId(col(key), numBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(dir)
    // self-describing layout: the sidecar lets InjectBucketPruning derive
    // bucket partition filters from plain key predicates at plan time
    graft.plans.KeyedBucketMeta.write(
      df.sparkSession.sparkContext.hadoopConfiguration, dir, key, numBuckets)
  }

  private def mustRename(fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(from, to)) throw new java.io.IOException(
      s"cdc commit: rename $from -> $to failed")

  /** Crash recovery for the backup-aside commit, run on ENTRY of every
    * [[applyCdc]]/[[compactCdc]] — BEFORE the table is read. A non-empty
    * `<dir>__cdc_backup` means a prior commit crashed mid-swap; for each
    * `bucket=b` it holds there are exactly two cases:
    *
    *  - absent from the table root → the crash hit between rename-out
    *    and rename-in, so the backup holds the ONLY copy of that bucket
    *    (or the commit was validly retiring an emptied bucket — both are
    *    indistinguishable here). The pre-batch content is RESTORED; the
    *    conservative choice never loses rows, and re-applying the
    *    crashed batch (idempotent, see below) re-deletes what an
    *    emptied-bucket commit meant to drop.
    *  - present in the table root → that bucket's swap completed before
    *    the crash; the table copy is the committed one and the backup
    *    copy is the superseded pre-batch state — dropped.
    *
    * Only after every bucket is resolved is the backup dir deleted, so a
    * crash DURING recovery re-enters the same (idempotent) resolution. */
  private def recoverCdcBackup(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val backupPath = new org.apache.hadoop.fs.Path(
      dir.stripSuffix("/") + "__cdc_backup")
    if (!fs.exists(backupPath)) return
    fs.listStatus(backupPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .foreach { st =>
        val tableSide = new org.apache.hadoop.fs.Path(
          dir.stripSuffix("/"), st.getPath.getName)
        if (!fs.exists(tableSide)) {
          System.err.println(s"[graft] cdc recovery: restoring " +
            s"${st.getPath.getName} from crashed commit backup at $backupPath")
          mustRename(fs, st.getPath, tableSide)
        }
      }
    fs.delete(backupPath, true)
  }

  /** Backup-aside bucket swap shared by [[applyCdc]] and [[compactCdc]]:
    * each old bucket is renamed OUT (to a sibling backup dir, never
    * inside the table root — partition discovery must not see it) before
    * the staged bucket is renamed IN, so a crash between the two leaves
    * the data recoverable in the backup instead of gone; every rename's
    * boolean result is checked — a failed rename (cross-FS, permissions)
    * aborts loudly instead of silently committing data loss. The backup
    * dir is deleted only after ALL swaps complete. */
  private def commitBuckets(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, stage: String, buckets: Seq[Int]): Unit = {
    val backup = dir.stripSuffix("/") + "__cdc_backup"
    val backupPath = new org.apache.hadoop.fs.Path(backup)
    fs.mkdirs(backupPath)
    buckets.foreach { b =>
      val from = new org.apache.hadoop.fs.Path(s"$stage/bucket=$b")
      val to = new org.apache.hadoop.fs.Path(s"${dir.stripSuffix("/")}/bucket=$b")
      val bak = new org.apache.hadoop.fs.Path(s"$backup/bucket=$b")
      if (fs.exists(to)) mustRename(fs, to, bak)
      // a touched bucket can vanish entirely (every row deleted):
      // staged dir absent is a valid commit of an empty bucket
      if (fs.exists(from)) mustRename(fs, from, to)
    }
    fs.delete(backupPath, true)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** CDC merge into a [[writeKeyedBuckets]] table: `batch` carries one
    * row per change with an op column ('I'/'U' upsert, 'D' delete) and a
    * sequence column ordering changes to the same key (the latest wins —
    * a debezium-style changelog collapse). At-scale shape:
    *
    *  1. recover any crashed prior commit ([[recoverCdcBackup]]) so the
    *     table read below never silently misses a bucket stranded in the
    *     backup dir;
    *  2. collapse the batch per key (window over the BATCH, which is
    *     change-sized, never table-sized);
    *  3. list the touched buckets (distinct over the collapsed batch —
    *     config-sized driver list);
    *  4. read ONLY those bucket dirs (partition pruning), anti-join out
    *     the changed keys, union the upserts;
    *  5. stage the rewritten buckets to a temp dir, then swap each
    *     bucket dir via the checked backup-aside protocol
    *     ([[commitBuckets]]) — never an in-place overwrite of a path
    *     being read (Spark refuses it), never delete-before-rename (a
    *     crash between the two would lose the bucket).
    *
    * Untouched buckets are never read, never rewritten.
    *
    * Crash contract: applying a batch is IDEMPOTENT (changed keys are
    * anti-joined out before the upserts go back in, deletes of absent
    * keys are no-ops), so after any crash the recovery rule is simply
    * "re-apply the same batch, then continue" — recovery on entry
    * restores any bucket whose swap didn't complete to its pre-batch
    * content, and the re-apply brings every bucket to the post-batch
    * state a never-crashed run would have produced (spec-pinned with a
    * simulated mid-swap crash in PipelineSpec).
    *
    * Concurrency contract: SINGLE WRITER per table dir. The stage and
    * backup dirs are fixed siblings of `dir`, so two concurrent
    * applyCdc/compactCdc calls on the same table would corrupt each
    * other's commit state; serialize writers externally (one changelog
    * consumer per table — the natural CDC topology). Readers are safe
    * concurrently EXCEPT in the swap window of a bucket they scan. */
  def applyCdc(spark: org.apache.spark.sql.SparkSession, dir: String,
      batch: DataFrame, key: String, opCol: String, seqCol: String,
      numBuckets: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCdcBackup(fs, dir)
    val w = Window.partitionBy(key).orderBy(col(seqCol).desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("bucket", bucketId(col(key), numBuckets))
      .cache()
    try {
      val touched = latest.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      // mergeSchema: after an evolving batch, only TOUCHED buckets carry
      // the widened schema on disk — a plain read would adopt whichever
      // file it sampled first and could drop the new column
      val existing = spark.read.option("mergeSchema", "true").parquet(dir)
        .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
      val survivors = existing
        .join(latest.select(col(key)), Seq(key), "left_anti")
      val upserts = latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
      val stage = dir.stripSuffix("/") + "__cdc_stage"
      // allowMissingColumns: CDC batches EVOLVE schemas — a batch with a
      // new column widens the table (survivors read back null there), a
      // batch missing a column leaves nulls; a hard unionByName would
      // reject the first evolved batch a real changelog ships
      survivors.unionByName(upserts, allowMissingColumns = true)
        .repartition(col("bucket"))
        .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(stage)
      commitBuckets(fs, dir, stage, touched)
    } finally latest.unpersist(blocking = false)
  }

  /** Compaction for a [[applyCdc]]-maintained table. applyCdc itself
    * keeps one file per touched bucket, but two kinds of debt still
    * accrete in a long-lived changelog loop: (a) SCHEMA-WIDTH STRAGGLERS
    * — after an evolving batch, only touched buckets carry the widened
    * footer, so every read forever after needs mergeSchema (which walks
    * ALL footers — at 100 TB that is a full-listing metadata pass per
    * query); (b) out-of-band appends/backfills that land extra files in
    * a bucket dir. Rewrites EVERY bucket to the widest (merged) schema
    * with exactly one file per non-empty bucket, committed through the
    * same checked backup-aside protocol as applyCdc — crash-safe and
    * never observed half-compacted. Bucket membership, the sidecar
    * ([[writeKeyedBuckets]]) and row content are unchanged: reads before
    * and after are identical, and a plain (no-mergeSchema) read is
    * sufficient afterwards. Same single-writer contract as [[applyCdc]]. */
  def compactCdc(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCdcBackup(fs, dir)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .map(_.getPath.getName.stripPrefix("bucket=").toInt).sorted.toSeq
    if (buckets.isEmpty) return
    val stage = dir.stripSuffix("/") + "__cdc_stage"
    // repartition on the bucket value puts each bucket's rows in exactly
    // one shuffle partition, so partitionBy emits exactly one file per
    // bucket; mergeSchema widens every row to the union schema so the
    // compacted footers are uniform
    spark.read.option("mergeSchema", "true").parquet(dir)
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(stage)
    commitBuckets(fs, dir, stage, buckets)
  }

  /** Pruned point/key lookup against a keyed-bucket table: the bucket
    * predicate is a PARTITION filter, so only |keys| directories are
    * listed and scanned. */
  def lookupKeys(spark: org.apache.spark.sql.SparkSession, dir: String,
      key: String, keys: Seq[Any], numBuckets: Int): DataFrame = {
    // one 1-row job evaluates the writer's own pmod(xxhash64) for every
    // probe key — hashing driver-side in Scala would silently diverge
    // from Spark's typed xxhash64 the day a key type changes
    val hashed = spark.range(1)
      .select(keys.map(k => bucketId(lit(k), numBuckets)): _*)
      .head().toSeq.map(_.asInstanceOf[Int]).distinct
    spark.read.parquet(dir)
      .filter(col("bucket").isin(hashed.map(Integer.valueOf): _*) &&
        col(key).isin(keys: _*))
  }

  /** S7: segmentation-result bundle — the pickled dict's fields as one
    * struct row: labels live in their own parquet (data-scale), summary
    * fields in JSON. */
  def segmentationResult(labeled: DataFrame, idCol: String,
      metrics: Map[String, Double], outDir: String): Unit = {
    labeled.select(col(idCol), col("cluster"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/labels")
    val spark = labeled.sparkSession
    import spark.implicits._
    metrics.toSeq.toDF("metric", "value").coalesce(1)
      .write.mode(SaveMode.Overwrite).json(s"$outDir/metrics")
  }
}
