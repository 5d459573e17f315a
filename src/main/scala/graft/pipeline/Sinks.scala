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
