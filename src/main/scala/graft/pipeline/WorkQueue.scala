package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental work-queue semantics (SURVEY.md S9; reference
  * kraken/assets.py:18-25 + aws_init.py:68-78): a JSON document of
  * `{id, title, processed_by: [...]}` items; each run takes the first item
  * not yet processed by this engine and marks it processed on completion.
  *
  * Implemented as plain batch over `spark.read.json` (the queue is a tiny
  * control-plane document — driver-side would also do, but keeping it a
  * DataFrame keeps the semantics testable and source-agnostic).
  */
object WorkQueue {

  val Processor = "graft"

  final case class QueueItem(id: Long, title: String, processedBy: Seq[String])

  /** Reads either JSON-lines (Spark's own write format) or a single JSON
    * array document (the reference's queue file shape). */
  def readQueue(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.json(path)
    if (df.columns.isEmpty || df.columns.contains("_corrupt_record"))
      spark.read.option("multiLine", true).json(path)
    else df
  }

  /** First unprocessed item in id order, or None (assets.py:18-25). */
  def nextSurvey(queue: DataFrame): Option[QueueItem] = {
    val remaining = queue
      .withColumn("processed_by",
        coalesce(col("processed_by"), array().cast("array<string>")))
      .filter(!array_contains(col("processed_by"), Processor))
      .orderBy("id")
      .limit(1).collect()
    remaining.headOption.map(r => QueueItem(
      r.getAs[Long]("id"), r.getAs[String]("title"),
      Option(r.getAs[scala.collection.Seq[String]]("processed_by"))
        .map(_.toSeq).getOrElse(Seq.empty)))
  }

  /** Append this processor to the item's processed_by list and return the
    * full updated queue (aws_init.py:74-78). */
  def markProcessed(queue: DataFrame, id: Long): DataFrame =
    queue.withColumn("processed_by",
      when(col("id") === id &&
          !array_contains(coalesce(col("processed_by"),
            array().cast("array<string>")), Processor),
        array_union(coalesce(col("processed_by"), array().cast("array<string>")),
          array(lit(Processor))))
      .otherwise(coalesce(col("processed_by"), array().cast("array<string>"))))

  def writeQueue(queue: DataFrame, path: String): Unit =
    queue.coalesce(1).write.mode("overwrite").json(path)
}
