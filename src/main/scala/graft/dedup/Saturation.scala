package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup saturation curve — the "is new data still new?" read-out a
  * crawl pipeline plots before paying for the next batch (the
  * aggregate view of what [[DedupOps]]' incremental verdicts decide
  * per document): per arrival batch, how many documents are the FIRST
  * occurrence of their exact content hash across everything that
  * arrived up to and including that batch, and the cumulative novelty
  * fraction. A flattening curve says the source is exhausted; a
  * cliff between batches says the crawler started re-fetching.
  *
  * Determinism: first occurrence = row_number 1 in the TOTAL
  * (batch, id) arrival order within each hash group; counts and the
  * micro fractions are pure integers (rule 1).
  *
  * Scale shape: ONE hash-keyed window (the exact-dedup shuffle — same
  * key as q_d_exact) decides first occurrences; the per-batch roll-up
  * is a map-side-combined aggregation and the cumulative curve a
  * window over |batches| rows. */
object Saturation {

  /** Per-batch novelty: (batch, n_docs, n_novel, novel_micro,
    * cum_docs, cum_novel, cum_novel_micro). */
  def saturationCurve(docs: DataFrame, idCol: String, textCol: String,
      batchCol: String): DataFrame = {
    // batchCol is an EXPRESSION (an arrival-wave derivation like
    // "doc_id % 5" or a date_trunc), not necessarily a bare column
    val h = docs.select(expr(batchCol).cast("long").as("batch"),
      col(idCol).as("id"), md5(col(textCol)).as("h"))
    val w = Window.partitionBy("h").orderBy("batch", "id")
    val per = h.withColumn("rn", row_number().over(w))
      .groupBy("batch").agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_novel"))
    // global window over the per-BATCH frame: batches are a config-sized
    // reporting axis (bounded; r16 window audit)
    val wc = Window.orderBy("batch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("novel_micro", expr("(n_novel * 1000000L) div n_docs"))
      .withColumn("cum_docs", sum("n_docs").over(wc))
      .withColumn("cum_novel", sum("n_novel").over(wc))
      .withColumn("cum_novel_micro",
        expr("(cum_novel * 1000000L) div cum_docs"))
  }

  /** q_d_saturation: five arrival waves by doc_id mod 5. */
  private val dSaturation = Q(
    (s, d) => saturationCurve(Tables.documents(s, d), "doc_id", "text",
        batchCol = "doc_id % 5")
      .orderBy("batch"),
    Some("""WITH h AS (SELECT doc_id % 5 AS batch, doc_id AS id,
                md5(text) AS h
              FROM documents),
            f AS (SELECT batch, row_number() OVER
                (PARTITION BY h ORDER BY batch, id) AS rn FROM h),
            per AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_novel
              FROM f GROUP BY 1),
            cum AS (SELECT batch, n_docs, n_novel,
                (n_novel * 1000000) // n_docs AS novel_micro,
                CAST(SUM(n_docs) OVER wb AS BIGINT) AS cum_docs,
                CAST(SUM(n_novel) OVER wb AS BIGINT) AS cum_novel
              FROM per
              WINDOW wb AS (ORDER BY batch
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            SELECT batch, n_docs, n_novel,
                   CAST(novel_micro AS BIGINT) AS novel_micro,
                   cum_docs, cum_novel,
                   CAST((cum_novel * 1000000) // cum_docs AS BIGINT)
                     AS cum_novel_micro
            FROM cum ORDER BY batch"""))

  val queries: Map[String, Q] = Map("q_d_saturation" -> dSaturation)
}
