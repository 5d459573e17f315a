package graft.sketch

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heavy hitters (exact top-k by frequency) without shuffling the full
  * value domain: a Misra-Gries sketch pass finds candidates, an exact
  * recount confirms them.
  *
  * A plain `groupBy(value).count().orderBy(...).limit(k)` shuffles one
  * record per DISTINCT value — at 100 TB a high-cardinality column (URLs,
  * shingles, user ids) makes that shuffle data-sized. Here instead:
  *
  *   1. each partition builds a capacity-m Misra-Gries summary (≤ m
  *      entries, undercounts by at most n_p/(m+1));
  *   2. summaries merge associatively (sum counts, subtract the (m+1)-th
  *      largest, drop non-positive — the standard mergeable-summary rule)
  *      via `treeReduce`, so the driver receives ONE ≤ m-entry map no
  *      matter how many partitions ran;
  *   3. the ≤ m candidate values are recounted EXACTLY with a filtered
  *      aggregation (the `isin` filter reaches the scan, and the shuffle
  *      carries at most m distinct keys).
  *
  * The result equals the true top-k whenever the k-th frequency exceeds
  * n/(m+1) — the classic MG guarantee; size m accordingly (m = 256 covers
  * any item with > 0.4 % share). Because the output is EXACT counts, it is
  * oracle-checkable against a plain SQL top-k, unlike approximate sketches.
  */
object HeavyHitters {

  private[sketch] def sketch(it: Iterator[String], cap: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { v =>
      if (m.contains(v)) m(v) += 1L
      else if (m.size < cap) m(v) = 1L
      else {
        val dead = m.keysIterator.filter { k => m(k) == 1L }.toList
        m.mapValuesInPlace((_, c) => c - 1L)
        dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  private[sketch] def mergeAndPrune(a: Map[String, Long], b: Map[String, Long],
      cap: Int): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (sum.size <= cap) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(cap)
      sum.collect { case (k, c) if c - cut > 0 => k -> (c - cut) }
    }
  }

  /** Exact top-k of `valueCol` by count (ties broken by value ascending),
    * assuming the k-th frequency exceeds n/(capacity+1). */
  def topK(df: DataFrame, valueCol: String, k: Int, capacity: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as(valueCol))
      .filter(col(valueCol).isNotNull)
    val merged = vals.as[String].rdd
      .mapPartitions(it => Iterator(sketch(it, capacity)))
      .treeReduce(mergeAndPrune(_, _, capacity))
    val cands = merged.keys.toSeq
    vals.filter(col(valueCol).isin(cands: _*))
      .groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(valueCol))
      .limit(k)
  }

  // -- registered queries -------------------------------------------------

  /** Top-10 words over the documents corpus via the sketch path; the oracle
    * is the plain SQL top-k the sketch is guaranteed to reproduce. */
  private val skTopWords = Q(
    (s, d) => topK(
      Tables.documents(s, d).select(
        explode(graft.text.TextOps.tokens(lower(col("text")))).as("word")),
      "word", 10),
    Some("""SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                    x -> x <> '')) AS word FROM documents)
            GROUP BY 1 ORDER BY cnt DESC, word LIMIT 10"""))

  val queries: Map[String, Q] = Map(
    "q_sk_heavy_hitters" -> skTopWords)
}
