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

  /** HyperLogLog++ distinct-count contract: at 100 TB nobody runs
    * COUNT(DISTINCT) over raw keys — the sketch (one pass, mergeable,
    * fixed memory) is the real plan, and this query certifies its error
    * bound. Both the approximation and the exact count are computed
    * in-plan and the hashed surface is the CONTRACT: |approx − exact| ≤
    * 5·rsd·exact at rsd = 0.02 (HLL++'s standard-error multiple; 5σ keeps
    * the bound deterministic for a fixed Spark version while still failing
    * on any real sketch regression). The oracle supplies the exact count
    * and the TRUE literal — the same quality-contract pattern as
    * q_s_ann_ivf's recall. */
  private val skHll = Q(
    (s, d) => {
      val keys = Tables.lineitem(s, d).select(col("l_orderkey"))
      keys.agg(
          approx_count_distinct("l_orderkey", 0.02).as("approx"),
          countDistinct("l_orderkey").as("exact"))
        .select(col("exact").as("n_distinct"),
          (abs(col("approx") - col("exact")) <=
            lit(5 * 0.02) * col("exact")).as("within_bound"))
    },
    Some("""SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
            TRUE AS within_bound FROM lineitem"""))

  /** Approximate-quantile contract (Greenwald-Khanna): the sketch path for
    * percentiles over data too large to sort. approx_percentile at
    * accuracy 10000 (rank error ≤ 1e-4·N) must land within rank ±1% of
    * each requested quantile — a 100× margin over the sketch's guarantee,
    * so the contract survives Spark-version sketch-detail shifts and
    * small tie groups while still failing on a real regression. Verified
    * in-plan against the exact rank fractions, hashed as the contract
    * booleans. */
  private val skQuantiles = Q(
    (s, d) => {
      val v = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
      val approx = v.agg(percentile_approx(col("x"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
      // exact ranks of the approximated values: fraction of rows <= q_i
      val withQ = v.crossJoin(broadcast(approx))
      withQ.agg(
          count(lit(1)).as("n"),
          (sum(when(col("x") <= element_at(col("q"), 1), 1).otherwise(0)) /
            count(lit(1))).as("r25"),
          (sum(when(col("x") <= element_at(col("q"), 2), 1).otherwise(0)) /
            count(lit(1))).as("r50"),
          (sum(when(col("x") <= element_at(col("q"), 3), 1).otherwise(0)) /
            count(lit(1))).as("r75"))
        .select(col("n"),
          (col("r25") >= 0.24 && col("r25") <= 0.26).as("ok25"),
          (col("r50") >= 0.49 && col("r50") <= 0.51).as("ok50"),
          (col("r75") >= 0.74 && col("r75") <= 0.76).as("ok75"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            TRUE AS ok25, TRUE AS ok50, TRUE AS ok75 FROM lineitem"""))

  /** Mergeable per-group distinct-count STATE (DataSketches HLL via the
    * built-in `hll_sketch_agg`) — the incremental twin of
    * q_sk_hll_distinct's one-shot contract. The sketch is a binary
    * column in an ordinary DataFrame, so it persists as parquet like any
    * other state table: each ingest batch builds its own per-group
    * sketches (one pass over the BATCH), and the running distinct count
    * is a union-merge of sketch rows — history is never rescanned, and
    * the state is group-count-sized forever (~2^lgK bytes per group).
    * lgK=12 → relative standard error ~1.04/√4096 ≈ 1.6 %. */
  def buildHllState(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("hll"))

  /** Union-merge state tables (same groupCols + `hll` binary column):
    * groups present in either side survive; overlap double-counts
    * nothing (HLL union is idempotent on shared values). */
  def mergeHllStates(groupCols: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  def estimateHll(state: DataFrame): DataFrame =
    state.withColumn("n_distinct_est", hll_sketch_estimate(col("hll")))

  /** Contract query: lineitem split into two "ingest batches" by line
    * number parity — orderkeys STRADDLE the split, so the union must
    * dedupe across batches, not just add counts. Estimate from the
    * merged state must land within 5·rse of the exact per-flag distinct
    * count (computed in-plan; the hashed booleans fail on regression). */
  private val skHllState = Q(
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
      val batchA = li.filter(col("l_linenumber") % 2 === 0)
      val batchB = li.filter(col("l_linenumber") % 2 === 1)
      val merged = mergeHllStates(Seq("l_returnflag"),
        buildHllState(batchA, Seq("l_returnflag"), "l_orderkey"),
        buildHllState(batchB, Seq("l_returnflag"), "l_orderkey"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("n_exact"))
      estimateHll(merged)
        .join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_distinct_est") - col("n_exact")) <=
            lit(5 * 1.04 / math.sqrt(1 << 12)) * col("n_exact"))
            .as("within_bound"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
              CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
              TRUE AS within_bound
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  val queries: Map[String, Q] = Map(
    "q_sk_heavy_hitters" -> skTopWords,
    "q_sk_hll_distinct" -> skHll,
    "q_sk_hll_state" -> skHllState,
    "q_sk_approx_quantiles" -> skQuantiles)
}
