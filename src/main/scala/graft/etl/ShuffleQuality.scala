package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-quality certification — does the corpus layout actually
  * de-cluster sources? Training order matters (gradient correlation
  * from runs of same-source documents; the reason every loader
  * shuffles), and "we shuffled" deserves a measurement, not trust.
  * The report prices ADJACENCY: of consecutive document pairs in a
  * layout, how many share a source, against the with-replacement
  * expectation Σ p_s² a random permutation would give. Two layouts
  * on the same corpus:
  *
  *   - `hash_shuffled`: the corpus PRNG order (hash32(id), id) — the
  *     q_p18 deterministic shuffle this report certifies;
  *   - `source_sorted`: (source, id) order — the worst case, whose
  *     same-source pair count is exactly N − |sources|.
  *
  * One row per layout: (policy, n_docs, n_pairs, same_pairs,
  * obs_same_micro, exp_same_micro) — the observed share in
  * floor-micro of N−1 pairs, the expectation Σ_s (p_s_micro² div
  * 10⁶) from per-source floor-micro shares (with-replacement form,
  * PINNED; the (n_s−1)/(N−1) correction is O(1/N) and would force
  * N² longs).
  *
  * Envelope: same_pairs·10⁶ and n_s·10⁶ are longs — exact to
  * 9.2·10¹² docs (graft.tools.NumericEnvelopes pins the bound);
  * p_micro² ≤ 10¹² never overflows.
  *
  * Scale shape: each layout's rank is the GlobalIndex two-pass
  * prefix sum; adjacency is ONE self-equi-join on (policy, rn+1) —
  * co-partitioned on the rank key, never a window over the corpus;
  * the expectation is a sources-sized agg with a 1-row broadcast
  * total. */
object ShuffleQuality {

  def shuffleQualityReport(docs: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol).as("__src"))
      .withColumn("__h", DataMix.hash32(col(idCol)))
    def ranked(policy: String, order: Seq[Column]): (DataFrame, () => Unit) = {
      val (idx, release) =
        GlobalIndex.withGlobalIndexReleasable(base, order, "__rn")
      (idx.select(lit(policy).as("policy"), col("__rn"), col("__src")),
        release)
    }
    val (sh, relS) = ranked("hash_shuffled", Seq(col("__h"), col(idCol)))
    val (so, relO) = ranked("source_sorted", Seq(col("__src"), col(idCol)))
    val laid = sh.unionByName(so)
    val pairs = laid.join(
      laid.select(col("policy"), (col("__rn") + 1).as("__rn"),
        col("__src").as("__prev")),
      Seq("policy", "__rn"))
    val agg = pairs.groupBy("policy")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__src") === col("__prev"), 1L).otherwise(0L))
          .as("same_pairs"))
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("ns"))
    val tot = counts.agg(sum("ns").as("__N"))
    val expected = counts.crossJoin(broadcast(tot))
      .select(expr("ns * 1000000L div __N").as("pm"), col("__N"))
      .agg(min("__N").as("n_docs"),
        sum(expr("pm * pm div 1000000L")).as("exp_same_micro"))
    val out = agg.crossJoin(broadcast(expected))
      .select(col("policy"), col("n_docs"), col("n_pairs"),
        col("same_pairs"),
        expr("same_pairs * 1000000L div n_pairs").as("obs_same_micro"),
        col("exp_same_micro"))
      .localCheckpoint(eager = true)
    relS(); relO()
    out
  }

  /** q_p37_shuffle_quality: the certification over documents —
    * hash-shuffled adjacency near Σp², source-sorted at the ceiling. */
  private val pShuffle = Q(
    (s, d) => shuffleQualityReport(Tables.documents(s, d), "doc_id",
      "source").orderBy("policy"),
    Some(s"""WITH d AS (SELECT doc_id, source FROM documents),
            u AS (SELECT doc_id, source,
                ${DataMix.hash32SqlExpr("doc_id")} AS h
              FROM d),
            r AS (SELECT 'hash_shuffled' AS policy, source,
                row_number() OVER (ORDER BY h, doc_id) AS rn
              FROM u
              UNION ALL
              SELECT 'source_sorted' AS policy, source,
                row_number() OVER (ORDER BY source, doc_id) AS rn
              FROM u),
            pr AS (SELECT policy,
                CASE WHEN lag(source) OVER (PARTITION BY policy
                  ORDER BY rn) = source THEN 1 ELSE 0 END AS same,
                CASE WHEN lag(source) OVER (PARTITION BY policy
                  ORDER BY rn) IS NULL THEN 0 ELSE 1 END AS ispair
              FROM r),
            agg AS (SELECT policy, CAST(SUM(ispair) AS BIGINT) AS n_pairs,
                CAST(SUM(same) AS BIGINT) AS same_pairs
              FROM pr GROUP BY 1),
            gl AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM d),
            ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
              FROM d GROUP BY 1),
            ex AS (SELECT CAST(SUM((ns * 1000000 // N)
                  * (ns * 1000000 // N) // 1000000) AS BIGINT)
                AS exp_same_micro
              FROM ps CROSS JOIN gl)
            SELECT policy, gl.N AS n_docs, n_pairs, same_pairs,
              CAST(same_pairs * 1000000 // n_pairs AS BIGINT)
                AS obs_same_micro,
              ex.exp_same_micro AS exp_same_micro
            FROM agg CROSS JOIN gl CROSS JOIN ex
            ORDER BY policy"""))

  val queries: Map[String, Q] = Map("q_p37_shuffle_quality" -> pShuffle)
}
