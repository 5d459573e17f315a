package graft.sim

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between two
  * ranked runs — the ranking-agreement metric that closes the ANN QA
  * loop: [[RetrievalEval]] scores a run against graded qrels;
  * RBO compares two RANKERS head-to-head (approximate IVF vs exact
  * brute force, yesterday's index vs today's), top-weighted so rank-1
  * disagreements cost more than rank-k ones — exactly how an engineer
  * judges "did the index change where it matters?". Depth-truncated
  * RBO@k: `Σ_{d=1..k} (1-p)·p^{d-1} · |A∩B @d| / d` with persistence
  * p = pNum/pDen.
  *
  * Pure integers (rule 1): the geometric coefficients
  * `(pDen-pNum)·pNum^{d-1}·1e6 / (pDen^d · d)` are PRECOMPUTED EXACT
  * LITERALS (a k-row broadcast frame on both engines — no POWER()
  * float), each depth's term is one non-negative integral division,
  * and the per-query RBO is their order-free integer sum — the
  * [[graft.stats.KruskalWallis]] floored-decomposition convention,
  * within k micro of the real-valued RBO@k.
  *
  * Scale shape: runs arrive queries·k-bounded from any ranker; the
  * agreement join is ONE (qid, neighbor) equi-join, the depth grid is
  * queries·k CELLS, and the per-(qid, d) overlap count plus the final
  * per-qid sum are keyed aggregations — the corpus is never touched. */
object RankBiasedOverlap {

  /** Truncated RBO@k per query between runs (qid, rank, neighbor).
    * Output: (qid, rbo_micro, overlap_k — |A∩B| at full depth). A query
    * present in either run scores against the other's (possibly empty)
    * list. */
  def rbo(runA: DataFrame, runB: DataFrame, k: Int,
      pNum: Int = 9, pDen: Int = 10): DataFrame = {
    require(k >= 1 && 0 < pNum && pNum < pDen, "need k >= 1, 0 < p < 1")
    val spark = runA.sparkSession
    import spark.implicits._
    val coef = rboCoef(k, pNum, pDen).toDF("d", "wnum", "wden")
    val a = runA.filter(col("rank") <= k)
      .select(col("qid"), col("neighbor"), col("rank").as("ra"))
    val b = runB.filter(col("rank") <= k)
      .select(col("qid"), col("neighbor"), col("rank").as("rb"))
    val pairs = a.join(b, Seq("qid", "neighbor"))
      .select(col("qid"), greatest(col("ra"), col("rb")).as("m"))
    val qids = runA.select("qid").unionAll(runB.select("qid")).distinct()
    val grid = qids.crossJoin(broadcast(coef))
    grid.join(pairs, Seq("qid"), "left")
      .withColumn("hit",
        when(col("m").isNotNull && col("m") <= col("d"), 1L).otherwise(0L))
      .groupBy("qid", "d", "wnum", "wden").agg(sum("hit").as("ov"))
      .select(col("qid"), col("d"), col("ov"),
        expr("(ov * wnum) div wden").as("t"))
      .groupBy("qid")
      .agg(sum("t").as("rbo_micro"),
        max(when(col("d") === k, col("ov"))).as("overlap_k"))
  }

  /** Exact integer coefficients (d, (pDen-pNum)·pNum^(d-1)·1e6,
    * pDen^d·d) for d = 1..k. */
  private def rboCoef(k: Int, pNum: Int, pDen: Int)
      : Seq[(Long, Long, Long)] =
    (1 to k).map { d =>
      (d.toLong,
        (BigInt(pDen - pNum) * BigInt(pNum).pow(d - 1) * 1000000)
          .bigInteger.longValueExact(),
        (BigInt(pDen).pow(d) * d).bigInteger.longValueExact())
    }

  /** The coefficient table as a SQL VALUES literal — the oracle twin. */
  private def coefValues(k: Int, pNum: Int, pDen: Int): String =
    rboCoef(k, pNum, pDen)
      .map { case (d, wn, wd) => s"($d,$wn,$wd)" }.mkString(",")

  /** q_s_rbo: the (16, 4)-seeded IVF probe vs the EXACT brute-force
    * top-10, p = 0.9 — the certified number is how top-weighted-similar
    * the engine's ANN ranking is to ground truth, per query. The oracle
    * rebuilds both runs and every depth term. */
  private val sRbo = Q(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val runA = SimilarityOps.ivfSeededTopK(emb, "vec_id", "embedding",
        nList = 16, nProbe = 4, k = 10, col("id") < 5)
      val runB = SimilarityOps.bruteForceTopK(emb,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
      rbo(runA.select("qid", "rank", "neighbor"),
        runB.select("qid", "rank", "neighbor"), k = 10)
        .orderBy("qid")
    },
    Some(s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings),
            cent AS (SELECT vec_id AS cid, e AS cv FROM v WHERE vec_id < 16),
            dist AS (SELECT v.vec_id AS id, cent.cid,
                COALESCE(list_sum(list_transform(range(0, 64),
                  i -> (e[CAST(i AS INT) + 1] - cv[CAST(i AS INT) + 1])
                     * (e[CAST(i AS INT) + 1] - cv[CAST(i AS INT) + 1]))), 0)
                  AS d2
              FROM v CROSS JOIN cent),
            ar AS (SELECT id, cid, row_number() OVER
                     (PARTITION BY id ORDER BY d2, cid) AS r FROM dist),
            assigned AS (SELECT id, cid AS list FROM ar WHERE r = 1),
            probes AS (SELECT id AS qid, cid AS list FROM ar
                       WHERE r <= 4 AND id < 5),
            cand AS (SELECT DISTINCT qid, a.id
              FROM assigned a JOIN probes p ON a.list = p.list
              WHERE a.id <> p.qid),
            scored AS (SELECT cand.qid, cand.id,
                list_dot_product(a.e, b.e)
                  / (SQRT(list_dot_product(a.e, a.e))
                     * SQRT(list_dot_product(b.e, b.e))) AS cosine
              FROM cand JOIN v a ON a.vec_id = cand.id
                        JOIN v b ON b.vec_id = cand.qid),
            runa AS (SELECT qid, id AS neighbor, row_number() OVER
                      (PARTITION BY qid ORDER BY cosine DESC, id) AS ra
                    FROM scored QUALIFY ra <= 10),
            bf AS (SELECT q.vec_id AS qid, v.vec_id AS id,
                list_dot_product(v.e, q.e)
                  / (SQRT(list_dot_product(v.e, v.e))
                     * SQRT(list_dot_product(q.e, q.e))) AS cosine
              FROM v CROSS JOIN (SELECT * FROM v WHERE vec_id < 5) q
              WHERE v.vec_id <> q.vec_id),
            runb AS (SELECT qid, id AS neighbor, row_number() OVER
                      (PARTITION BY qid ORDER BY cosine DESC, id) AS rb
                    FROM bf QUALIFY rb <= 10),
            coef(d, wnum, wden) AS (VALUES ${coefValues(10, 9, 10)}),
            pairs AS (SELECT runa.qid, GREATEST(ra, rb) AS m
              FROM runa JOIN runb ON runa.qid = runb.qid
                AND runa.neighbor = runb.neighbor),
            qids AS (SELECT DISTINCT qid FROM runa
                     UNION SELECT DISTINCT qid FROM runb),
            ov AS (SELECT qids.qid, coef.d, coef.wnum, coef.wden,
                CAST(SUM(CASE WHEN pairs.m IS NOT NULL
                  AND pairs.m <= coef.d THEN 1 ELSE 0 END) AS BIGINT) AS ov
              FROM qids CROSS JOIN coef
              LEFT JOIN pairs ON pairs.qid = qids.qid
              GROUP BY 1, 2, 3, 4)
            SELECT qid,
              CAST(SUM((ov * wnum) // wden) AS BIGINT) AS rbo_micro,
              MAX(CASE WHEN d = 10 THEN ov END) AS overlap_k
            FROM ov GROUP BY qid ORDER BY qid"""))

  val queries: Map[String, Q] = Map("q_s_rbo" -> sRbo)
}
